"""`train` console script (reference cli/train.py:5-13)."""

from __future__ import annotations

from ..config import config_from_args
from ..train import Trainer


def main(argv=None):
    config = config_from_args(argv)
    assert config.train_dir, "train requires --train_dir (annotated training samples)"
    assert config.valid_dir, "train requires --valid_dir (annotated validation samples)"
    trainer = Trainer(config)
    trainer.train()


if __name__ == "__main__":
    main()
