"""Dump scalar curves from a training run's TensorBoard event files.

Usage: python tools/tb_dump.py trainings/<ts>/tb [--tags kps/f1_total ...]
       python tools/tb_dump.py trainings/<ts>/tb --list
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_REPO_ROOT = str(_Path(__file__).resolve().parents[1])
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)  # run as `python tools/x.py` without install


import argparse
from pathlib import Path


def load_scalars(logdir: Path):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(logdir), size_guidance={"scalars": 0})
    acc.Reload()
    out = {}
    for tag in acc.Tags().get("scalars", []):
        out[tag] = [(e.step, e.value) for e in acc.Scalars(tag)]
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("logdir", type=Path)
    p.add_argument("--tags", nargs="*", default=None)
    p.add_argument("--list", action="store_true")
    p.add_argument("--last", action="store_true", help="Only the latest value per tag.")
    args = p.parse_args()

    # MetricsWriter writes one subdir per tag family; aggregate them all
    dirs = [d for d in args.logdir.rglob("*") if d.is_dir()] + [args.logdir]
    scalars = {}
    for d in dirs:
        if any(f.name.startswith("events") for f in d.iterdir() if f.is_file()):
            for tag, vals in load_scalars(d).items():
                name = (
                    f"{d.relative_to(args.logdir)}/{tag}"
                    if d != args.logdir else tag
                )
                scalars.setdefault(name, []).extend(vals)

    if args.list:
        for tag in sorted(scalars):
            print(tag)
        return
    for tag in sorted(scalars):
        if args.tags and not any(t in tag for t in args.tags):
            continue
        vals = sorted(scalars[tag])
        if args.last:
            s, v = vals[-1]
            print(f"{tag:48s} step {s:6d}  {v:.6g}")
        else:
            print(tag)
            for s, v in vals:
                print(f"  {s:6d}  {v:.6g}")


if __name__ == "__main__":
    main()
