"""Space-to-depth stem: exact equivalence and checkpoint adaptation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from structuredetector_tpu.models.network import init_model, resolve_variables, save_params
from structuredetector_tpu.models.resnet import space_to_depth, stem_kernel_to_s2d


def test_space_to_depth_layout():
    x = jnp.arange(2 * 4 * 4 * 3).reshape(2, 4, 4, 3).astype(jnp.float32)
    y = np.asarray(space_to_depth(x))
    assert y.shape == (2, 2, 2, 12)
    # cell (0, 0): phases (ry, rx) pull pixel (ry, rx), channel block
    # (ry*2 + rx)*3
    for ry in (0, 1):
        for rx in (0, 1):
            g = (ry * 2 + rx) * 3
            np.testing.assert_array_equal(
                y[:, 0, 0, g : g + 3], np.asarray(x[:, ry, rx, :])
            )


def test_s2d_conv_matches_7x7_stride2(rng):
    """4x4/1 conv on s2d input with the rewritten kernel == 7x7/2 conv,
    including the zero-padding border semantics."""
    k7 = rng.standard_normal((7, 7, 3, 8)).astype(np.float32)
    x = rng.standard_normal((2, 16, 20, 3)).astype(np.float32)

    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k7), window_strides=(2, 2),
        padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    k4 = stem_kernel_to_s2d(k7)
    got = jax.lax.conv_general_dilated(
        space_to_depth(jnp.asarray(x)), jnp.asarray(k4), window_strides=(1, 1),
        padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.slow
def test_s2d_model_loads_7x7_checkpoint(tiny_config, tmp_path):
    """A standard-stem checkpoint loads into an --s2d_stem model through
    resolve_variables and computes the same outputs."""
    model, variables = init_model(tiny_config)
    path = tmp_path / "std.msgpack"
    save_params(variables, path)

    s2d_cfg = dataclasses.replace(tiny_config, s2d_stem=True)
    s2d_model, s2d_init = init_model(s2d_cfg)
    s2d_vars = resolve_variables(path, s2d_init)
    assert s2d_vars["params"]["encoder"]["conv1"]["kernel"].shape[:2] == (4, 4)

    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    want = model.apply(variables, x, train=False)
    got = s2d_model.apply(s2d_vars, x, train=False)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), atol=1e-4, rtol=1e-4
        )


@pytest.mark.slow
def test_s2d_checkpoint_rejected_by_standard_model(tiny_config, tmp_path):
    s2d_cfg = dataclasses.replace(tiny_config, s2d_stem=True)
    _, s2d_vars = init_model(s2d_cfg)
    path = tmp_path / "s2d.msgpack"
    save_params(s2d_vars, path)

    _, std_init = init_model(tiny_config)
    with pytest.raises(ValueError, match="s2d_stem"):
        resolve_variables(path, std_init)
