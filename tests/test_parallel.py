"""Mesh + shardings on the 8 fake CPU devices (SURVEY.md §4:
multi-chip without a cluster)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from structuredetector_tpu.config import Config
from structuredetector_tpu.models import init_model
from structuredetector_tpu.parallel import create_mesh, param_shardings
from structuredetector_tpu.train.state import create_train_state, make_optimizer
from structuredetector_tpu.train.steps import make_train_step



pytestmark = pytest.mark.slow  # compile-heavy: sharded step compilations on the fake mesh


def make_config():
    cfg = Config(width=32, height=32, max_objects=2, max_parts=4, fpn_depth=16,
                 batch_size=4, use_amp=False)
    cfg.set_labels(["bean"], ["leaf"])
    return cfg


def test_create_mesh_shapes():
    mesh = create_mesh(4, 2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = create_mesh(0, 2)  # all remaining on data
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = create_mesh(8, 1)
    assert dict(mesh.shape) == {"data": 8, "model": 1}
    with pytest.raises(ValueError):
        create_mesh(8, 2)


def test_param_shardings_dp_replicates_everything():
    cfg = make_config()
    _, variables = init_model(cfg)
    mesh = create_mesh(8, 1)
    sh = param_shardings(variables, mesh)
    specs = {s.spec for s in jax.tree.leaves(sh)}
    assert specs == {P()}


def test_param_shardings_model_axis_shards_cout():
    cfg = make_config()
    _, variables = init_model(cfg)
    mesh = create_mesh(4, 2)
    sh = param_shardings(variables, mesh)
    # a wide conv kernel shards its output channels
    k = sh["params"]["encoder"]["layer4_0"]["conv1"]["kernel"]
    assert k.spec == P(None, None, None, "model")
    # the head (M+N+4 = 6 channels... 6 % 2 == 0 -> sharded) or odd stays
    head = sh["params"]["head"]["kernel"]
    out_ch = variables["params"]["head"]["kernel"].shape[-1]
    if out_ch % 2 == 0:
        assert head.spec == P(None, None, None, "model")
    else:
        assert head.spec == P()


def _batch(cfg, b):
    rng = np.random.default_rng(0)
    o, p = cfg.max_objects, cfg.max_parts
    kp = {
        "anchors_xy": jnp.asarray(rng.uniform(1, 7, (b, o, 2)), jnp.float32),
        "anchor_cls": jnp.zeros((b, o), jnp.int32),
        "anchor_mask": jnp.ones((b, o), bool),
        "parts_xy": jnp.asarray(rng.uniform(1, 7, (b, p, 2)), jnp.float32),
        "part_kind": jnp.zeros((b, p), jnp.int32),
        "part_owner_xy": jnp.asarray(rng.uniform(1, 7, (b, p, 2)), jnp.float32),
        "part_mask": jnp.ones((b, p), bool),
    }
    images = jnp.asarray(rng.normal(0, 1, (b, cfg.height, cfg.width, 3)), jnp.float32)
    return images, kp


def test_sharded_step_matches_unsharded():
    """DP over 2 devices must produce the same loss and updates as the
    single-device step (GSPMD global semantics; 1-vs-N invariance,
    SURVEY.md §4)."""
    cfg = make_config()
    model, variables = init_model(cfg)
    opt = make_optimizer(cfg, 10)
    state = create_train_state(cfg, variables, opt)
    images, kp = _batch(cfg, 4)

    plain = make_train_step(model, cfg, opt, out_h=8, out_w=8, donate=False)
    s1, stats1 = plain(state, images, kp)

    mesh = create_mesh(2, 1, devices=jax.devices()[:2])
    sharded = make_train_step(model, cfg, opt, out_h=8, out_w=8, mesh=mesh,
                              state_example=state, donate=False)
    s2, stats2 = sharded(state, images, kp)

    assert float(stats1["total_loss"]) == pytest.approx(
        float(stats2["total_loss"]), rel=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s1.params["head"]["bias"]),
        np.asarray(s2.params["head"]["bias"]),
        atol=1e-6,
    )


def test_model_parallel_step_matches():
    """(1 data x 2 model) tensor-parallel step reproduces the
    single-device numerics."""
    cfg = make_config()
    model, variables = init_model(cfg)
    opt = make_optimizer(cfg, 10)
    state = create_train_state(cfg, variables, opt)
    images, kp = _batch(cfg, 2)

    plain = make_train_step(model, cfg, opt, out_h=8, out_w=8, donate=False)
    s1, stats1 = plain(state, images, kp)

    mesh = create_mesh(1, 2, devices=jax.devices()[:2])
    sharded = make_train_step(model, cfg, opt, out_h=8, out_w=8, mesh=mesh,
                              state_example=state, donate=False)
    s2, stats2 = sharded(state, images, kp)

    assert float(stats1["total_loss"]) == pytest.approx(
        float(stats2["total_loss"]), rel=1e-5
    )


def test_sharded_forward_matches_single_device():
    from structuredetector_tpu.train.steps import make_forward, make_sharded_forward

    cfg = make_config()
    model, variables = init_model(cfg)
    images = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (4, 32, 32, 3)), jnp.float32
    )
    plain = make_forward(model)(variables, images)
    mesh = create_mesh(4, 1, devices=jax.devices()[:4])
    sharded = make_sharded_forward(model, mesh)(variables, images)
    np.testing.assert_allclose(
        np.asarray(plain["anchor_hm"]), np.asarray(sharded["anchor_hm"]), atol=1e-5
    )


def test_spatial_sharded_forward_matches_single_device():
    """Spatial partitioning (image rows over "model"): GSPMD's halo
    exchanges must reproduce the single-device forward exactly."""
    from structuredetector_tpu.train.steps import make_forward, make_sharded_forward

    cfg = make_config()
    model, variables = init_model(cfg)
    images = jnp.asarray(
        np.random.default_rng(1).normal(0, 1, (4, 32, 32, 3)), jnp.float32
    )
    plain = make_forward(model)(variables, images)
    mesh = create_mesh(2, 4)  # rows split 4-ways: 8-row shards vs 7x7 stem
    sharded = make_sharded_forward(model, mesh, spatial=True)(variables, images)
    for k in ("anchor_hm", "part_hm", "offsets", "embeddings"):
        np.testing.assert_allclose(
            np.asarray(plain[k]), np.asarray(sharded[k]), atol=1e-5
        )


def test_spatial_single_image_over_all_devices():
    """The giant-image serving case: batch 1, rows sharded over the
    whole mesh (model axis = 8)."""
    from structuredetector_tpu.train.steps import make_forward, make_sharded_forward

    cfg = make_config()
    model, variables = init_model(cfg)
    images = jnp.asarray(
        np.random.default_rng(2).normal(0, 1, (1, 64, 64, 3)), jnp.float32
    )
    plain = make_forward(model)(variables, images)
    mesh = create_mesh(1, 8)
    sharded = make_sharded_forward(model, mesh, spatial=True)(variables, images)
    np.testing.assert_allclose(
        np.asarray(plain["anchor_hm"]), np.asarray(sharded["anchor_hm"]), atol=1e-5
    )


def test_spatial_train_step_matches():
    """(2 data x 4 spatial) train step — rows sharded over "model" —
    reproduces single-device numerics: GSPMD turns the BN statistics
    and gradient reductions into collectives with global semantics."""
    cfg = make_config()
    model, variables = init_model(cfg)
    opt = make_optimizer(cfg, 10)
    state = create_train_state(cfg, variables, opt)
    images, kp = _batch(cfg, 4)

    plain = make_train_step(model, cfg, opt, out_h=8, out_w=8, donate=False)
    s1, stats1 = plain(state, images, kp)

    mesh = create_mesh(2, 4)
    sharded = make_train_step(model, cfg, opt, out_h=8, out_w=8, mesh=mesh,
                              state_example=state, donate=False, spatial=True)
    s2, stats2 = sharded(state, images, kp)

    assert float(stats1["total_loss"]) == pytest.approx(
        float(stats2["total_loss"]), rel=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s1.params["head"]["bias"]),
        np.asarray(s2.params["head"]["bias"]),
        atol=1e-6,
    )
