"""Jitted train/eval steps: encode + forward + loss (+ grad/update).

One fused device program per resolution bucket replaces the reference's
hot loop (`/root/reference/src/sdnet/model/trainer.py:103-135`): target
encoding (the reference's CPU-worker `Encode`) happens *inside* the
jitted step, the state is donated (no HBM copies), and under a
("data", "model") mesh the same program runs SPMD with gradient
all-reduce over ICI (GSPMD inserts the psum).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.device_augment import device_augment
from ..ops.encode import encode_targets
from ..ops.losses import sdnet_loss
from ..parallel.mesh import (
    batch_sharding,
    param_shardings,
    replicated_sharding,
    spatial_sharding,
)
from .state import TrainState


def _encode_batch(kp, config, out_h: int, out_w: int):
    return encode_targets(
        kp["anchors_xy"], kp["anchor_cls"], kp["anchor_mask"],
        kp["parts_xy"], kp["part_kind"], kp["part_owner_xy"], kp["part_mask"],
        out_h=out_h, out_w=out_w,
        n_labels=config.n_labels, n_parts=config.n_parts,
        sigma_gauss=config.sigma_gauss,
    )


def make_train_step(
    model, config, optimizer, *, out_h: int, out_w: int,
    mesh=None, state_example: Optional[TrainState] = None, donate: bool = True,
    augment: bool = False, spatial: bool = False,
) -> Callable:
    """Build `step(state, images, kp_dict) -> (state, stats)` jitted for
    one static resolution bucket.

    With `mesh`, in/out shardings are attached (batch over "data",
    variables per `parallel.mesh.param_shardings`); `state_example` (a
    concrete or abstract TrainState) supplies the pytree structure.

    `spatial=True` additionally shards image *rows* over the "model"
    axis (spatial partitioning) — high-resolution training whose
    activations exceed one chip's HBM. GSPMD inserts the conv halo
    exchanges and turns the BatchNorm batch-statistics reductions into
    cross-device collectives, so numerics keep global-batch semantics."""

    multi_device = mesh is not None and mesh.size > 1

    def step(state: TrainState, images: jax.Array, kp: Dict[str, jax.Array]):
        if multi_device:
            # Shard the batch over "data" via an internal constraint
            # instead of in_shardings: constraining uncommitted host
            # inputs via in_shardings forces a host round-trip per call.
            bsh_in = batch_sharding(mesh)
            img_sh = spatial_sharding(mesh) if spatial else bsh_in
            images = jax.lax.with_sharding_constraint(images, img_sh)
            kp = {k: jax.lax.with_sharding_constraint(v, bsh_in) for k, v in kp.items()}
        if augment:
            # Augment in the compute dtype: inputs are uint8-derived, so
            # bf16 loses nothing, and the flip/jitter buffers (the whole
            # 512x512x3 batch, twice) halve their HBM traffic.
            if images.dtype == jnp.uint8:
                # uint8 feed (4x smaller H2D transfer): /255 in f32 then
                # cast. Bit-identical to the float32 feed in bf16
                # compute; in fp32, XLA's reciprocal-multiply rewrite
                # leaves <=1-ulp input rounding (tests/test_train.py).
                images = (images.astype(jnp.float32) / 255.0).astype(model.dtype)
            else:
                images = images.astype(model.dtype)
            key = jax.random.fold_in(jax.random.PRNGKey(config.seed), state.step)
            images, kp = device_augment(
                images, kp, key, out_w=out_w, out_h=out_h,
                flip_prob=getattr(config, "flip_prob", 0.5),
            )
        # named_scope markers flow into HLO op_name metadata, so the
        # per-HLO train ledger (tools/trace_train_ledger.py) can
        # attribute device time to encode/forward/loss/update without
        # guessing from opcode shapes (backward ops additionally carry
        # jvp/transpose markers from jax.grad)
        with jax.named_scope("encode_targets"):
            targets = _encode_batch(kp, config, out_h, out_w)

        def loss_fn(params):
            with jax.named_scope("forward"):
                outputs, mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    images, train=True, mutable=["batch_stats"],
                )
            with jax.named_scope("loss"):
                loss, stats = sdnet_loss(
                    outputs, targets,
                    hm_loss_fn=config.hm_loss_fn,
                    hm_weight=config.hm_weight,
                    offset_weight=config.offset_weight,
                    embedding_weight=config.embedding_weight,
                )
            return loss, (stats, mutated["batch_stats"])

        grads, (stats, new_batch_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        with jax.named_scope("adam_update"):
            updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(
            lambda p, u: (p + u).astype(p.dtype), state.params, updates
        )
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )
        return new_state, stats

    if not multi_device:
        # Single device: explicit sharding specs add no information and
        # (on some single-controller tunnel backends) force per-call
        # host round-trips of the whole state. Plain jit + donation.
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    assert state_example is not None, "state_example required with a mesh"
    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)

    tree = param_shardings(
        {"params": state_example.params, "batch_stats": state_example.batch_stats}, mesh
    )
    params_sh = tree["params"]
    params_struct = jax.tree_util.tree_structure(state_example.params)

    def map_opt(opt_state):
        """Adam moments (param-shaped subtrees) mirror the param
        shardings; everything else (step counts) replicates."""
        try:
            if jax.tree_util.tree_structure(opt_state) == params_struct:
                return params_sh
        except Exception:
            pass
        if isinstance(opt_state, tuple) and hasattr(opt_state, "_fields"):
            return type(opt_state)(*(map_opt(getattr(opt_state, f)) for f in opt_state._fields))
        if isinstance(opt_state, tuple):
            return type(opt_state)(map_opt(o) for o in opt_state)
        return jax.tree.map(lambda _: rep, opt_state)

    opt_sh = map_opt(state_example.opt_state)

    st_sh = TrainState(
        step=rep, params=params_sh, batch_stats=tree["batch_stats"], opt_state=opt_sh
    )
    return jax.jit(
        step,
        in_shardings=(st_sh, None, None),  # data sharded inside the step
        out_shardings=(st_sh, rep),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, config, *, out_h: int, out_w: int) -> Callable:
    """Jitted validation step: forward (running BN stats) + loss stats +
    raw output maps for decoding."""

    @jax.jit
    def step(variables, images: jax.Array, kp: Dict[str, jax.Array]):
        targets = _encode_batch(kp, config, out_h, out_w)
        outputs = model.apply(variables, images, train=False)
        _, stats = sdnet_loss(
            outputs, targets,
            hm_loss_fn=config.hm_loss_fn,
            hm_weight=config.hm_weight,
            offset_weight=config.offset_weight,
            embedding_weight=config.embedding_weight,
        )
        gt_maps = {"anchor_hm": targets.anchor_hm, "part_hm": targets.part_hm}
        return outputs, stats, gt_maps

    return step


def make_forward(model, from_uint8: bool = False) -> Callable:
    """Jitted inference forward.

    With `from_uint8`, the step consumes raw (B, H, W, 3) uint8 RGB and
    performs the /255 + ImageNet mean/std normalization on-device (it
    fuses into the stem convolution's input) — a 4x smaller host->device
    transfer than pre-normalized float32, which is what a serving
    deployment should feed.
    """

    @jax.jit
    def forward(variables, images: jax.Array):
        if from_uint8:
            from ..ops.device_augment import normalize_images

            images = normalize_images(images.astype(jnp.float32) / 255.0)
        return model.apply(variables, images, train=False)

    return forward


def kp_to_device_dict(kp) -> Dict[str, jnp.ndarray]:
    """FlatKeypoints batch -> dict of device arrays for the steps."""
    return {
        "anchors_xy": jnp.asarray(kp.anchors_xy),
        "anchor_cls": jnp.asarray(kp.anchor_cls),
        "anchor_mask": jnp.asarray(kp.anchor_mask),
        "parts_xy": jnp.asarray(kp.parts_xy),
        "part_kind": jnp.asarray(kp.part_kind),
        "part_owner_xy": jnp.asarray(kp.part_owner_xy),
        "part_mask": jnp.asarray(kp.part_mask),
    }


def make_sharded_forward(model, mesh, spatial: bool = False) -> Callable:
    """Data-parallel batched inference over a mesh: the batch shards
    over "data" (via an internal constraint, see make_train_step notes),
    variables replicate. Serving-side SPMD analog of the DP train step.

    With `spatial=True` the image-row dimension additionally shards over
    the "model" axis (spatial partitioning): GSPMD inserts the conv halo
    exchanges over ICI, so a single giant image can ride multiple chips
    — the scale-out for resolutions whose activations exceed one chip's
    HBM. Output heatmaps come back row-sharded the same way; the decode
    top-k runs globally, so results are identical to single-chip."""
    from ..parallel.mesh import batch_sharding, spatial_sharding

    if mesh is None or mesh.size <= 1:
        return make_forward(model)

    sharding_of = spatial_sharding if spatial else batch_sharding

    @jax.jit
    def forward(variables, images: jax.Array):
        images = jax.lax.with_sharding_constraint(images, sharding_of(mesh))
        return model.apply(variables, images, train=False)

    return forward
