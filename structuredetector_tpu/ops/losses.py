"""Training losses.

Exact numerics of the reference (`/root/reference/src/sdnet/model/loss.py`):

- heatmap loss: CenterNet penalty-reduced focal (`loss.py:91-117`) or
  plain MSE (torch `nn.MSELoss`, mean over all elements); applied to the
  *clamped-sigmoided* logits of both anchor and part heatmaps
  (`loss.py:18-24`), weighted by `hm_weight`,
- offset loss: masked L1 on the shared 2-channel offset map, gathered at
  both anchor and part indices (`loss.py:26-39`, `loss.py:53-64`),
- embedding loss: masked L1 at part indices (`loss.py:41-46`).

All reductions are computed in float32 regardless of the compute dtype.
Losses are pure functions returning (total, stats-dict) — the reference's
`LossStats` side-effect accumulator (`loss.py:120-165`) becomes a plain
dict that flows through jit.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .encode import EncodedTargets
from .tensor import clamped_sigmoid, gather_features


def focal_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Penalty-reduced pixelwise focal loss (reference loss.py:91-117).

    pred: probabilities in (0, 1) (already sigmoided+clamped), target:
    Gaussian-splatted ground truth in [0, 1]. Negative weight (1-t)^4,
    alpha=2 powers, normalized by #positive pixels; pure-negative sum
    when there are no positives (`loss.py:110-111`).
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)

    pos_inds = (target == 1.0).astype(jnp.float32)
    neg_inds = (target < 1.0).astype(jnp.float32)

    neg_weights = (1.0 - target) ** 4
    one_minus_pred = 1.0 - pred

    neg_loss = jnp.sum(jnp.log(one_minus_pred) * pred**2 * neg_weights * neg_inds)
    pos_loss = jnp.sum(jnp.log(pred) * one_minus_pred**2 * pos_inds)
    num_pos = jnp.sum(pos_inds)

    return jnp.where(
        num_pos == 0,
        -neg_loss,
        -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0),
    )


def mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """torch nn.MSELoss (mean) equivalent — the reference's default
    heatmap loss (`loss.py:13`, default 'mse' at args.py:100)."""
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(diff**2)


def masked_l1_loss(
    feat: jax.Array, target: jax.Array, inds: jax.Array, mask: jax.Array
) -> jax.Array:
    """Masked, gathered L1 (reference L1Loss, loss.py:53-64).

    feat: (B, H, W, 2) dense regression map, target: (B, K, 2),
    inds: (B, K) flat spatial indices, mask: (B, K) validity.
    sum(|gathered - target| * mask) / #valid; 0 when mask is empty.
    """
    numel = jnp.sum(mask.astype(jnp.float32))
    preds = gather_features(feat, inds).astype(jnp.float32)  # (B, K, 2)
    diff = jnp.abs((preds - target.astype(jnp.float32)) * mask[..., None].astype(jnp.float32))
    total = jnp.sum(diff)
    return jnp.where(numel == 0, 0.0, total / jnp.maximum(numel, 1.0))


def masked_smooth_l1_loss(
    feat: jax.Array, target: jax.Array, inds: jax.Array, mask: jax.Array
) -> jax.Array:
    """Masked gathered smooth-L1 (reference SmoothL1Loss, loss.py:67-76,
    an unused alternate): huber(beta=1) on masked preds/targets, summed,
    normalized by mask element count (mask broadcast over both coords)
    with the reference's +1e-7 stabilizer."""
    preds = gather_features(feat, inds).astype(jnp.float32)
    m = mask[..., None].astype(jnp.float32) * jnp.ones_like(preds)
    diff = jnp.abs(preds * m - target.astype(jnp.float32) * m)
    loss = jnp.sum(jnp.where(diff < 1.0, 0.5 * diff**2, diff - 0.5))
    return loss / (jnp.sum(m) + 1e-7)


def masked_l2_loss(
    feat: jax.Array, target: jax.Array, inds: jax.Array, mask: jax.Array
) -> jax.Array:
    """Masked gathered MSE (reference L2Loss, loss.py:79-88, an unused
    alternate): sum of squared masked residuals / mask element count."""
    preds = gather_features(feat, inds).astype(jnp.float32)
    m = mask[..., None].astype(jnp.float32) * jnp.ones_like(preds)
    loss = jnp.sum((preds * m - target.astype(jnp.float32) * m) ** 2)
    return loss / (jnp.sum(m) + 1e-7)


def sdnet_loss(
    outputs: Dict[str, jax.Array],
    targets: EncodedTargets,
    *,
    hm_loss_fn: str = "mse",
    hm_weight: float = 1.0,
    offset_weight: float = 1e-3,
    embedding_weight: float = 1e-3,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Composite SDNet loss (reference Loss.forward, loss.py:17-50).

    outputs: dict with raw logits 'anchor_hm' (B,H,W,M), 'part_hm'
    (B,H,W,N), 'offsets' (B,H,W,2), 'embeddings' (B,H,W,2).
    """
    hm = focal_loss if hm_loss_fn == "focal" else mse_loss

    anchor_hm = clamped_sigmoid(outputs["anchor_hm"].astype(jnp.float32))
    part_hm = clamped_sigmoid(outputs["part_hm"].astype(jnp.float32))

    hm_loss = hm_weight * (
        hm(anchor_hm, targets.anchor_hm) + hm(part_hm, targets.part_hm)
    )
    offset_loss = offset_weight * (
        masked_l1_loss(
            outputs["offsets"], targets.anchor_offsets, targets.anchor_inds, targets.anchor_mask
        )
        + masked_l1_loss(
            outputs["offsets"], targets.part_offsets, targets.part_inds, targets.part_mask
        )
    )
    embedding_loss = embedding_weight * masked_l1_loss(
        outputs["embeddings"], targets.embeddings, targets.part_inds, targets.part_mask
    )

    total = hm_loss + offset_loss + embedding_loss
    stats = {
        "hm_loss": hm_loss,
        "offset_loss": offset_loss,
        "embedding_loss": embedding_loss,
        "total_loss": total,
    }
    return total, stats
