"""Silhouette mask auxiliary loss (use_mask_loss path).

Behavioral contract (MonoDETR monodetr.py:577-804): posed car templates are
rendered to soft silhouettes (PyTorch3D SoftSilhouetteShader) and compared
to the pseudo-label instance masks with BCE or DICE.

TPU design: instead of a triangle rasterizer, the silhouette renders by
differentiable gaussian point splatting of the posed template clouds onto a
downsampled mask grid — same gradient pathway (mask -> projected point
positions -> 3D pose), no mesh rasterization.  Off by default like the
reference (use_mask_loss False).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("out_h", "out_w", "sigma_px"))
def splat_silhouette(points: jnp.ndarray, calib: jnp.ndarray,
                     grid_affine: jnp.ndarray, out_h: int, out_w: int,
                     sigma_px: float = 1.5) -> jnp.ndarray:
    """(Q, T, 3) camera points -> (Q, out_h, out_w) soft silhouettes.

    Projects through the full P2 (baseline terms included), maps into the
    mask grid with ``grid_affine`` (2, 3) — the augmentation affine composed
    with the 1/stride downsample — and accumulates isotropic gaussians; the
    silhouette is a soft OR over points, matching the soft-silhouette
    compositing semantics.
    """
    q, t, _ = points.shape
    z = jnp.maximum(points[..., 2], 1e-3)
    u_img = (calib[0, 0] * points[..., 0] + calib[0, 1] * points[..., 1]
             + calib[0, 2] * points[..., 2] + calib[0, 3]) / z
    v_img = (calib[1, 0] * points[..., 0] + calib[1, 1] * points[..., 1]
             + calib[1, 2] * points[..., 2] + calib[1, 3]) / z
    u = grid_affine[0, 0] * u_img + grid_affine[0, 1] * v_img \
        + grid_affine[0, 2]
    v = grid_affine[1, 0] * u_img + grid_affine[1, 1] * v_img \
        + grid_affine[1, 2]

    gy = jnp.arange(out_h, dtype=jnp.float32)
    gx = jnp.arange(out_w, dtype=jnp.float32)
    # (Q, T, H) and (Q, T, W) separable gaussians
    wy = jnp.exp(-((gy[None, None, :] - v[..., None]) ** 2)
                 / (2 * sigma_px ** 2))
    wx = jnp.exp(-((gx[None, None, :] - u[..., None]) ** 2)
                 / (2 * sigma_px ** 2))
    # soft OR over points: 1 - exp(sum log(1 - g)) ~ use sum with clamp
    acc = jnp.einsum("qth,qtw->qhw", wy, wx)
    return 1.0 - jnp.exp(-acc)


def mask_loss(pred_sil: jnp.ndarray, target_mask: jnp.ndarray,
              valid: jnp.ndarray, kind: str = "BCE") -> jnp.ndarray:
    """(Q, H, W) silhouettes vs (Q, H, W) target masks, per-query valid.

    kind: 'BCE' (configs default) or 'DICE' (monodetr.py mask_loss)."""
    eps = 1e-6
    if kind == "BCE":
        per_px = -(target_mask * jnp.log(pred_sil + eps)
                   + (1 - target_mask) * jnp.log(1 - pred_sil + eps))
        per_q = jnp.mean(per_px, axis=(1, 2))
    elif kind == "DICE":
        inter = jnp.sum(pred_sil * target_mask, axis=(1, 2))
        denom = jnp.sum(pred_sil, axis=(1, 2)) + jnp.sum(target_mask,
                                                         axis=(1, 2))
        per_q = 1.0 - (2 * inter + eps) / (denom + eps)
    else:
        raise ValueError(f"unknown mask loss {kind!r}")
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, per_q, 0.0)) / n
