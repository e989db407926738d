"""Hungarian set matcher (reference: MonoDETR matcher.py:14-112).

Cost = 2 * focal-style class cost + 10 * L1(3D center) + 5 * L1(2D lrtb)
+ 2 * (-GIoU), solved per Group-DETR group: queries are split into
``group_num`` blocks of ``num_queries`` and each block is matched
independently against all targets of its image (matcher.py:95-108).

Targets arrive as padded arrays (B, M, ...) with a validity mask — the JAX
arrays-not-objects convention.  Output is a per-query target index (B, Q)
with -1 for unmatched queries, which the criterion consumes with gathers.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from monosowa_tpu.ops.lap import (solve_lap_auction, solve_lap_host,
                                  solve_lap_jv)

BIG = 1e6


def box_cxcylrtb_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, l, r, t, b) -> (x1, y1, x2, y2)  (box_ops.py:20-26)."""
    return jnp.stack([b[..., 0] - b[..., 2], b[..., 1] - b[..., 4],
                      b[..., 0] + b[..., 3], b[..., 1] + b[..., 5]], -1)


def generalized_box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU of xyxy boxes: (..., N, 4) x (..., M, 4) -> (..., N, M)
    (box_ops.py:51-74)."""
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    iou = inter / jnp.maximum(union, 1e-9)
    lt_hull = jnp.minimum(a[..., :, None, :2], b[..., None, :, :2])
    rb_hull = jnp.maximum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh_hull = jnp.clip(rb_hull - lt_hull, 0.0, None)
    hull = wh_hull[..., 0] * wh_hull[..., 1]
    return iou - (hull - union) / jnp.maximum(hull, 1e-9)


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    cost_class: float = 2.0
    cost_3dcenter: float = 10.0
    cost_bbox: float = 5.0
    cost_giou: float = 2.0
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    backend: str = "host"  # "host" (scipy callback), "jv" (exact on-device
    #                        shortest-augmenting-path), "auction" (on-device
    #                        eps-scaled, near-optimal)


def _cost_matrix(logits, boxes, tgt_labels, tgt_boxes, tgt_valid,
                 cfg: MatcherConfig):
    """(Q, C), (Q, 6) vs (M,), (M, 6), (M,) -> (Q, M) cost."""
    prob = jax.nn.sigmoid(logits)
    a, g = cfg.focal_alpha, cfg.focal_gamma
    neg = (1 - a) * prob ** g * (-jnp.log(1 - prob + 1e-8))
    pos = a * (1 - prob) ** g * (-jnp.log(prob + 1e-8))
    labels = jnp.clip(tgt_labels, 0, logits.shape[-1] - 1)
    cost_class = pos[:, labels] - neg[:, labels]          # (Q, M)

    c3d = jnp.sum(jnp.abs(boxes[:, None, :2] - tgt_boxes[None, :, :2]), -1)
    c2d = jnp.sum(jnp.abs(boxes[:, None, 2:6] - tgt_boxes[None, :, 2:6]), -1)
    giou = generalized_box_iou(box_cxcylrtb_to_xyxy(boxes),
                               box_cxcylrtb_to_xyxy(tgt_boxes))
    cost = (cfg.cost_class * cost_class + cfg.cost_3dcenter * c3d
            + cfg.cost_bbox * c2d + cfg.cost_giou * (-giou))
    return jnp.where(tgt_valid[None, :], cost, BIG)


@partial(jax.jit, static_argnames=("cfg", "group_num", "num_queries"))
def hungarian_match(pred_logits: jnp.ndarray, pred_boxes: jnp.ndarray,
                    tgt_labels: jnp.ndarray, tgt_boxes: jnp.ndarray,
                    tgt_valid: jnp.ndarray,
                    cfg: MatcherConfig = MatcherConfig(),
                    group_num: int = 11,
                    num_queries: int = 50) -> jnp.ndarray:
    """pred_logits (B, G*Q, C); pred_boxes (B, G*Q, 6); targets padded
    (B, M, ...).  Returns (B, G*Q) matched target index or -1."""
    b, gq, _ = pred_logits.shape
    g = gq // num_queries
    m = tgt_valid.shape[1]

    def per_image(logits, boxes, labels, tboxes, valid):
        cost = _cost_matrix(logits, boxes, labels, tboxes, valid, cfg)
        nvalid = jnp.sum(valid).astype(jnp.int32)
        groups = cost.reshape(g, num_queries, m)

        if cfg.backend == "auction":
            solve = lambda c: solve_lap_auction(c, nvalid)
        elif cfg.backend == "jv":
            solve = lambda c: solve_lap_jv(c, nvalid)
        else:
            solve = lambda c: solve_lap_host(c, nvalid)
        return jax.vmap(solve)(groups).reshape(gq)

    return jax.vmap(per_image)(pred_logits, pred_boxes, tgt_labels,
                               tgt_boxes, tgt_valid)
