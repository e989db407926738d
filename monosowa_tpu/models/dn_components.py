"""Contrastive denoising (DN-DETR) query machinery.

Behavioral contract (MonoDETR/lib/models/monodetr/dn_components.py:44-391,
shipped with ``use_dn: False``): during training, ``scalar`` (5) groups of
noised ground-truth copies are prepended as extra decoder queries — labels
flipped with probability label_noise_scale (0.2), 6-dof boxes jittered by
box_noise_scale (0.4) x their extents and clamped to [0, 1]; a block
attention mask stops denoising groups from seeing each other or the
matchable queries (and vice versa); DN queries are supervised directly
against their own targets (no Hungarian matching).

JAX design: fixed shapes — each DN group holds ``max_objs`` slots per image
with a validity mask (the reference pads to the batch max dynamically).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from monosowa_tpu.models.layers import inverse_sigmoid


@dataclasses.dataclass(frozen=True)
class DNConfig:
    scalar: int = 5                 # number of denoising groups
    label_noise_scale: float = 0.2
    box_noise_scale: float = 0.4
    num_classes: int = 3


class DNQueries(NamedTuple):
    label_ids: jnp.ndarray     # (B, G*M) noised class ids for label_enc
    refpoints: jnp.ndarray     # (B, G*M, 6) noised boxes (sigmoid space)
    valid: jnp.ndarray         # (B, G*M) slot validity
    attn_mask: jnp.ndarray     # (G*M + Q, G*M + Q) True = blocked
    num_dn: int
    num_groups: int


def build_dn_attn_mask(num_dn_groups: int, group_size: int,
                       num_queries: int) -> jnp.ndarray:
    """True entries are masked out (dn_components.py:150-170): matchable
    queries cannot attend to any DN slot; DN group i attends only within
    itself."""
    pad = num_dn_groups * group_size
    total = pad + num_queries
    mask = jnp.zeros((total, total), bool)
    # matchable -> dn blocked
    mask = mask.at[pad:, :pad].set(True)
    for i in range(num_dn_groups):
        s, e = i * group_size, (i + 1) * group_size
        mask = mask.at[s:e, :s].set(True)
        mask = mask.at[s:e, e:pad].set(True)
    return mask


def build_joint_attn_mask(num_dn_groups: int, dn_group_size: int,
                          num_match_groups: int, queries_per_group: int
                          ) -> jnp.ndarray:
    """Full mask for [dn groups | matchable groups] self-attention: DN block
    rules (build_dn_attn_mask) + Group-DETR block-diagonal matchable groups
    (depthaware_transformer.py:480-498 expressed as a mask)."""
    pad = num_dn_groups * dn_group_size
    nq = num_match_groups * queries_per_group
    total = pad + nq
    mask = jnp.zeros((total, total), bool)
    # matchable cannot see dn
    mask = mask.at[pad:, :pad].set(True)
    # dn group isolation
    for i in range(num_dn_groups):
        s_, e_ = i * dn_group_size, (i + 1) * dn_group_size
        mask = mask.at[s_:e_, :s_].set(True)
        mask = mask.at[s_:e_, e_:pad].set(True)
    # matchable group isolation (block diagonal)
    for g in range(num_match_groups):
        s_ = pad + g * queries_per_group
        e_ = s_ + queries_per_group
        mask = mask.at[s_:e_, pad:s_].set(True)
        mask = mask.at[s_:e_, e_:].set(True)
    return mask


def prepare_dn(key: jax.Array, labels: jnp.ndarray, boxes_3d: jnp.ndarray,
               valid: jnp.ndarray, num_queries: int,
               cfg: DNConfig = DNConfig()) -> DNQueries:
    """Padded targets (B, M[, .]) -> DN queries.

    boxes_3d: (B, M, 6) normalized (cx, cy, l, r, t, b).
    """
    b, m = labels.shape
    g = cfg.scalar
    k1, k2, k3 = jax.random.split(key, 3)

    rep = lambda x: jnp.tile(x, (1, g) + (1,) * (x.ndim - 2)) \
        if x.ndim > 2 else jnp.tile(x, (1, g))
    known_labels = rep(labels)                       # (B, G*M)
    known_boxes = jnp.tile(boxes_3d, (1, g, 1))      # (B, G*M, 6)
    known_valid = rep(valid)

    # label flipping
    p = jax.random.uniform(k1, known_labels.shape)
    rand_label = jax.random.randint(k2, known_labels.shape, 0,
                                    cfg.num_classes)
    noised_labels = jnp.where(p < cfg.label_noise_scale, rand_label,
                              known_labels)

    # box jitter scaled by the box extent (dn_components.py:125-135):
    # centers jitter by (l+r)/2, (t+b)/2; edge offsets by themselves
    diff = jnp.concatenate(
        [((known_boxes[..., 2] + known_boxes[..., 3]) / 2)[..., None],
         ((known_boxes[..., 4] + known_boxes[..., 5]) / 2)[..., None],
         known_boxes[..., 2:]], -1)
    noise = (jax.random.uniform(k3, known_boxes.shape) * 2 - 1) * diff \
        * cfg.box_noise_scale
    noised_boxes = jnp.clip(known_boxes + noise, 0.0, 1.0)

    attn = build_dn_attn_mask(g, m, num_queries)
    return DNQueries(label_ids=noised_labels, refpoints=noised_boxes,
                     valid=known_valid, attn_mask=attn, num_dn=g * m,
                     num_groups=g)


def dn_loss(outputs_dn: Dict[str, jnp.ndarray], labels: jnp.ndarray,
            boxes_3d: jnp.ndarray, valid: jnp.ndarray,
            cfg: DNConfig = DNConfig(),
            focal_alpha: float = 0.25,
            focal_gamma: float = 2.0) -> Dict[str, jnp.ndarray]:
    """Direct (match-free) supervision of the DN slots: slot (g, j) of
    image b answers for target (b, j) (dn_components.py tgt_* losses).

    outputs_dn: dict with pred_logits (B, G*M, C), pred_boxes (B, G*M, 6).
    """
    b, m = labels.shape
    g = cfg.scalar
    tgt_labels = jnp.tile(labels, (1, g))
    tgt_boxes = jnp.tile(boxes_3d, (1, g, 1))
    tgt_valid = jnp.tile(valid, (1, g))
    num = jnp.maximum(jnp.sum(tgt_valid), 1).astype(jnp.float32)

    logits = outputs_dn["pred_logits"]
    onehot = jax.nn.one_hot(
        jnp.where(tgt_valid, tgt_labels, cfg.num_classes),
        cfg.num_classes + 1)[..., :-1]
    p = jax.nn.sigmoid(logits)
    ce = -(onehot * jnp.log(p + 1e-8) + (1 - onehot) * jnp.log(1 - p + 1e-8))
    p_t = p * onehot + (1 - p) * (1 - onehot)
    a_t = focal_alpha * onehot + (1 - focal_alpha) * (1 - onehot)
    loss_ce = jnp.sum(a_t * (1 - p_t) ** focal_gamma * ce) / num

    l1 = jnp.sum(jnp.abs(outputs_dn["pred_boxes"] - tgt_boxes), -1)
    loss_bbox = jnp.sum(l1 * tgt_valid) / num
    return {"tgt_loss_ce": loss_ce, "tgt_loss_bbox": loss_bbox}
