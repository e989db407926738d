"""Set criterion: Hungarian-matched detection losses (JAX).

Behavioral contract (MonoDETR monodetr.py:302-575, 1188-1229 and
depth_predictor/ddn_loss/*):

* focal classification over all queries (loss_labels :396-421);
* L1 3D-center (:437-446), L1 + GIoU on the 6-dof boxes (:448-467);
* Laplacian aleatoric depth: 1.4142*exp(-s)*|d-gt| + s (:469-480);
* dimension-aware L1 with detached compensation weight (:482-496);
* 24-channel angle: 12-bin CE + per-bin residual L1 (:498-522);
* DDN foreground depth-map loss: GT map painted from 2D boxes sorted by
  depth (nearest box wins per pixel), LID binning, one-hot focal loss,
  13:1 fg/bg balancing (ddn_loss.py:43-110, balancer.py:7-51);
* all losses normalized by num_boxes = total valid targets x group_num
  (:1201-1206; psum across data-parallel devices when ``axis_name`` set);
* aux decoder layers re-matched and re-supervised, minus depth_map
  (:1216-1229).

Targets are padded SoA arrays with a validity mask.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from monosowa_tpu.models import mask_aux, tfl_aux
from monosowa_tpu.models.matcher import (
    MatcherConfig, box_cxcylrtb_to_xyxy, generalized_box_iou, hungarian_match)


class AddData(NamedTuple):
    """Pseudo-label car payload for the TFL / silhouette auxiliary losses —
    the reference's ``info`` side-channel (kitti_dataset.py:421-449 loads
    optimized_cars blobs; monodetr.py:967-1157 consumes them)."""

    car_points: jnp.ndarray        # (B, C, P, 3) aggregated car clouds
    car_pmask: jnp.ndarray         # (B, C, P) point validity
    car_valid: jnp.ndarray         # (B, C)
    car_moving: jnp.ndarray        # (B, C)
    car_masks: jnp.ndarray         # (B, C, Hm, Wm) instance masks (0/1)
    calib: jnp.ndarray             # (B, 3, 4) P2
    resolution: jnp.ndarray        # (2,) network input (w, h)
    canonical_scale: jnp.ndarray   # (B,)
    trans: jnp.ndarray             # (B, 2, 3) original -> resolution affine
    trans_inv: jnp.ndarray         # (B, 2, 3) inverse affine
    flip: jnp.ndarray              # (B,) bool random-flip flags
    img_w: jnp.ndarray             # (B,) original image width
    templates: jnp.ndarray         # (4, T, 3) canonical template clouds
    template_dims_hwl: jnp.ndarray  # (3,)


class Targets(NamedTuple):
    """Padded detection targets (B, M, ...)."""

    labels: jnp.ndarray        # (B, M) int
    boxes_3d: jnp.ndarray      # (B, M, 6) cx cy l r t b (normalized)
    boxes_2d: jnp.ndarray      # (B, M, 4) cx cy w h (normalized)
    depth: jnp.ndarray         # (B, M)
    size_3d: jnp.ndarray       # (B, M, 3) h w l (mean-shape residual space)
    heading_bin: jnp.ndarray   # (B, M) int in [0, 12)
    heading_res: jnp.ndarray   # (B, M)
    valid: jnp.ndarray         # (B, M) bool


@dataclasses.dataclass(frozen=True)
class CriterionConfig:
    num_classes: int = 3
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    group_num: int = 11
    num_queries: int = 50
    matcher: MatcherConfig = MatcherConfig()
    # loss weights (configs/monodetr.yaml:96-107)
    w_cls: float = 2.0
    w_bbox: float = 5.0
    w_giou: float = 2.0
    w_center: float = 10.0
    w_dim: float = 1.0
    w_angle: float = 1.0
    w_depth: float = 1.0
    w_depth_map: float = 1.0
    # ddn
    ddn_fg_weight: float = 13.0
    ddn_bg_weight: float = 1.0
    depth_min: float = 1e-3
    depth_max: float = 60.0
    num_depth_bins: int = 80
    # TFL / silhouette auxiliary losses against pseudo-label cars
    # (use_tfl / use_mask_loss, monodetr.py:538-575; off by default like
    # configs/monodetr.yaml:113-115)
    use_tfl: bool = False
    use_mask_loss: bool = False
    w_tfl: float = 1.0             # tfl_loss_coef
    w_mask: float = 1.0            # mask_loss_coef
    mask_kind: str = "BCE"         # mask_loss: BCE | DICE
    tfl_on_aux: bool = True        # reference runs tfl on aux layers too
    tfl_gather_k: int = 32         # fixed matched-query slots (TPU shapes)
    tfl_steepness: float = 10.0
    tfl_match_dist: float = 5.0
    mask_sigma_px: float = 1.5


def _gather_targets(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x (B, M, ...) gathered at idx (B, Q) -> (B, Q, ...); idx<0 -> entry 0
    (losses mask those out)."""
    safe = jnp.maximum(idx, 0)
    return jax.vmap(lambda xb, ib: xb[ib])(x, safe)


def _layer_losses(out: Dict[str, jnp.ndarray], targets: Targets,
                  match_idx: jnp.ndarray, num_boxes: jnp.ndarray,
                  cfg: CriterionConfig) -> Dict[str, jnp.ndarray]:
    logits = out["pred_logits"]                     # (B, Q, C)
    boxes = out["pred_boxes"]                       # (B, Q, 6)
    matched = match_idx >= 0                        # (B, Q)

    # ----- focal classification over all queries -----------------------
    tgt_cls = _gather_targets(targets.labels, match_idx)
    tgt_cls = jnp.where(matched, tgt_cls, cfg.num_classes)
    onehot = jax.nn.one_hot(tgt_cls, cfg.num_classes + 1)[..., :-1]
    p = jax.nn.sigmoid(logits)
    ce = -(onehot * jnp.log(p + 1e-8) + (1 - onehot) * jnp.log(1 - p + 1e-8))
    p_t = p * onehot + (1 - p) * (1 - onehot)
    alpha_t = cfg.focal_alpha * onehot + (1 - cfg.focal_alpha) * (1 - onehot)
    focal = alpha_t * (1 - p_t) ** cfg.focal_gamma * ce
    loss_ce = jnp.sum(focal) / num_boxes

    mask = matched.astype(jnp.float32)

    # ----- 3D center + 2D box L1 + GIoU ---------------------------------
    tgt_boxes = _gather_targets(targets.boxes_3d, match_idx)
    l1_center = jnp.sum(jnp.abs(boxes[..., :2] - tgt_boxes[..., :2]), -1)
    loss_center = jnp.sum(l1_center * mask) / num_boxes
    l1_box = jnp.sum(jnp.abs(boxes[..., 2:6] - tgt_boxes[..., 2:6]), -1)
    loss_bbox = jnp.sum(l1_box * mask) / num_boxes

    giou_pair = generalized_box_iou(
        box_cxcylrtb_to_xyxy(boxes).reshape(-1, 1, 4),
        box_cxcylrtb_to_xyxy(tgt_boxes).reshape(-1, 1, 4))[:, 0, 0]
    loss_giou = jnp.sum((1 - giou_pair.reshape(mask.shape)) * mask) / num_boxes

    # ----- Laplacian depth ---------------------------------------------
    depth_pred = out["pred_depth"]
    tgt_depth = _gather_targets(targets.depth, match_idx)
    d, s = depth_pred[..., 0], depth_pred[..., 1]
    lap = 1.4142 * jnp.exp(-s) * jnp.abs(d - tgt_depth) + s
    loss_depth = jnp.sum(lap * mask) / num_boxes

    # ----- dim-aware L1 -------------------------------------------------
    dims = out["pred_3d_dim"]
    tgt_dims = _gather_targets(targets.size_3d, match_idx)
    dim_l1 = jnp.abs(dims - tgt_dims) / jnp.maximum(jnp.abs(tgt_dims), 1e-6)
    dim_l1 = dim_l1 * mask[..., None]
    n_el = jnp.maximum(jnp.sum(mask) * 3, 1.0)
    mean_abs = jnp.sum(jnp.abs(dims - tgt_dims) * mask[..., None]) / n_el
    mean_dim_loss = jnp.sum(dim_l1) / n_el
    comp = jax.lax.stop_gradient(mean_abs / jnp.maximum(mean_dim_loss, 1e-9))
    loss_dim = jnp.sum(dim_l1) * comp / num_boxes

    # ----- angle: 12-bin CE + residual ---------------------------------
    angle = out["pred_angle"]
    tgt_bin = _gather_targets(targets.heading_bin, match_idx)
    tgt_res = _gather_targets(targets.heading_res, match_idx)
    cls_logits = angle[..., :12]
    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    ce_angle = -jnp.take_along_axis(logp, tgt_bin[..., None], axis=-1)[..., 0]
    res_pred = jnp.take_along_axis(angle[..., 12:24], tgt_bin[..., None],
                                   axis=-1)[..., 0]
    l1_res = jnp.abs(res_pred - tgt_res)
    loss_angle = jnp.sum((ce_angle + l1_res) * mask) / num_boxes

    return {"loss_ce": loss_ce, "loss_center": loss_center,
            "loss_bbox": loss_bbox, "loss_giou": loss_giou,
            "loss_depth": loss_depth, "loss_dim": loss_dim,
            "loss_angle": loss_angle}


def ddn_depth_map_loss(depth_logits: jnp.ndarray, targets: Targets,
                       cfg: CriterionConfig) -> jnp.ndarray:
    """depth_logits (B, H, W, D+1) NHWC; paints the GT depth map from 2D
    boxes (nearest box wins), LID-bins it, focal CE + 13:1 balancing."""
    b, h, w, nbins_p1 = depth_logits.shape
    nbins = nbins_p1 - 1
    scale = jnp.asarray([w, h, w, h], jnp.float32)
    boxes = targets.boxes_2d * scale                  # cx cy w h in grid px
    xyxy = jnp.stack([boxes[..., 0] - boxes[..., 2] / 2,
                      boxes[..., 1] - boxes[..., 3] / 2,
                      boxes[..., 0] + boxes[..., 2] / 2,
                      boxes[..., 1] + boxes[..., 3] / 2], -1)
    x1 = jnp.floor(xyxy[..., 0])
    y1 = jnp.floor(xyxy[..., 1])
    x2 = jnp.ceil(xyxy[..., 2])
    y2 = jnp.ceil(xyxy[..., 3])

    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    # (B, M, H, W) coverage.  The reference paints depth_maps[v1:v2, u1:u2]
    # with raw long() corners (ddn_loss.py:47-64, balancer.py:69-80): a box
    # whose floored u1/v1 is negative yields an EMPTY torch slice and is
    # silently not painted at all — replicated here (clip_2d defaults off,
    # so partially-out-of-frame boxes do reach this loss).
    inb = (x1 >= 0) & (y1 >= 0)
    cover = ((xs[None, None] >= x1[..., None, None])
             & (xs[None, None] < x2[..., None, None])
             & (ys[None, None] >= y1[..., None, None])
             & (ys[None, None] < y2[..., None, None])
             & (targets.valid & inb)[..., None, None])
    depth_or_inf = jnp.where(cover, targets.depth[..., None, None], jnp.inf)
    gt_depth = jnp.min(depth_or_inf, axis=1)          # (B, H, W)
    fg = jnp.isfinite(gt_depth)
    gt_depth = jnp.where(fg, gt_depth, 0.0)

    # LID bin target (background/out-of-range -> bin nbins)
    bin_size = 2 * (cfg.depth_max - cfg.depth_min) / (nbins * (1 + nbins))
    idxf = -0.5 + 0.5 * jnp.sqrt(
        jnp.maximum(1 + 8 * (gt_depth - cfg.depth_min) / bin_size, 0.0))
    oob = (idxf < 0) | (idxf > nbins) | ~jnp.isfinite(idxf)
    tgt_bin = jnp.where(oob, nbins, jnp.floor(idxf)).astype(jnp.int32)

    logp = jax.nn.log_softmax(depth_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, tgt_bin[..., None], axis=-1)[..., 0]
    pt = jnp.exp(-ce)
    focal = cfg.focal_alpha * (1 - pt) ** cfg.focal_gamma * ce

    weights = jnp.where(fg, cfg.ddn_fg_weight, cfg.ddn_bg_weight)
    num_pixels = jnp.float32(b * h * w)
    return jnp.sum(focal * weights) / num_pixels


def _add_data_losses(out: Dict[str, jnp.ndarray], match_idx: jnp.ndarray,
                     add: AddData, cfg: CriterionConfig
                     ) -> Dict[str, jnp.ndarray]:
    """TFL + silhouette mask losses of one decoder layer against the
    pseudo-label cars (loss_tfl, monodetr.py:538-575).

    Matched queries are gathered into ``tfl_gather_k`` fixed slots per image
    so the pairwise (K, 4, T, P) tensors stay small instead of scaling with
    queries x groups; summed over batch like compute_tfl_loss (:806-815).
    """
    k = cfg.tfl_gather_k
    hm, wm = add.car_masks.shape[2], add.car_masks.shape[3]
    mean_size = jnp.zeros(3, jnp.float32)   # meanshape False: dims absolute

    def per_image(boxes_b, dim_b, angle_b, depth_b, midx, pts, pmask,
                  cvalid, cmoving, cmasks, calib, cscale, tfwd, tinv,
                  flip, img_w):
        qidx, qvalid = tfl_aux.gather_matched_queries(midx, k)
        boxes7 = tfl_aux.decode_pred_boxes7(
            boxes_b[qidx], depth_b[qidx], dim_b[qidx], angle_b[qidx],
            calib, add.resolution, cscale, mean_size, tinv, flip, img_w)
        loss_t = tfl_aux.loss_tfl_aux(
            boxes7, qvalid, pts, pmask, cvalid, cmoving, add.templates,
            add.template_dims_hwl, steepness=cfg.tfl_steepness,
            match_dist=cfg.tfl_match_dist)

        if not cfg.use_mask_loss:
            return loss_t, jnp.float32(0.0)
        # per-query matched car (same nearest-center rule as the TFL)
        centers = jax.vmap(tfl_aux.masked_median)(pts, pmask)
        d = jnp.linalg.norm(boxes7[:, None, :3] - centers[None], axis=-1)
        d = jnp.where(cvalid[None, :], d, tfl_aux.BIG)
        match = jnp.argmin(d, axis=1)
        has_mask = jnp.any(cmasks > 0.5, axis=(1, 2))
        ok = qvalid & (jnp.min(d, axis=1) < cfg.tfl_match_dist) \
            & has_mask[match]
        posed = tfl_aux.pose_templates(
            boxes7, add.templates[:1], add.template_dims_hwl,
            cmoving[match])[:, 0]                        # (K, T, 3)
        # original-image px -> mask grid: augmentation affine / stride
        stride = jnp.stack([add.resolution[0] / wm, add.resolution[1] / hm])
        grid_affine = tfwd / stride[:, None]
        sil = mask_aux.splat_silhouette(posed, calib, grid_affine, hm, wm,
                                        sigma_px=cfg.mask_sigma_px)
        loss_m = mask_aux.mask_loss(sil, cmasks[match], ok,
                                    kind=cfg.mask_kind)
        return loss_t, loss_m

    tfl_b, mask_b = jax.vmap(per_image)(
        out["pred_boxes"], out["pred_3d_dim"], out["pred_angle"],
        out["pred_depth"], match_idx, add.car_points, add.car_pmask,
        add.car_valid, add.car_moving, add.car_masks, add.calib,
        add.canonical_scale, add.trans, add.trans_inv, add.flip, add.img_w)
    losses = {}
    if cfg.use_tfl:
        losses["loss_tfl"] = jnp.sum(tfl_b)
    if cfg.use_mask_loss:
        losses["loss_mask"] = jnp.sum(mask_b)
    return losses


def _enc_layer_losses(out: Dict[str, jnp.ndarray], targets: Targets,
                      match_idx: jnp.ndarray, num_boxes: jnp.ndarray,
                      cfg: CriterionConfig) -> Dict[str, jnp.ndarray]:
    """Two-stage encoder-proposal losses: class + box terms only (the enc
    head has no depth/dim/angle outputs)."""
    logits = out["pred_logits"]
    boxes = out["pred_boxes"]
    matched = match_idx >= 0
    tgt_cls = _gather_targets(targets.labels, match_idx)
    tgt_cls = jnp.where(matched, tgt_cls, cfg.num_classes)
    onehot = jax.nn.one_hot(tgt_cls, cfg.num_classes + 1)[..., :-1]
    p = jax.nn.sigmoid(logits)
    ce = -(onehot * jnp.log(p + 1e-8) + (1 - onehot) * jnp.log(1 - p + 1e-8))
    p_t = p * onehot + (1 - p) * (1 - onehot)
    alpha_t = cfg.focal_alpha * onehot + (1 - cfg.focal_alpha) * (1 - onehot)
    loss_ce = jnp.sum(alpha_t * (1 - p_t) ** cfg.focal_gamma * ce) / num_boxes

    mask = matched.astype(jnp.float32)
    tgt_boxes = _gather_targets(targets.boxes_3d, match_idx)
    l1c = jnp.sum(jnp.abs(boxes[..., :2] - tgt_boxes[..., :2]), -1)
    l1b = jnp.sum(jnp.abs(boxes[..., 2:6] - tgt_boxes[..., 2:6]), -1)
    giou_pair = generalized_box_iou(
        box_cxcylrtb_to_xyxy(boxes).reshape(-1, 1, 4),
        box_cxcylrtb_to_xyxy(tgt_boxes).reshape(-1, 1, 4))[:, 0, 0]
    return {"loss_ce": loss_ce,
            "loss_center": jnp.sum(l1c * mask) / num_boxes,
            "loss_bbox": jnp.sum(l1b * mask) / num_boxes,
            "loss_giou": jnp.sum(
                (1 - giou_pair.reshape(mask.shape)) * mask) / num_boxes}


def criterion(outputs: Dict[str, Any], targets: Targets,
              cfg: CriterionConfig = CriterionConfig(),
              training: bool = True,
              axis_name: Optional[str] = None,
              add_data: Optional[AddData] = None) -> Dict[str, jnp.ndarray]:
    """Full loss dict; 'loss_total' is the weighted sum the trainer steps on."""
    group_num = cfg.group_num if training else 1
    num_boxes = jnp.sum(targets.valid).astype(jnp.float32) * group_num
    if axis_name is not None:
        num_boxes = jax.lax.pmean(num_boxes, axis_name)
    num_boxes = jnp.maximum(num_boxes, 1.0)

    def match(out):
        return hungarian_match(out["pred_logits"], out["pred_boxes"],
                               targets.labels, targets.boxes_3d,
                               targets.valid, cfg.matcher, group_num,
                               cfg.num_queries)

    use_add = add_data is not None and (cfg.use_tfl or cfg.use_mask_loss)

    idx_final = match(outputs)
    losses = _layer_losses(outputs, targets, idx_final, num_boxes, cfg)
    losses["loss_depth_map"] = ddn_depth_map_loss(
        outputs["pred_depth_map_logits"], targets, cfg)
    if use_add:
        losses.update(_add_data_losses(outputs, idx_final, add_data, cfg))

    for i, aux in enumerate(outputs.get("aux_outputs", [])):
        idx_aux = match(aux)
        aux_l = _layer_losses(aux, targets, idx_aux, num_boxes, cfg)
        if use_add and cfg.tfl_on_aux:
            aux_l.update(_add_data_losses(aux, idx_aux, add_data, cfg))
        for k, v in aux_l.items():
            losses[f"{k}_{i}"] = v

    enc = outputs.get("enc_outputs")
    if enc is not None:
        s_tok = enc["pred_logits"].shape[1]
        enc_idx = hungarian_match(enc["pred_logits"], enc["pred_boxes"],
                                  targets.labels, targets.boxes_3d,
                                  targets.valid, cfg.matcher, 1, s_tok)
        for k, v in _enc_layer_losses(enc, targets, enc_idx, num_boxes,
                                      cfg).items():
            losses[f"{k}_enc"] = v

    weights = {"loss_ce": cfg.w_cls, "loss_center": cfg.w_center,
               "loss_bbox": cfg.w_bbox, "loss_giou": cfg.w_giou,
               "loss_depth": cfg.w_depth, "loss_dim": cfg.w_dim,
               "loss_angle": cfg.w_angle, "loss_depth_map": cfg.w_depth_map,
               "loss_tfl": cfg.w_tfl, "loss_mask": cfg.w_mask}
    total = jnp.float32(0.0)
    for k, v in losses.items():
        base = k[:-4] if k.endswith("_enc") else (
            k.rsplit("_", 1)[0] if k[-1].isdigit() else k)
        if base in weights:
            total = total + weights[base] * v
    losses["loss_total"] = total
    return losses
