"""pjit data-parallel training loop.

Behavioral contract (MonoDETR/lib/helpers/trainer_helper.py:15-191): epoch
loop with per-epoch checkpointing and best-model tracking; targets filtered
by mask_2d before the criterion (prepare_targets :180-191); loss = weighted
sum of the criterion dict.

TPU design: one jitted ``train_step`` consuming a globally-sharded batch
(parallel.mesh); gradients all-reduce over ICI implicitly.  The matcher
runs the exact on-device JV backend under jit (no host callbacks inside
the sharded step).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from monosowa_tpu.models.criterion import (AddData, CriterionConfig, Targets,
                                           criterion)
from monosowa_tpu.models.matcher import MatcherConfig
from monosowa_tpu.models.monodetr import MonoDETR


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    frozen: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, frozen, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   frozen=frozen, opt_state=tx.init(params), tx=tx)


def targets_from_batch(batch: Dict[str, jnp.ndarray]) -> Targets:
    """Batch dict -> padded Targets; validity gated by mask_2d like the
    reference's prepare_targets (trainer_helper.py:180-191)."""
    valid = batch["valid"] & batch["mask_2d"]
    return Targets(labels=batch["labels"].astype(jnp.int32),
                   boxes_3d=batch["boxes_3d"],
                   boxes_2d=batch["boxes"],
                   depth=batch["depth"],
                   size_3d=batch["size_3d"],
                   heading_bin=batch["heading_bin"].astype(jnp.int32),
                   heading_res=batch["heading_res"],
                   valid=valid)


def add_data_from_batch(batch: Dict[str, jnp.ndarray],
                        templates: jnp.ndarray,
                        template_dims_hwl: jnp.ndarray) -> Optional[AddData]:
    """Assemble the TFL/mask auxiliary payload when the dataset emitted
    pseudo-label cars (use_add_data, kitti_dataset.py:421-449)."""
    if "car_points" not in batch:
        return None
    img = batch["image"]
    resolution = jnp.asarray([img.shape[2], img.shape[1]], jnp.float32)
    return AddData(
        car_points=batch["car_points"], car_pmask=batch["car_pmask"],
        car_valid=batch["car_valid"], car_moving=batch["car_moving"],
        car_masks=batch["car_masks"], calib=batch["calib"],
        resolution=resolution, canonical_scale=batch["canonical_scale"],
        trans=batch["trans"], trans_inv=batch["trans_inv"],
        flip=batch["flip_flag"], img_w=batch["img_size"][:, 0],
        templates=templates, template_dims_hwl=template_dims_hwl)


def _tfl_templates(n_points: int = 256):
    """Canonical template clouds for the aux losses, subsampled to a fixed
    small point count (TPU memory: the TFL pairwise tensor is K x 4T x P)."""
    from monosowa_tpu.sowa.templates import TemplateBank
    bank = TemplateBank.default()
    pts = np.asarray(bank.points)                      # (4, T, 3)
    stride = max(1, pts.shape[1] // n_points)
    l, w, h = (float(v) for v in bank.dims_lwh)
    return (jnp.asarray(pts[:, ::stride][:, :n_points]),
            jnp.asarray([h, w, l], jnp.float32))


def criterion_config_from_yaml(model: MonoDETR,
                               mcfg: Dict[str, Any]) -> CriterionConfig:
    """Reference-format model yaml keys -> CriterionConfig
    (configs/monodetr.yaml:96-115 coefficient names)."""
    return CriterionConfig(
        group_num=model.group_num, num_queries=model.num_queries,
        num_classes=model.num_classes,
        matcher=MatcherConfig(backend="jv"),
        focal_alpha=float(mcfg.get("focal_alpha", 0.25)),
        w_cls=float(mcfg.get("cls_loss_coef", 2)),
        w_bbox=float(mcfg.get("bbox_loss_coef", 5)),
        w_giou=float(mcfg.get("giou_loss_coef", 2)),
        w_center=float(mcfg.get("3dcenter_loss_coef", 10)),
        w_dim=float(mcfg.get("dim_loss_coef", 1)),
        w_angle=float(mcfg.get("angle_loss_coef", 1)),
        w_depth=float(mcfg.get("depth_loss_coef", 1)),
        w_depth_map=float(mcfg.get("depth_map_loss_coef", 1)),
        num_depth_bins=int(mcfg.get("num_depth_bins", 80)),
        depth_min=float(mcfg.get("depth_min", 1e-3)),
        depth_max=float(mcfg.get("depth_max", 60.0)),
        use_tfl=bool(mcfg.get("use_tfl", False)),
        use_mask_loss=bool(mcfg.get("use_mask_loss", False)),
        w_tfl=float(mcfg.get("tfl_loss_coef", 1)),
        w_mask=float(mcfg.get("mask_loss_coef", 1)),
        mask_kind=str(mcfg.get("mask_loss", "BCE")))


def make_train_step(model: MonoDETR, ccfg: Optional[CriterionConfig] = None):
    """Build the jitted train step.  ccfg defaults to the reference loss
    weights with the exact on-device JV matcher."""
    if ccfg is None:
        ccfg = CriterionConfig(
            group_num=model.group_num, num_queries=model.num_queries,
            num_classes=model.num_classes,
            matcher=MatcherConfig(backend="jv"))
    templates = template_dims = None
    if ccfg.use_tfl or ccfg.use_mask_loss:
        templates, template_dims = _tfl_templates()

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        targets = targets_from_batch(batch)
        add_data = (add_data_from_batch(batch, templates, template_dims)
                    if templates is not None else None)

        def loss_fn(params):
            out = model.apply(
                {"params": params, "frozen": state.frozen},
                batch["image"], batch["calib"], batch["img_size"],
                training=True, rngs={"dropout": rng})
            losses = criterion(out, targets, ccfg, training=True,
                               add_data=add_data)
            return losses["loss_total"], losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt)
        losses["grad_norm"] = optax.global_norm(grads)
        return new_state, losses

    return train_step


def make_eval_step(model: MonoDETR, topk: int = 50):
    from monosowa_tpu.train.decode import extract_dets

    @jax.jit
    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        out = model.apply({"params": state.params, "frozen": state.frozen},
                          batch["image"], batch["calib"], batch["img_size"],
                          training=False)
        return extract_dets(out, topk=topk)

    return eval_step


def init_state(model: MonoDETR, tx: optax.GradientTransformation,
               sample_batch: Dict[str, np.ndarray],
               seed: int = 444) -> TrainState:
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.asarray(sample_batch["image"][:1]),
                           jnp.asarray(sample_batch["calib"][:1]),
                           jnp.asarray(sample_batch["img_size"][:1]),
                           training=False)
    return TrainState.create(variables["params"], variables["frozen"], tx)
