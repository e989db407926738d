"""End-to-end use_add_data wiring: optimized-cars cache -> dataset payload
-> criterion TFL/mask losses -> gradients through a train step.

Closes the round-1 gap where models/tfl_aux.py / mask_aux.py existed but
were never reachable from training (VERDICT.md Missing #2).  Reference path:
kitti_dataset.py:421-449 (loading), monodetr.py:538-804, 967-1157 (losses).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from monosowa_tpu.models import criterion as crit
from monosowa_tpu.models import tfl_aux
from monosowa_tpu.sowa import cache
from monosowa_tpu.sowa.templates import TemplateBank

IMG_W, IMG_H = 1242, 375
P2 = np.array([[721.5, 0, 609.6, 0], [0, 721.5, 172.9, 0], [0, 0, 1, 0]])


# ---------------------------------------------------------------------------
# cache roundtrip
# ---------------------------------------------------------------------------

def test_optimized_cars_cache_roundtrip(tmp_path):
    mask = np.zeros((IMG_H, IMG_W), bool)
    mask[100:150, 500:620] = True
    cars = [{"points": np.random.default_rng(0).normal(size=(123, 3))
             .astype(np.float32), "mask": mask, "moving": True,
             "theta": 0.7},
            {"points": np.zeros((5, 3), np.float32), "mask": None,
             "moving": False, "theta": 0.0}]
    cache.save_optimized_cars(str(tmp_path), "000007", cars)
    loaded = cache.load_optimized_cars(str(tmp_path), "000007")
    assert len(loaded) == 2
    np.testing.assert_allclose(loaded[0]["points"], cars[0]["points"])
    np.testing.assert_array_equal(loaded[0]["mask"], mask)
    assert loaded[0]["moving"] and loaded[0]["theta"] == pytest.approx(0.7)
    assert loaded[1]["mask"] is None and not loaded[1]["moving"]
    assert cache.load_optimized_cars(str(tmp_path), "999999") is None


def test_pipeline_writes_cars_cache(tmp_path):
    """label_and_write persists the use_add_data payload when
    cars_cache_dir is set (save_optimized_cars, main_class.py:780-816)."""
    from monosowa_tpu.sowa import pipeline
    from monosowa_tpu.sowa.fitting import FitConfig
    from tests.test_pipeline_e2e import H, P2 as P2E, W, _make_scene

    cfg = pipeline.PipelineConfig(
        nscans_before=3, nscans_after=3, max_cars=4, max_points=1024,
        min_standing_points=400, fit=FitConfig(fine_chunk=12),
        cars_cache_dir=str(tmp_path / "optimized_cars"))
    labeler = pipeline.PseudoLabeler(cfg)
    pts, masks, transforms = _make_scene()
    cars = labeler.label_and_write(
        str(tmp_path / "000003.txt"), list(range(-3, 4)), 3,
        get_points=lambda k: pts[k], get_masks=lambda k: masks[k],
        transforms=transforms, p2=P2E, img_hw=(H, W))
    assert len(cars) == 1
    loaded = cache.load_optimized_cars(str(tmp_path / "optimized_cars"),
                                       "000003")
    assert len(loaded) == 1
    assert loaded[0]["points"].shape[0] > 400
    assert loaded[0]["mask"] is not None and loaded[0]["mask"].shape == (H, W)
    assert not loaded[0]["moving"]


# ---------------------------------------------------------------------------
# dataset payload
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def kitti_dir_with_cars(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_add")
    for sub in ("image_2", "calib", "label_2"):
        (root / "training" / sub).mkdir(parents=True)
    fid = "000007"
    Image.fromarray(np.zeros((IMG_H, IMG_W, 3), np.uint8)).save(
        root / "training" / "image_2" / f"{fid}.png")
    p2l = " ".join(str(v) for v in P2.reshape(-1))
    (root / "training" / "calib" / f"{fid}.txt").write_text(
        f"P0: {p2l}\nP1: {p2l}\nP2: {p2l}\nP3: {p2l}\n"
        "R0_rect: 1 0 0 0 1 0 0 0 1\n"
        "Tr_velo_to_cam: 1 0 0 0 0 1 0 0 0 0 1 0\n")
    (root / "training" / "label_2" / f"{fid}.txt").write_text(
        "Car 0.00 0 -1.40 500.00 160.00 620.00 220.00 "
        "1.52 1.63 3.88 -1.50 1.70 25.00 -1.46\n")
    (root / "ImageSets").mkdir()
    (root / "ImageSets" / "val.txt").write_text(fid + "\n")

    # fitted car sitting at the labelled pose, with its instance mask
    bank = TemplateBank.default()
    pts = (bank.points[0] + np.array([-1.5, 1.7 - 1.52 / 2, 25.0])) \
        .astype(np.float32)
    mask = np.zeros((IMG_H, IMG_W), bool)
    mask[160:220, 500:620] = True
    cars_dir = root / "adddata" / "optimized_cars"
    cache.save_optimized_cars(str(cars_dir), fid,
                              [{"points": pts, "mask": mask,
                                "moving": False, "theta": 0.0}])
    return str(root)


def _dataset(root, **extra):
    from monosowa_tpu.data.kitti_dataset import KittiDetectionDataset
    cfg = {"use_add_data": True, "add_data_path": root + "/adddata",
           "add_data_points": 256, "max_add_cars": 4, "add_mask_stride": 8,
           "random_flip": 0.0, "aug_crop": False,
           "use_canonical_module": False}
    cfg.update(extra)
    return KittiDetectionDataset(root, "val", cfg)


def test_dataset_emits_add_data(kitti_dir_with_cars):
    ds = _dataset(kitti_dir_with_cars)
    s = ds[0]
    assert s["car_points"].shape == (4, 256, 3)
    assert s["car_valid"][0] and not s["car_valid"][1:].any()
    assert s["car_pmask"][0].all()          # 1000-pt cloud downsampled to 256
    assert not s["car_moving"][0]
    # points untouched (original camera frame)
    assert np.linalg.norm(
        np.median(s["car_points"][0], 0) - [-1.5, 1.7 - 0.76, 25.0]) < 0.8
    # mask warped into the 160x48 grid near the right spot
    m = s["car_masks"][0]
    assert m.shape == (48, 160)
    ys, xs = np.where(m > 0.5)
    assert len(xs) > 0
    # u in [500, 620] of 1242 -> x1280/8 ~ [64, 79]; v [160, 220] -> [20, 28]
    assert 62 <= xs.min() <= 66 and 77 <= xs.max() <= 81
    assert 18 <= ys.min() <= 22 and 26 <= ys.max() <= 30
    assert {"trans", "trans_inv", "flip_flag"} <= set(s)


# ---------------------------------------------------------------------------
# criterion: loss drops as predictions approach the cached cars
# ---------------------------------------------------------------------------

def _fake_layer_outputs(q, center_uv, depth, dims_hwl, ry_alpha, res):
    """One decoder layer's heads putting every query at the given pose."""
    boxes = np.zeros((1, q, 6), np.float32)
    boxes[..., 0] = center_uv[0] / res[0]
    boxes[..., 1] = center_uv[1] / res[1]
    boxes[..., 2:] = 0.02
    depth_a = np.zeros((1, q, 2), np.float32)
    depth_a[..., 0] = depth
    dims = np.tile(np.asarray(dims_hwl, np.float32), (1, q, 1))
    angle = np.zeros((1, q, 24), np.float32)
    angle[..., 0] = 5.0                       # bin 0 confident
    angle[..., 12] = ry_alpha                 # residual
    return {"pred_boxes": jnp.asarray(boxes),
            "pred_depth": jnp.asarray(depth_a),
            "pred_3d_dim": jnp.asarray(dims),
            "pred_angle": jnp.asarray(angle)}


def _make_add_data(car_center, res=(640.0, 384.0)):
    bank = TemplateBank.default()
    tpts = bank.points[::1][:, ::4][:, :256]
    pts = (bank.points[0] + np.asarray(car_center)).astype(np.float32)[::2]
    c, p = 2, pts.shape[0]
    car_points = np.zeros((1, c, p, 3), np.float32)
    car_pmask = np.zeros((1, c, p), bool)
    car_points[0, 0] = pts
    car_pmask[0, 0] = True
    car_valid = np.array([[True, False]])
    mh, mw = 48, 80
    car_masks = np.zeros((1, c, mh, mw), np.float32)
    # project the car points into the (identity-affine) stride-8 grid
    uv = pts @ P2[:3, :3].T
    u, v = uv[:, 0] / uv[:, 2], uv[:, 1] / uv[:, 2]
    gx = np.clip((u / 8).astype(int), 0, mw - 1)
    gy = np.clip((v / 8).astype(int), 0, mh - 1)
    car_masks[0, 0, gy, gx] = 1.0
    ident = np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32)
    l, w, h = (float(x) for x in bank.dims_lwh)
    return crit.AddData(
        car_points=jnp.asarray(car_points), car_pmask=jnp.asarray(car_pmask),
        car_valid=jnp.asarray(car_valid),
        car_moving=jnp.zeros((1, c), bool),
        car_masks=jnp.asarray(car_masks),
        calib=jnp.asarray(P2[None].astype(np.float32)),
        resolution=jnp.asarray(res, jnp.float32),
        canonical_scale=jnp.ones(1, jnp.float32),
        trans=jnp.asarray(ident[None]), trans_inv=jnp.asarray(ident[None]),
        flip=jnp.zeros(1, bool), img_w=jnp.asarray([res[0]], jnp.float32),
        templates=jnp.asarray(tpts),
        template_dims_hwl=jnp.asarray([h, w, l], jnp.float32))


def test_add_data_loss_drops_near_cars():
    # x chosen so the car projects near the middle of the 640-wide grid
    # (cu = 609.6): u = cu + x*fu/z ~ 320 -> both poses stay on-grid
    center = np.array([-8.0, 1.2, 20.0])
    add = _make_add_data(center)
    cfg = crit.CriterionConfig(use_tfl=True, use_mask_loss=True,
                               tfl_gather_k=8)
    uv = P2[:3, :3] @ center
    u, v = uv[0] / uv[2], uv[1] / uv[2]
    bank = TemplateBank.default()
    l, w, h = (float(x) for x in bank.dims_lwh)
    match_idx = jnp.asarray(np.array([[0, -1, -1, -1]], np.int32))

    def losses_at(du, ddepth):
        out = _fake_layer_outputs(4, (u + du, v), 20.0 + ddepth,
                                  (h, w, l), -np.pi / 2, (640.0, 384.0))
        return crit._add_data_losses(out, match_idx, add, cfg)

    good = losses_at(0.0, 0.0)
    bad = losses_at(60.0, 3.0)
    assert float(good["loss_tfl"]) < float(bad["loss_tfl"])
    assert float(good["loss_mask"]) < float(bad["loss_mask"])
    assert np.isfinite(float(good["loss_tfl"]))
    assert np.isfinite(float(good["loss_mask"]))

    # gradients flow into the box/depth heads
    out = _fake_layer_outputs(4, (u + 10.0, v), 21.0, (h, w, l),
                              -np.pi / 2, (640.0, 384.0))

    def f(boxes):
        o = dict(out, pred_boxes=boxes)
        d = crit._add_data_losses(o, match_idx, add, cfg)
        return d["loss_tfl"] + d["loss_mask"]

    g = np.asarray(jax.grad(f)(out["pred_boxes"]))
    assert np.abs(g[0, 0]).max() > 0          # matched query gets gradient
    assert np.abs(g[0, 1:]).max() == 0        # unmatched get none


# ---------------------------------------------------------------------------
# train step: aux terms present and finite with the flags on
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_train_step_with_add_data():
    from monosowa_tpu.models.matcher import MatcherConfig
    from monosowa_tpu.models.monodetr import MonoDETR
    from monosowa_tpu.train.optim import make_optimizer
    from monosowa_tpu.train.trainer import init_state, make_train_step
    import __graft_entry__ as ge

    model = MonoDETR(enc_layers=1, dec_layers=2, group_num=2, d_model=64,
                     d_ffn=64, nheads=4, num_queries=10, num_depth_bins=16)
    b, hh, ww = 2, 96, 160
    batch = ge._sample_batch(b, hh, ww)
    # add-data payload: one car per image near the (synthetic) targets
    bank = TemplateBank.default()
    pts = (bank.points[0][::4] + np.array([0.0, 1.0, 15.0])) \
        .astype(np.float32)
    c, p = 2, pts.shape[0]
    batch["car_points"] = jnp.asarray(
        np.tile(pts[None, None], (b, c, 1, 1)))
    batch["car_pmask"] = jnp.ones((b, c, p), bool)
    batch["car_valid"] = jnp.asarray(np.tile([True, False], (b, 1)))
    batch["car_moving"] = jnp.zeros((b, c), bool)
    masks = np.zeros((b, c, hh // 8, ww // 8), np.float32)
    masks[:, 0, 4:8, 6:14] = 1.0
    batch["car_masks"] = jnp.asarray(masks)
    ident = np.tile(np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32),
                    (b, 1, 1))
    batch["trans"] = jnp.asarray(ident)
    batch["trans_inv"] = jnp.asarray(ident)
    batch["flip_flag"] = jnp.zeros(b, bool)
    batch["canonical_scale"] = jnp.ones(b, jnp.float32)

    ccfg = crit.CriterionConfig(
        group_num=model.group_num, num_queries=model.num_queries,
        num_classes=model.num_classes,
        matcher=MatcherConfig(backend="auction"),
        use_tfl=True, use_mask_loss=True, tfl_gather_k=8)
    tx = make_optimizer(base_lr=2e-4, steps_per_epoch=10)
    state = init_state(model, tx,
                       {k: np.asarray(v) for k, v in batch.items()})
    step = make_train_step(model, ccfg)
    state, losses = step(state, batch, jax.random.PRNGKey(0))
    assert "loss_tfl" in losses and "loss_mask" in losses
    assert "loss_tfl_0" in losses              # aux decoder layer too
    for k in ("loss_tfl", "loss_mask", "loss_total", "grad_norm"):
        assert np.isfinite(float(losses[k])), k
    assert float(losses["grad_norm"]) > 0
