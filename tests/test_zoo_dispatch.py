"""Config-driven dispatch of the TPU-served model zoo (sowa/zoo.py): each
live backend is driven through its CLI action from yaml keys + a tiny
random-weight checkpoint, and the cached/checkpoint-free defaults stay the
default.

Reference contract: the external models are selected from config —
use_SAM (config.yaml:27 gating loader.py:1727-1739), detectron init
(loader.py:80-95), Metric3D (metric3d.py:24-39), kornia LoFTR
(stitching.py:29-151), ODTrack (tracker_ODTrack.py:10-58)."""

import numpy as np
import pytest
import yaml
from PIL import Image

from monosowa_tpu.config import Config
from monosowa_tpu.sowa import cli, masks as masks_mod, zoo

H, W = 64, 96
P2 = np.array([[120.0, 0, W / 2, 0], [0, 120.0, H / 2, 0], [0, 0, 1, 0]])


# ---------------------------------------------------------------------------
# checkpoint serialization
# ---------------------------------------------------------------------------

def test_checkpoint_roundtrip(tmp_path):
    from monosowa_tpu.models import depth_anything as da
    from monosowa_tpu.models import dinov2 as dn

    bb = dn.Dinov2Config(hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, pos_grid=2)
    cfg = da.DepthAnythingConfig(
        backbone=bb, out_indices=(1,), reassemble_factors=(1.0,),
        neck_hidden_sizes=(8,), fusion_hidden_size=8, head_hidden_size=4,
        depth_estimation_type="metric", max_depth=80.0)
    params = da.init_depth_anything_params(0, cfg)
    path = str(tmp_path / "ck.npz")
    zoo.save_checkpoint(path, "depth_anything", params, cfg)
    kind, params2, cfg2 = zoo.load_checkpoint(path)
    assert kind == "depth_anything"
    assert cfg2 == cfg
    flat1, flat2 = zoo.flatten_params(params), zoo.flatten_params(params2)
    assert flat1.keys() == flat2.keys()
    for k in flat1:
        np.testing.assert_array_equal(flat1[k], flat2[k])
    # lists survive as lists (reassemble/fusion are list pytrees)
    assert isinstance(params2["reassemble"], list)
    with pytest.raises(ValueError):
        zoo._load_checked(path, "sam")


def test_default_backends_are_fallbacks():
    from monosowa_tpu.sowa.depth import CachedDepthBackend
    from monosowa_tpu.sowa.stitching import OrbMatcherBackend
    from monosowa_tpu.sowa.tracker2d import TemplateMatchTracker

    cfg = Config({})
    assert isinstance(zoo.depth_backend(cfg, "/tmp/x"), CachedDepthBackend)
    assert zoo.mask_backend(cfg) is None
    assert zoo.sam_refine_backend(cfg) is None
    assert isinstance(zoo.matcher_backend(cfg), OrbMatcherBackend)
    assert zoo.tracker_factory(cfg) is TemplateMatchTracker


# ---------------------------------------------------------------------------
# tiny checkpoints
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def depth_ckpt(tmp_path_factory):
    from monosowa_tpu.models import depth_anything as da
    from monosowa_tpu.models import dinov2 as dn

    bb = dn.Dinov2Config(hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, pos_grid=2)
    cfg = da.DepthAnythingConfig(
        backbone=bb, out_indices=(1, 2), reassemble_factors=(4.0, 0.5),
        neck_hidden_sizes=(8, 16), fusion_hidden_size=16, head_hidden_size=8,
        depth_estimation_type="metric", max_depth=80.0)
    params = da.init_depth_anything_params(0, cfg)
    path = str(tmp_path_factory.mktemp("zoo") / "depth.npz")
    zoo.save_checkpoint(path, "depth_anything", params, cfg)
    return path


@pytest.fixture(scope="module")
def mask_ckpt(tmp_path_factory):
    import torch
    import transformers

    from monosowa_tpu.models import mask2former as m2f

    hf_cfg = transformers.Mask2FormerConfig(
        backbone_config=transformers.SwinConfig(
            embed_dim=8, depths=[1, 1, 1, 1], num_heads=[1, 2, 4, 8],
            window_size=2, patch_size=4, image_size=64,
            out_features=["stage1", "stage2", "stage3", "stage4"]),
        feature_size=32, mask_feature_size=32, hidden_dim=32,
        encoder_layers=1, decoder_layers=2, num_attention_heads=2,
        encoder_feedforward_dim=32, dim_feedforward=32, num_queries=8,
        num_labels=5)
    torch.manual_seed(0)
    tm = transformers.Mask2FormerForUniversalSegmentation(hf_cfg).eval()
    cfg = m2f.config_from_hf_mask2former(hf_cfg)
    params = m2f.import_hf_mask2former(tm.state_dict(), cfg)
    path = str(tmp_path_factory.mktemp("zoo") / "mask.npz")
    zoo.save_checkpoint(path, "mask2former", params, cfg)
    return path


@pytest.fixture(scope="module")
def sam_ckpt(tmp_path_factory):
    import torch
    import transformers

    from monosowa_tpu.models import sam as sm

    hf_cfg = transformers.SamConfig(
        vision_config=dict(hidden_size=32, num_hidden_layers=2,
                           num_attention_heads=2, image_size=32,
                           patch_size=8, window_size=2,
                           global_attn_indexes=[1], output_channels=16,
                           mlp_dim=64, num_pos_feats=8),
        prompt_encoder_config=dict(hidden_size=16, image_size=32,
                                   patch_size=8, image_embedding_size=4,
                                   num_pos_feats=8),
        mask_decoder_config=dict(hidden_size=16, num_attention_heads=2,
                                 num_hidden_layers=2, mlp_dim=32,
                                 iou_head_depth=3, iou_head_hidden_dim=16,
                                 num_pos_feats=8))
    torch.manual_seed(0)
    tm = transformers.SamModel(hf_cfg).eval()
    cfg = sm.config_from_hf_sam(hf_cfg)
    params = sm.import_hf_sam(tm.state_dict(), cfg)
    path = str(tmp_path_factory.mktemp("zoo") / "sam.npz")
    zoo.save_checkpoint(path, "sam", params, cfg)
    return path


@pytest.fixture(scope="module")
def loftr_ckpt(tmp_path_factory):
    import torch
    import transformers

    from monosowa_tpu.models import efficientloftr as elo

    hf_cfg = transformers.EfficientLoFTRConfig(
        stage_num_blocks=[1, 1, 1, 1], out_features=[4, 8, 16, 32],
        stage_stride=[2, 1, 2, 2], hidden_size=32, num_attention_heads=2,
        num_attention_layers=2, partial_rotary_factor=1.0,
        fine_kernel_size=8, fine_matching_slice_dim=4,
        coarse_matching_threshold=1e-6)
    torch.manual_seed(0)
    tm = transformers.EfficientLoFTRForKeypointMatching(hf_cfg).eval()
    cfg = elo.config_from_hf_efficientloftr(hf_cfg)
    params = elo.import_hf_efficientloftr(tm.state_dict(), cfg)
    path = str(tmp_path_factory.mktemp("zoo") / "loftr.npz")
    zoo.save_checkpoint(path, "loftr", params, cfg)
    return path


@pytest.fixture(scope="module")
def tracker_ckpt(tmp_path_factory):
    from monosowa_tpu.models import vit_tracker as vt

    cfg = vt.ViTTrackerConfig(hidden_size=32, num_layers=2, num_heads=2,
                              patch_size=16, template_size=32,
                              search_size=64, num_track_tokens=2)
    params = vt.init_tracker_params(0, cfg)
    path = str(tmp_path_factory.mktemp("zoo") / "tracker.npz")
    zoo.save_checkpoint(path, "vit_tracker", params, cfg)
    return path


# ---------------------------------------------------------------------------
# CLI actions driving each backend
# ---------------------------------------------------------------------------

def _kitti_tree(tmp_path, n_frames=1):
    kitti = tmp_path / "kitti"
    (kitti / "training" / "image_2").mkdir(parents=True)
    (kitti / "training" / "calib").mkdir(parents=True)
    p2_line = " ".join(str(v) for v in P2.reshape(-1))
    calib_txt = "\n".join(
        [f"P{i}: {p2_line}" for i in range(4)]
        + ["R0_rect: 1 0 0 0 1 0 0 0 1",
           "Tr_velo_to_cam: 1 0 0 0 0 1 0 0 0 0 1 0",
           "Tr_imu_to_velo: 1 0 0 0 0 1 0 0 0 0 1 0"]) + "\n"
    rng = np.random.default_rng(0)
    for i in range(n_frames):
        fid = f"{i:06d}"
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        Image.fromarray(img).save(
            kitti / "training" / "image_2" / f"{fid}.png")
        (kitti / "training" / "calib" / f"{fid}.txt").write_text(calib_txt)
    return kitti


def _write_cfg(tmp_path, extra):
    cfg = {
        "paths": {"kitti_path": str(tmp_path / "kitti") + "/",
                  "merged_frames_path": str(tmp_path / "cache") + "/",
                  "labels_path": str(tmp_path / "labels") + "/"},
    }
    for k, v in extra.items():
        cfg.setdefault(k, {}).update(v)
    path = tmp_path / "config.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


def test_lidar_scans_action_drives_depth_anything(tmp_path, depth_ckpt):
    """`--action lidar_scans` with backends.depth: depth_anything writes a
    pseudo-lidar cache from the frame image through the live network."""
    _kitti_tree(tmp_path)
    cfg = _write_cfg(tmp_path, {
        "backends": {"depth": "depth_anything",
                     "depth_checkpoint": depth_ckpt,
                     "depth_input_size": 28}})
    rc = cli.main(["--config", cfg, "--dataset", "kitti",
                   "--action", "lidar_scans"])
    assert rc == 0
    out = tmp_path / "cache" / "lidar_raw" / "000000.npz"
    assert out.exists()
    with np.load(out) as z:
        pts = z["points"]
    assert pts.shape[1] == 3 and len(pts) > 0
    assert np.isfinite(pts).all()


def test_mask_tracking_action_drives_mask2former(tmp_path, mask_ckpt):
    """`--action mask_tracking` on a frame dataset runs the live
    instance-segmentation backend into masks_raw/
    (precompute_detectron_kitti, loader.py:1703-1790)."""
    _kitti_tree(tmp_path)
    cfg = _write_cfg(tmp_path, {
        "backends": {"mask": "mask2former", "mask_checkpoint": mask_ckpt,
                     "mask_input_hw": [64, 96], "mask_car_labels": [0, 1,
                                                                    2, 3]},
        # random weights produce arbitrary probabilities; a low threshold
        # makes some detections land in the cache
        "filtering": {"score_detectron_thresh": 0.05}})
    rc = cli.main(["--config", cfg, "--dataset", "kitti",
                   "--action", "mask_tracking"])
    assert rc == 0
    out = tmp_path / "cache" / "masks_raw" / "000000.npz"
    assert out.exists()
    loaded = masks_mod.load_masks(str(tmp_path / "cache" / "masks_raw"),
                                  "000000")
    assert loaded is not None
    for m in loaded:
        assert m.shape == (H, W)


def test_mask_tracking_without_backend_raises(tmp_path):
    _kitti_tree(tmp_path)
    cfg = _write_cfg(tmp_path, {})
    with pytest.raises(NotImplementedError):
        cli.main(["--config", cfg, "--dataset", "kitti",
                  "--action", "mask_tracking"])


def test_use_sam_refines_masks(tmp_path, mask_ckpt, sam_ckpt):
    """frames_creation.use_SAM + paths.sam_path routes every detection
    through box-prompted SAM refinement (run_SAM_batch
    filtering.py:112-148)."""
    _kitti_tree(tmp_path)
    cfg = _write_cfg(tmp_path, {
        "backends": {"mask": "mask2former", "mask_checkpoint": mask_ckpt,
                     "mask_input_hw": [64, 96],
                     "mask_car_labels": [0, 1, 2, 3]},
        "filtering": {"score_detectron_thresh": 0.05},
        "frames_creation": {"use_SAM": True},
        "paths": {"sam_path": sam_ckpt}})
    rc = cli.main(["--config", cfg, "--dataset", "kitti",
                   "--action", "mask_tracking"])
    assert rc == 0
    assert (tmp_path / "cache" / "masks_raw" / "000000.npz").exists()


def test_use_sam_without_path_raises():
    cfg = Config({"frames_creation": {"use_SAM": True}})
    with pytest.raises(ValueError, match="sam_path"):
        zoo.sam_refine_backend(cfg)


def test_matcher_backend_loftr_from_config(tmp_path, loftr_ckpt):
    """backends.matcher: loftr serves EfficientLoFTR for homography
    estimation; it returns matched pixel pairs on real-sized images."""
    from monosowa_tpu.sowa.stitching import FlaxLoFTRMatcherBackend

    cfg = Config({"backends": {"matcher": "loftr",
                               "matcher_checkpoint": loftr_ckpt,
                               "matcher_input_hw": [64, 96]}})
    m = cli.stitching_matcher_backend(cfg)
    assert isinstance(m, FlaxLoFTRMatcherBackend)
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    kp_a, kp_b = m.match(a, a)
    assert kp_a.shape == kp_b.shape and kp_a.shape[1] == 2


def test_tracker_factory_vit_from_config(tracker_ckpt):
    """backends.tracker: vit builds ViT-tracker instances that share one
    jitted forward and track a bright square."""
    from monosowa_tpu.sowa.tracker2d import FlaxViTTrackerBackend

    cfg = Config({"backends": {"tracker": "vit",
                               "tracker_checkpoint": tracker_ckpt}})
    factory = zoo.tracker_factory(cfg)
    t1, t2 = factory(), factory()
    assert isinstance(t1, FlaxViTTrackerBackend)
    assert t1._fwd is t2._fwd          # shared jit, no per-track retrace
    img = np.full((80, 120, 3), 30, np.uint8)
    img[20:36, 40:60] = 220
    t1.init(img, [40, 20, 20, 16])
    box = t1.track(img)
    assert len(box) == 4 and all(np.isfinite(box))
