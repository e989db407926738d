"""Flag-parity items: learned position embedding, 4-channel depth input,
SAM-style mask refinement interface (VERDICT round-1 Missing #5-7)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from monosowa_tpu.models.position_encoding import (LearnedPositionEmbedding,
                                                   sine_position_encoding)
from monosowa_tpu.sowa import masks as masks_mod


# ---------------------------------------------------------------------------
# learned position embedding
# ---------------------------------------------------------------------------

def test_learned_pos_embedding_interpolation():
    mod = LearnedPositionEmbedding(num_pos_feats=8, table_size=50)
    h, w = 10, 25
    variables = mod.init(jax.random.PRNGKey(0), h, w)
    out = np.asarray(mod.apply(variables, h, w))
    assert out.shape == (h, w, 16)
    row = np.asarray(variables["params"]["row_embed"]["embedding"])
    col = np.asarray(variables["params"]["col_embed"]["embedding"])
    # reference formula (position_encoding.py:70-86): coord = idx / extent
    # * 49, emb = table[floor]*(1-d) + table[floor+1]*d; channels [x, y]
    i = np.arange(w) / w * 49.0
    j = np.arange(h) / h * 49.0

    def interp(coord, table):
        f = np.floor(coord).astype(int)
        d = (coord - f)[:, None]
        c = np.clip(f + 1, 0, 49)
        return table[f] * (1 - d) + table[c] * d

    x_emb = interp(i, col)
    y_emb = interp(j, row)
    np.testing.assert_allclose(out[3, :, :8], x_emb, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out[:, 7, 8:], y_emb, rtol=1e-5, atol=1e-5)


def test_model_learned_pos_embedding_runs():
    from monosowa_tpu.models.monodetr import MonoDETR
    model = MonoDETR(enc_layers=1, dec_layers=2, group_num=1, d_model=64,
                     d_ffn=64, nheads=4, num_queries=10, num_depth_bins=16,
                     position_embedding="learned")
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 96, 160, 3)).astype(np.float32))
    calib = jnp.asarray(np.array([[[250.0, 0, 80, 0], [0, 250.0, 48, 0],
                                   [0, 0, 1, 0]]], np.float32))
    sz = jnp.asarray([[160.0, 96.0]])
    variables = model.init(jax.random.PRNGKey(0), img, calib, sz,
                           training=False)
    assert "position_embedding" in variables["params"]
    out = model.apply(variables, img, calib, sz, training=False)
    assert np.isfinite(np.asarray(out["pred_logits"])).all()


@pytest.mark.slow
def test_model_use_dab_runs():
    """DAB anchor queries: 6-dof refpoint embeddings + per-layer query_pos
    derived from the current anchors (depthaware_transformer.py:255-259,
    568-585)."""
    from monosowa_tpu.models.monodetr import MonoDETR, _dab_sine_embed
    model = MonoDETR(enc_layers=1, dec_layers=2, group_num=2, d_model=64,
                     d_ffn=64, nheads=4, num_queries=10, num_depth_bins=16,
                     use_dab=True)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 96, 160, 3)).astype(np.float32))
    calib = jnp.asarray(np.array([[[250.0, 0, 80, 0], [0, 250.0, 48, 0],
                                   [0, 0, 1, 0]]], np.float32))
    sz = jnp.asarray([[160.0, 96.0]])
    variables = model.init(jax.random.PRNGKey(0), img, calib, sz,
                           training=False)
    p = variables["params"]
    assert "tgt_embed" in p and "refpoint_embed" in p
    assert p["refpoint_embed"].shape == (20, 6)
    assert "dab_ref_point_head" in p and "dab_query_scale" in p
    for training in (False, True):
        out = model.apply(variables, img, calib, sz, training=training,
                          rngs={"dropout": jax.random.PRNGKey(1)})
        assert np.isfinite(np.asarray(out["pred_logits"])).all()
        assert out["pred_boxes"].shape[-1] == 6

    # sine embed matches the reference formula on coordinate 0 (=y channel)
    ref6 = jnp.asarray(rng.uniform(0, 1, (1, 3, 6)).astype(np.float32))
    emb = np.asarray(_dab_sine_embed(ref6, 8))
    assert emb.shape == (1, 3, 48)
    dim_t = 10000.0 ** (2 * (np.arange(8) // 2) / 8)
    y = np.asarray(ref6[0, 0, 1]) * 2 * np.pi / dim_t
    want = np.stack([np.sin(y[0::2]), np.cos(y[1::2])], -1).reshape(-1)
    np.testing.assert_allclose(emb[0, 0, :8], want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# 4-channel depth input
# ---------------------------------------------------------------------------

def test_model_use_depth_4ch():
    from monosowa_tpu.models.monodetr import MonoDETR
    model = MonoDETR(enc_layers=1, dec_layers=2, group_num=1, d_model=64,
                     d_ffn=64, nheads=4, num_queries=10, num_depth_bins=16,
                     use_depth=True)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 96, 160, 4)).astype(np.float32))
    calib = jnp.asarray(np.array([[[250.0, 0, 80, 0], [0, 250.0, 48, 0],
                                   [0, 0, 1, 0]]], np.float32))
    sz = jnp.asarray([[160.0, 96.0]])
    variables = model.init(jax.random.PRNGKey(0), img, calib, sz,
                           training=False)
    k = variables["params"]["backbone"]["conv1"]["kernel"]
    assert k.shape == (7, 7, 4, 64)
    out = model.apply(variables, img, calib, sz, training=False)
    assert np.isfinite(np.asarray(out["pred_logits"])).all()


def test_dataset_use_depth_channel(tmp_path):
    from monosowa_tpu.data.kitti_dataset import KittiDetectionDataset
    root = tmp_path / "kitti"
    for sub in ("image_2", "calib", "label_2"):
        (root / "training" / sub).mkdir(parents=True)
    fid = "000007"
    H, W = 375, 1242
    Image.fromarray(np.zeros((H, W, 3), np.uint8)).save(
        root / "training" / "image_2" / f"{fid}.png")
    p2 = "721.5 0 609.6 0 0 721.5 172.9 0 0 0 1 0"
    (root / "training" / "calib" / f"{fid}.txt").write_text(
        f"P0: {p2}\nP1: {p2}\nP2: {p2}\nP3: {p2}\n"
        "R0_rect: 1 0 0 0 1 0 0 0 1\n"
        "Tr_velo_to_cam: 1 0 0 0 0 1 0 0 0 0 1 0\n")
    (root / "training" / "label_2" / f"{fid}.txt").write_text("")
    (root / "ImageSets").mkdir()
    (root / "ImageSets" / "val.txt").write_text(fid + "\n")
    depth_dir = root / "depth"
    depth_dir.mkdir()
    np.savez_compressed(depth_dir / f"{fid}.npz",
                        depth=np.full((H, W), 30.0, np.float32))

    ds = KittiDetectionDataset(str(root), "val", {
        "use_depth": True, "depth_path": str(depth_dir),
        "random_flip": 0.0, "aug_crop": False})
    s = ds[0]
    assert s["image"].shape[-1] == 4
    # 30 m -> clip/75 - 1 = -0.6
    assert s["image"][..., 3] == pytest.approx(-0.6, abs=1e-5)


# ---------------------------------------------------------------------------
# SAM-style refinement interface
# ---------------------------------------------------------------------------

class _FakeRefiner:
    """Returns the prompt box filled as the mask (records calls)."""

    def __init__(self):
        self.calls = []

    def refine(self, image, boxes):
        self.calls.append(boxes.copy())
        out = []
        for x1, y1, x2, y2 in boxes:
            m = np.zeros(image.shape[:2], bool)
            m[y1:y2 + 1, x1:x2 + 1] = True
            out.append(m)
        return out


def test_refine_masks_replaces_high_score_only():
    h, w = 40, 60
    image = np.zeros((h, w, 3), np.uint8)
    m1 = np.zeros((h, w), bool)
    m1[10:20, 15:30] = True          # high score -> refined to its bbox
    m2 = np.zeros((h, w), bool)
    m2[25:30, 40:50] = True          # low score -> untouched
    backend = _FakeRefiner()
    out = masks_mod.refine_masks([m1, m2], [0.9, 0.3], image, backend)
    np.testing.assert_array_equal(backend.calls[0], [[15, 10, 29, 19]])
    assert out[0][10:20, 15:30].all() and out[0].sum() == 10 * 15
    np.testing.assert_array_equal(out[1], m2)


def test_refine_masks_no_eligible_is_noop():
    image = np.zeros((10, 10, 3), np.uint8)
    m = np.zeros((10, 10), bool)
    m[2:4, 2:4] = True
    backend = _FakeRefiner()
    out = masks_mod.refine_masks([m], [0.1], image, backend)
    assert backend.calls == []
    np.testing.assert_array_equal(out[0], m)
