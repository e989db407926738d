"""Differential parity: the pure-JAX one-stream ViT tracker vs a torch
mirror, plus the SingleObjectTracker backend contract.

The 2D tracking capability (SURVEY.md §2.1 P23, reference
tracker_ODTrack.py) is served by ``monosowa_tpu/models/vit_tracker.py``.
ODTrack itself has no importable checkpoint in this image, so the oracle
here is an independently-written torch implementation of the same
specification (one-stream ViT over [track tokens; template; search] with a
center/offset/size head) — the test pins the numerics of the JAX forward
and the torch state-dict importer, following the pattern of
tests/test_backbone_import.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from monosowa_tpu.models import vit_tracker as vt  # noqa: E402

CFG = vt.ViTTrackerConfig(hidden_size=32, num_layers=2, num_heads=2,
                          patch_size=16, template_size=32, search_size=64,
                          num_track_tokens=2)


class _Block(nn.Module):
    def __init__(self, c, heads, mlp):
        super().__init__()
        self.norm1 = nn.LayerNorm(c, eps=1e-6)
        self.qkv = nn.Linear(c, 3 * c)
        self.proj = nn.Linear(c, c)
        self.norm2 = nn.LayerNorm(c, eps=1e-6)
        self.fc1 = nn.Linear(c, mlp)
        self.fc2 = nn.Linear(mlp, c)
        self.heads = heads

    def forward(self, x):
        b, n, c = x.shape
        h = self.heads
        d = c // h
        qkv = self.qkv(self.norm1(x)).reshape(b, n, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = torch.einsum("bqhd,bkhd->bhqk", q, k) / d ** 0.5
        probs = torch.softmax(logits.float(), -1).to(x.dtype)
        att = torch.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, c)
        x = x + self.proj(att)
        y = self.fc2(nn.functional.gelu(self.fc1(self.norm2(x))))
        return x + y


class _TorchTracker(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        c = cfg.hidden_size
        self.cfg = cfg
        self.patch_proj = nn.Conv2d(3, c, cfg.patch_size, cfg.patch_size)
        self.pos_z = nn.Parameter(torch.randn(1, cfg.grid_t ** 2, c) * 0.02)
        self.pos_x = nn.Parameter(torch.randn(1, cfg.grid_s ** 2, c) * 0.02)
        self.track_token = nn.Parameter(
            torch.randn(1, cfg.num_track_tokens, c) * 0.02)
        self.blocks = nn.ModuleList(
            [_Block(c, cfg.num_heads, int(c * cfg.mlp_ratio))
             for _ in range(cfg.num_layers)])
        self.final_norm = nn.LayerNorm(c, eps=1e-6)
        self.score_head = nn.Sequential(
            nn.Conv2d(c, c // 2, 3, padding=1), nn.ReLU(),
            nn.Conv2d(c // 2, 1, 3, padding=1))
        self.offset_head = nn.Sequential(
            nn.Conv2d(c, c // 2, 3, padding=1), nn.ReLU(),
            nn.Conv2d(c // 2, 2, 3, padding=1))
        self.size_head = nn.Sequential(
            nn.Conv2d(c, c // 2, 3, padding=1), nn.ReLU(),
            nn.Conv2d(c // 2, 2, 3, padding=1))

    def forward(self, template, search, track_tokens):
        cfg = self.cfg
        zt = self.patch_proj(template).flatten(2).transpose(1, 2) + self.pos_z
        xt = self.patch_proj(search).flatten(2).transpose(1, 2) + self.pos_x
        tokens = torch.cat([track_tokens, zt, xt], dim=1)
        for blk in self.blocks:
            tokens = blk(tokens)
        tokens = self.final_norm(tokens)
        k = cfg.num_track_tokens
        new_track = tokens[:, :k]
        xs = tokens[:, k + zt.shape[1]:]
        gs = cfg.grid_s
        fmap = xs.transpose(1, 2).reshape(-1, cfg.hidden_size, gs, gs)
        score = self.score_head(fmap)[:, 0]
        offset = torch.sigmoid(self.offset_head(fmap))
        size = torch.sigmoid(self.size_head(fmap))
        flat = score.reshape(score.shape[0], -1)
        idx = flat.argmax(-1)
        iy, ix = idx // gs, idx % gs
        bi = torch.arange(score.shape[0])
        off = offset[bi, :, iy, ix]
        sz = size[bi, :, iy, ix]
        cx = (ix.float() + off[:, 0]) / gs
        cy = (iy.float() + off[:, 1]) / gs
        box = torch.stack([cx, cy, sz[:, 0], sz[:, 1]], -1)
        return box, score, new_track


def test_forward_matches_torch_mirror():
    torch.manual_seed(0)
    tm = _TorchTracker(CFG).eval()
    params = vt.import_torch_tracker(tm.state_dict(), CFG)
    g = torch.Generator().manual_seed(1)
    template = torch.randn(2, 3, 32, 32, generator=g)
    search = torch.randn(2, 3, 64, 64, generator=g)
    tok = tm.track_token.expand(2, -1, -1)
    with torch.no_grad():
        ref_box, ref_score, ref_tok = tm(template, search, tok)
    box, score, new_tok = vt.tracker_forward(
        params, jnp.asarray(template.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(search.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(tok.detach().numpy()), CFG)
    np.testing.assert_allclose(np.asarray(score), ref_score.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(new_tok), ref_tok.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(box), ref_box.numpy(), atol=2e-5)


def test_track_token_propagation_changes_output():
    """ODTrack semantics: the propagated token must influence the next
    frame's prediction (temporal context actually flows)."""
    params = vt.init_tracker_params(0, CFG)
    rng = np.random.default_rng(0)
    template = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    search = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    tok0 = jnp.asarray(params["track_token"])
    _, score_a, tok1 = vt.tracker_forward(params, template, search, tok0,
                                          CFG)
    assert not np.allclose(np.asarray(tok1), np.asarray(tok0))
    _, score_b, _ = vt.tracker_forward(params, template, search,
                                       tok1 * 5.0, CFG)
    assert not np.allclose(np.asarray(score_a), np.asarray(score_b))


def test_backend_contract_through_track_masks():
    from monosowa_tpu.sowa.tracker2d import (FlaxViTTrackerBackend,
                                             track_masks)

    params = vt.init_tracker_params(1, CFG)
    rng = np.random.default_rng(2)
    frames = [rng.integers(0, 255, (80, 120, 3), dtype=np.uint8)
              for _ in range(3)]
    init_boxes = [np.array([30.0, 20.0, 60.0, 50.0]),
                  np.array([10.0, 40.0, 34.0, 64.0])]
    mask_boxes = [[np.array([28.0, 18.0, 62.0, 52.0])]] * 3

    def factory():
        return FlaxViTTrackerBackend(params, CFG)

    tracks = track_masks(frames, init_boxes, mask_boxes,
                         tracker_factory=factory)
    assert len(tracks) == 2
    for t in tracks:
        assert len(t.boxes) == 3
        for b in t.boxes:
            assert np.all(np.isfinite(b))
        # box sizes stay positive and bounded by the search region
        for b in t.boxes[1:]:
            assert b[2] > b[0] and b[3] > b[1]
