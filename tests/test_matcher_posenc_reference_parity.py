"""Differential parity vs the reference's own torch code for the
Hungarian matcher (incl. Group-DETR group splitting) and both positional
embeddings.

References: MonoDETR/lib/models/monodetr/matcher.py:14-112,
position_encoding.py:20-99, utils/box_ops.py.
"""

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_MONODETR = "/root/reference/MonoDETR/lib/models/monodetr"
REF_ROOT = "/root/reference/MonoDETR"


def _stub_torchvision():
    import torchvision_stub
    torchvision_stub.install()


def _load(name):
    key = f"refmp.{name}"
    if key in sys.modules:
        return sys.modules[key]
    _stub_torchvision()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    try:
        spec = importlib.util.spec_from_file_location(
            key, f"{REF_MONODETR}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[key] = mod
        spec.loader.exec_module(mod)
    finally:
        if REF_ROOT in sys.path:
            sys.path.remove(REF_ROOT)
    return mod


def test_matcher_matches_reference():
    import jax.numpy as jnp

    from monosowa_tpu.models.matcher import (MatcherConfig, _cost_matrix,
                                             hungarian_match)

    ref = _load("matcher")
    tm = ref.HungarianMatcher(cost_class=2, cost_3dcenter=10, cost_bbox=5,
                              cost_giou=2)

    rng = np.random.default_rng(0)
    b, g, q, c, m_max = 2, 3, 7, 3, 4
    n_tgts = [2, 4]
    logits = rng.normal(size=(b, g * q, c)).astype(np.float32)
    # cxcylrtb in [0,1] with positive extents
    boxes = rng.uniform(0.05, 0.45, size=(b, g * q, 6)).astype(np.float32)
    boxes[..., :2] = rng.uniform(0.3, 0.7, size=(b, g * q, 2))

    targets = []
    tgt_labels = np.zeros((b, m_max), np.int32)
    tgt_boxes = np.zeros((b, m_max, 6), np.float32)
    tgt_valid = np.zeros((b, m_max), bool)
    for i, n in enumerate(n_tgts):
        lab = rng.integers(0, c, n)
        bx = rng.uniform(0.05, 0.45, size=(n, 6)).astype(np.float32)
        bx[:, :2] = rng.uniform(0.3, 0.7, size=(n, 2))
        targets.append({
            "labels": torch.as_tensor(lab),
            "boxes": torch.zeros((n, 4)),
            "boxes_3d": torch.from_numpy(bx),
        })
        tgt_labels[i, :n] = lab
        tgt_boxes[i, :n] = bx
        tgt_valid[i, :n] = True

    with torch.no_grad():
        ref_idx = tm({"pred_logits": torch.from_numpy(logits),
                      "pred_boxes": torch.from_numpy(boxes)},
                     targets, group_num=g)

    # cost-matrix parity (image 0, its n_tgts[0] real targets)
    ours_cost = np.asarray(_cost_matrix(
        jnp.asarray(logits[0]), jnp.asarray(boxes[0]),
        jnp.asarray(tgt_labels[0]), jnp.asarray(tgt_boxes[0]),
        jnp.asarray(tgt_valid[0]), MatcherConfig()))
    out_prob = torch.from_numpy(logits[0]).sigmoid()
    tgt_ids = targets[0]["labels"].long()
    alpha, gamma = 0.25, 2.0
    neg = (1 - alpha) * out_prob ** gamma * (-(1 - out_prob + 1e-8).log())
    pos = alpha * (1 - out_prob) ** gamma * (-(out_prob + 1e-8).log())
    cost_class = (pos[:, tgt_ids] - neg[:, tgt_ids]).numpy()
    ob = torch.from_numpy(boxes[0])
    tb = targets[0]["boxes_3d"]
    c3d = torch.cdist(ob[:, :2], tb[:, :2], p=1).numpy()
    c2d = torch.cdist(ob[:, 2:6], tb[:, 2:6], p=1).numpy()
    giou = ref.generalized_box_iou(ref.box_cxcylrtb_to_xyxy(ob),
                                   ref.box_cxcylrtb_to_xyxy(tb)).numpy()
    ref_cost = 5 * c2d + 10 * c3d + 2 * cost_class + 2 * (-giou)
    np.testing.assert_allclose(ours_cost[:, :n_tgts[0]], ref_cost,
                               atol=1e-4, rtol=1e-4)

    for backend in ("host", "jv"):
        ours = np.asarray(hungarian_match(
            jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(tgt_labels),
            jnp.asarray(tgt_boxes), jnp.asarray(tgt_valid),
            MatcherConfig(backend=backend), group_num=g, num_queries=q))
        for i in range(b):
            ref_pairs = set(zip(ref_idx[i][0].numpy().tolist(),
                                ref_idx[i][1].numpy().tolist()))
            our_pairs = {(qi, int(t)) for qi, t in enumerate(ours[i])
                         if t >= 0}
            assert our_pairs == ref_pairs, (backend, i, our_pairs, ref_pairs)


def test_sine_position_encoding_matches_reference():
    from monosowa_tpu.models.position_encoding import sine_position_encoding

    ref = _load("position_encoding")
    misc = sys.modules["utils.misc"]
    h, w, feats = 13, 21, 32
    pe = ref.PositionEmbeddingSine(feats, normalize=True)
    x = torch.zeros((2, 8, h, w))
    mask = torch.zeros((2, h, w), dtype=torch.bool)
    with torch.no_grad():
        t_pos = pe(misc.NestedTensor(x, mask)).numpy()   # (B, 2F, H, W)
    ours = sine_position_encoding(h, w, num_pos_feats=feats)
    np.testing.assert_allclose(np.transpose(ours, (2, 0, 1)), t_pos[0],
                               atol=1e-5, rtol=1e-5)


def test_learned_position_encoding_matches_reference():
    import jax

    from monosowa_tpu.models.position_encoding import LearnedPositionEmbedding

    ref = _load("position_encoding")
    misc = sys.modules["utils.misc"]
    torch.manual_seed(0)
    feats = 16
    pe = ref.PositionEmbeddingLearned(feats)
    pe.eval()
    h, w = 9, 14
    x = torch.zeros((1, 8, h, w))
    mask = torch.zeros((1, h, w), dtype=torch.bool)
    with torch.no_grad():
        t_pos = pe(misc.NestedTensor(x, mask)).numpy()   # (1, 2F, H, W)

    model = LearnedPositionEmbedding(num_pos_feats=feats)
    params = jax.tree.map(
        np.asarray, model.init(jax.random.PRNGKey(0), h, w)["params"])
    params["row_embed"]["embedding"] = pe.row_embed.weight.detach().numpy()
    params["col_embed"]["embedding"] = pe.col_embed.weight.detach().numpy()
    ours = np.asarray(model.apply({"params": params}, h, w))  # (H, W, 2F)
    np.testing.assert_allclose(np.transpose(ours, (2, 0, 1)), t_pos[0],
                               atol=1e-5, rtol=1e-5)
