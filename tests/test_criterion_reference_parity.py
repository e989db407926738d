"""Differential parity: the full loss dict vs the reference's own
SetCriterion (monodetr.py:302-1232) running on CPU.

Loads the reference monodetr.py with its heavy imports stubbed (open3d,
backbone/transformer/depth-predictor modules it doesn't need for the
criterion; the real matcher and the real ddn_loss subpackage ARE loaded),
neutralizes its hard-coded `.cuda()` calls, and compares every loss term —
focal classification, 3D center / 2D lrtb L1, GIoU, Laplacian depth,
dim-aware L1 with the stop-gradient compensation weight, 12-bin heading
CE + residual, and the DDN depth-map loss (box painting with
nearest-box-wins, LID binning, focal CE, 13:1 fg/bg balancing) — plus the
group-matched aux-layer losses and num_boxes normalization.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_MONODETR = "/root/reference/MonoDETR/lib/models/monodetr"
REF_ROOT = "/root/reference/MonoDETR"

B, G, Q, C, MMAX = 2, 3, 7, 3, 4
N_TGTS = [2, 4]
DH, DW, NBINS = 24, 80, 80     # loss_depth_map hardcodes the 80x24 grid


def _stub_torchvision():
    import torchvision_stub
    torchvision_stub.install()


def _neutralize_cuda():
    """The reference hardcodes cuda in loss_angles/loss_depth_map/DDNLoss;
    reroute to CPU for this process."""
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.current_device = lambda: "cpu"
    if not getattr(torch, "_monosowa_tensor_patched", False):
        orig = torch.tensor

        def tensor_cpu(*a, **k):
            if k.get("device") == "cuda":
                k = dict(k, device="cpu")
            return orig(*a, **k)

        torch.tensor = tensor_cpu
        torch._monosowa_tensor_patched = True


def _load_reference_criterion():
    if "refsc.monodetr" in sys.modules:
        return sys.modules["refsc.monodetr"]
    _stub_torchvision()
    _neutralize_cuda()
    sys.modules.setdefault("open3d", types.ModuleType("open3d"))

    pkg = types.ModuleType("refsc")
    pkg.__path__ = [REF_MONODETR]
    sys.modules["refsc"] = pkg

    # real matcher
    spec = importlib.util.spec_from_file_location(
        "refsc.matcher", f"{REF_MONODETR}/matcher.py")
    matcher_mod = importlib.util.module_from_spec(spec)
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    try:
        sys.modules["refsc.matcher"] = matcher_mod
        spec.loader.exec_module(matcher_mod)

        # real ddn_loss subpackage, mounted under a FAKE depth_predictor
        dp = types.ModuleType("refsc.depth_predictor")
        dp.__path__ = []
        dp.DepthPredictor = type("DepthPredictor", (), {})
        sys.modules["refsc.depth_predictor"] = dp
        ddn_dir = f"{REF_MONODETR}/depth_predictor/ddn_loss"
        spec = importlib.util.spec_from_file_location(
            "refsc.depth_predictor.ddn_loss", f"{ddn_dir}/__init__.py",
            submodule_search_locations=[ddn_dir])
        ddn = importlib.util.module_from_spec(spec)
        sys.modules["refsc.depth_predictor.ddn_loss"] = ddn
        spec.loader.exec_module(ddn)
        dp.ddn_loss = ddn

        # fake the model-building imports the criterion never touches
        for name, attrs in (("backbone", ["build_backbone"]),
                            ("depthaware_transformer",
                             ["build_depthaware_transformer"]),
                            ("dn_components",
                             ["prepare_for_dn", "dn_post_process",
                              "compute_dn_loss"])):
            m = types.ModuleType(f"refsc.{name}")
            for a in attrs:
                setattr(m, a, lambda *ar, **kw: None)
            sys.modules[f"refsc.{name}"] = m

        spec = importlib.util.spec_from_file_location(
            "refsc.monodetr", f"{REF_MONODETR}/monodetr.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules["refsc.monodetr"] = mod
        spec.loader.exec_module(mod)
    finally:
        if REF_ROOT in sys.path:
            sys.path.remove(REF_ROOT)
    return mod


def _make_inputs(seed=0, n_aux=2):
    rng = np.random.default_rng(seed)

    def head(last):
        return {
            "pred_logits": rng.normal(size=(B, G * Q, C)).astype(np.float32),
            "pred_boxes": rng.uniform(
                0.05, 0.45, (B, G * Q, 6)).astype(np.float32),
            "pred_depth": np.concatenate(
                [rng.uniform(5, 50, (B, G * Q, 1)),
                 rng.normal(size=(B, G * Q, 1)) * 0.3],
                -1).astype(np.float32),
            "pred_3d_dim": rng.uniform(0.5, 2.0,
                                       (B, G * Q, 3)).astype(np.float32),
            "pred_angle": rng.normal(size=(B, G * Q, 24)).astype(np.float32),
        }

    outputs = head(True)
    outputs["pred_boxes"][..., :2] = rng.uniform(0.3, 0.7, (B, G * Q, 2))
    outputs["pred_depth_map_logits"] = rng.normal(
        size=(B, NBINS + 1, DH, DW)).astype(np.float32)
    outputs["aux_outputs"] = []
    for _ in range(n_aux):
        aux = head(False)
        aux["pred_boxes"][..., :2] = rng.uniform(0.3, 0.7, (B, G * Q, 2))
        outputs["aux_outputs"].append(aux)

    targets = []
    for n in N_TGTS:
        bx3 = rng.uniform(0.05, 0.4, (n, 6)).astype(np.float32)
        bx3[:, :2] = rng.uniform(0.3, 0.7, (n, 2))
        targets.append({
            "labels": rng.integers(0, C, n),
            "boxes": rng.uniform(0.2, 0.6, (n, 4)).astype(np.float32),
            "boxes_3d": bx3,
            "depth": rng.uniform(5, 55, (n, 1)).astype(np.float32),
            "size_3d": rng.uniform(0.4, 2.5, (n, 3)).astype(np.float32),
            "heading_bin": rng.integers(0, 12, (n, 1)),
            "heading_res": rng.uniform(-0.2, 0.2, (n, 1)).astype(np.float32),
        })
    return outputs, targets


def test_criterion_matches_reference():
    import jax.numpy as jnp

    from monosowa_tpu.models.criterion import (CriterionConfig, Targets,
                                               criterion)

    ref = _load_reference_criterion()
    matcher = sys.modules["refsc.matcher"].HungarianMatcher(
        cost_class=2, cost_3dcenter=10, cost_bbox=5, cost_giou=2)
    crit = ref.SetCriterion(
        num_classes=C, matcher=matcher, weight_dict={}, focal_alpha=0.25,
        losses=["labels", "boxes", "depths", "dims", "angles", "center",
                "depth_map"],
        group_num=G)
    crit.train()     # group matching + num_boxes * group_num

    outputs, targets = _make_inputs()
    t_out = {k: (torch.from_numpy(v) if isinstance(v, np.ndarray)
                 else [{kk: torch.from_numpy(vv) for kk, vv in a.items()}
                       for a in v])
             for k, v in outputs.items()}
    t_out["aux_outputs"] = [
        {kk: torch.from_numpy(vv) for kk, vv in a.items()}
        for a in outputs["aux_outputs"]]
    t_tgts = [{k: torch.from_numpy(np.asarray(v)) for k, v in t.items()}
              for t in targets]
    with torch.no_grad():
        ref_losses = crit(t_out, t_tgts)

    tgt_labels = np.zeros((B, MMAX), np.int32)
    tgt_boxes3 = np.zeros((B, MMAX, 6), np.float32)
    tgt_boxes2 = np.zeros((B, MMAX, 4), np.float32)
    tgt_depth = np.zeros((B, MMAX), np.float32)
    tgt_size = np.ones((B, MMAX, 3), np.float32)
    tgt_hbin = np.zeros((B, MMAX), np.int32)
    tgt_hres = np.zeros((B, MMAX), np.float32)
    tgt_valid = np.zeros((B, MMAX), bool)
    for i, t in enumerate(targets):
        n = len(t["labels"])
        tgt_labels[i, :n] = t["labels"]
        tgt_boxes3[i, :n] = t["boxes_3d"]
        tgt_boxes2[i, :n] = t["boxes"]
        tgt_depth[i, :n] = t["depth"][:, 0]
        tgt_size[i, :n] = t["size_3d"]
        tgt_hbin[i, :n] = t["heading_bin"][:, 0]
        tgt_hres[i, :n] = t["heading_res"][:, 0]
        tgt_valid[i, :n] = True

    j_tgts = Targets(labels=jnp.asarray(tgt_labels),
                     boxes_3d=jnp.asarray(tgt_boxes3),
                     boxes_2d=jnp.asarray(tgt_boxes2),
                     depth=jnp.asarray(tgt_depth),
                     size_3d=jnp.asarray(tgt_size),
                     heading_bin=jnp.asarray(tgt_hbin),
                     heading_res=jnp.asarray(tgt_hres),
                     valid=jnp.asarray(tgt_valid))
    j_out = {k: jnp.asarray(v) for k, v in outputs.items()
             if k != "aux_outputs"}
    # our depth-map logits are NHWC
    j_out["pred_depth_map_logits"] = jnp.transpose(
        j_out["pred_depth_map_logits"], (0, 2, 3, 1))
    j_out["aux_outputs"] = [{k: jnp.asarray(v) for k, v in a.items()}
                            for a in outputs["aux_outputs"]]
    cfg = CriterionConfig(num_classes=C, group_num=G, num_queries=Q,
                          num_depth_bins=NBINS)
    ours = criterion(j_out, j_tgts, cfg, training=True)

    for name in ("loss_ce", "loss_center", "loss_bbox", "loss_giou",
                 "loss_depth", "loss_dim", "loss_angle", "loss_depth_map"):
        np.testing.assert_allclose(
            float(ours[name]), float(ref_losses[name]),
            atol=2e-4, rtol=2e-4, err_msg=name)
    for i in range(2):
        for name in ("loss_ce", "loss_center", "loss_bbox", "loss_giou",
                     "loss_depth", "loss_dim", "loss_angle"):
            np.testing.assert_allclose(
                float(ours[f"{name}_{i}"]), float(ref_losses[f"{name}_{i}"]),
                atol=2e-4, rtol=2e-4, err_msg=f"{name}_{i}")
