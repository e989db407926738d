"""Differential parity: encoder/decoder transformer layers vs the
reference's own torch modules.

Loads the reference `depthaware_transformer.py` (and its ops package) with
the CUDA extension stubbed to the pure-pytorch oracle
`ms_deform_attn_core_pytorch`, copies the randomly initialized torch
weights into the Flax layers, and asserts output agreement in eval mode.
This pins, against running reference code:

* MSDeformAttn module wiring (value/offsets/weights projections, softmax
  over levels*points, offset normalization, the 6-dof reference-point
  branch: loc = ref_xy + offsets/P * (l+r, t+b)/2) — depthaware layers use
  it for encoder self-attention and decoder cross-attention;
* VisualEncoderLayer post-norm order + the encoder's pixel-center
  reference points (get_reference_points with valid_ratios == 1);
* DepthAwareDecoderLayer: depth cross-attention -> content+pos projected
  self-attention (incl. the reference's dead sa_v_proj: value is raw tgt)
  -> deformable cross-attention -> FFN, each with its residual + LayerNorm.

Reference: lib/models/monodetr/depthaware_transformer.py:315-517,
lib/models/monodetr/ops/modules/ms_deform_attn.py:122-164.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_MONODETR = "/root/reference/MonoDETR/lib/models/monodetr"
REF_ROOT = "/root/reference/MonoDETR"


def _stub_torchvision():
    import torchvision_stub
    torchvision_stub.install()


def _load_reference_transformer():
    """Returns the loaded depthaware_transformer module (cached)."""
    if "reftr.depthaware_transformer" in sys.modules:
        return sys.modules["reftr.depthaware_transformer"]
    _stub_torchvision()
    # the reference's torch-version check has a precedence bug
    # ((major==1 and minor) < 9 is True for torch 2.x) and lands on the
    # removed _LinearWithBias name — alias it to the modern equivalent
    import torch.nn.modules.linear as _tl
    if not hasattr(_tl, "_LinearWithBias"):
        _tl._LinearWithBias = _tl.NonDynamicallyQuantizableLinear
    if "torch._overrides" not in sys.modules:   # renamed to torch.overrides
        import torch.overrides as _tov
        sys.modules["torch._overrides"] = _tov
    # the compiled CUDA extension the functions module imports; its
    # forward is rebound to the pure-pytorch oracle after load
    msda_stub = types.ModuleType("MultiScaleDeformableAttention")
    sys.modules["MultiScaleDeformableAttention"] = msda_stub

    pkg = types.ModuleType("reftr")
    pkg.__path__ = [REF_MONODETR]
    sys.modules["reftr"] = pkg
    ops_pkg = types.ModuleType("reftr.ops")   # no __init__.py upstream
    ops_pkg.__path__ = [f"{REF_MONODETR}/ops"]
    sys.modules["reftr.ops"] = ops_pkg
    for sub, path in (("ops.functions", f"{REF_MONODETR}/ops/functions"),
                      ("ops.modules", f"{REF_MONODETR}/ops/modules")):
        spec = importlib.util.spec_from_file_location(
            f"reftr.{sub}", f"{path}/__init__.py",
            submodule_search_locations=[path])
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"reftr.{sub}"] = mod
        spec.loader.exec_module(mod)

    func_mod = sys.modules["reftr.ops.functions.ms_deform_attn_func"]

    def fwd(value, shapes, lsi, loc, weights, step):
        hw = [(int(h), int(w)) for h, w in shapes.tolist()]
        return func_mod.ms_deform_attn_core_pytorch(value, hw, loc, weights)

    msda_stub.ms_deform_attn_forward = fwd

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)   # for `from utils.misc import ...`
    try:
        spec = importlib.util.spec_from_file_location(
            "reftr.depthaware_transformer",
            f"{REF_MONODETR}/depthaware_transformer.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules["reftr.depthaware_transformer"] = mod
        spec.loader.exec_module(mod)
    finally:
        if REF_ROOT in sys.path:
            sys.path.remove(REF_ROOT)
    return mod


D, FFN, HEADS, LEVELS, POINTS = 64, 96, 8, 2, 4
SHAPES = ((8, 12), (4, 6))
T = sum(h * w for h, w in SHAPES)


def _dense(p, dst, tname, sd):
    dst[p]["kernel"] = sd[f"{tname}.weight"].numpy().T
    dst[p]["bias"] = sd[f"{tname}.bias"].numpy()


def _map_msda(dst, pre, sd):
    for n in ("sampling_offsets", "attention_weights", "value_proj",
              "output_proj"):
        dst[n]["kernel"] = sd[f"{pre}.{n}.weight"].numpy().T
        dst[n]["bias"] = sd[f"{pre}.{n}.bias"].numpy()


def _map_torch_mha(dst, pre, sd):
    inw = sd[f"{pre}.in_proj_weight"].numpy()
    inb = sd[f"{pre}.in_proj_bias"].numpy()
    for i, n in enumerate(("q_proj", "k_proj", "v_proj")):
        dst[n]["kernel"] = inw[i * D:(i + 1) * D].T
        dst[n]["bias"] = inb[i * D:(i + 1) * D]
    dst["out_proj"]["kernel"] = sd[f"{pre}.out_proj.weight"].numpy().T
    dst["out_proj"]["bias"] = sd[f"{pre}.out_proj.bias"].numpy()


def _norm(dst, name, tname, sd):
    dst[name]["scale"] = sd[f"{tname}.weight"].numpy()
    dst[name]["bias"] = sd[f"{tname}.bias"].numpy()


def test_encoder_layer_matches_reference():
    import jax
    import jax.numpy as jnp

    from monosowa_tpu.models.transformer import (VisualEncoderLayer,
                                                 encoder_reference_points)

    ref = _load_reference_transformer()
    torch.manual_seed(0)
    tm = ref.VisualEncoderLayer(d_model=D, d_ffn=FFN, dropout=0.1,
                                n_levels=LEVELS, n_heads=HEADS,
                                n_points=POINTS)
    tm.eval()
    sd = tm.state_dict()

    rng = np.random.default_rng(1)
    b = 2
    src = rng.normal(size=(b, T, D)).astype(np.float32)
    pos = rng.normal(size=(b, T, D)).astype(np.float32) * 0.2

    shapes_t = torch.as_tensor(SHAPES, dtype=torch.long)
    lsi = torch.as_tensor([0, SHAPES[0][0] * SHAPES[0][1]], dtype=torch.long)
    valid = torch.ones((b, LEVELS, 2))
    ref_pts_t = ref.VisualEncoder.get_reference_points(
        shapes_t, valid, torch.device("cpu"))
    with torch.no_grad():
        t_out = tm(torch.from_numpy(src), torch.from_numpy(pos), ref_pts_t,
                   shapes_t, lsi)

    # the module's reference points must equal the reference's
    ours_ref = encoder_reference_points(SHAPES)
    np.testing.assert_allclose(np.tile(ours_ref[None], (b, 1, 1, 1)),
                               ref_pts_t.numpy(), atol=1e-6)

    layer = VisualEncoderLayer(d_model=D, d_ffn=FFN, n_levels=LEVELS,
                               n_heads=HEADS, n_points=POINTS,
                               msda_backend="xla")
    args = (jnp.asarray(src), jnp.asarray(pos), jnp.asarray(ours_ref)[None],
            SHAPES)
    params = jax.tree.map(np.asarray,
                          layer.init(jax.random.PRNGKey(0), *args)["params"])
    _map_msda(params["self_attn"], "self_attn", sd)
    _dense("Dense_0", params, "linear1", sd)
    _dense("Dense_1", params, "linear2", sd)
    _norm(params, "norm1", "norm1", sd)
    _norm(params, "norm2", "norm2", sd)

    j_out = layer.apply({"params": params}, *args)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               atol=2e-4, rtol=1e-4)


def test_decoder_layer_matches_reference():
    import jax
    import jax.numpy as jnp

    from monosowa_tpu.models.transformer import DepthAwareDecoderLayer

    ref = _load_reference_transformer()
    torch.manual_seed(2)
    tm = ref.DepthAwareDecoderLayer(d_model=D, d_ffn=FFN, dropout=0.1,
                                    n_levels=LEVELS, n_heads=HEADS,
                                    n_points=POINTS, group_num=2)
    tm.eval()          # reference group folding only happens in training
    sd = tm.state_dict()

    rng = np.random.default_rng(3)
    b, q = 2, 22
    tgt = rng.normal(size=(b, q, D)).astype(np.float32)
    qpos = rng.normal(size=(b, q, D)).astype(np.float32) * 0.2
    src = rng.normal(size=(b, T, D)).astype(np.float32)
    dembed = rng.normal(size=(b, T, D)).astype(np.float32)
    # 6-dof cxcylrtb reference points in [0, 1] (the shipped two_stage=False
    # decoder path feeds these after sigmoid)
    refp = rng.uniform(0.2, 0.8, size=(b, q, 1, 6)).astype(np.float32)
    refp = np.tile(refp, (1, 1, LEVELS, 1))

    shapes_t = torch.as_tensor(SHAPES, dtype=torch.long)
    lsi = torch.as_tensor([0, SHAPES[0][0] * SHAPES[0][1]], dtype=torch.long)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(tgt), torch.from_numpy(qpos),
                   torch.from_numpy(refp), torch.from_numpy(src), shapes_t,
                   lsi, None,
                   torch.from_numpy(dembed).transpose(0, 1), None, b)

    layer = DepthAwareDecoderLayer(d_model=D, d_ffn=FFN, n_levels=LEVELS,
                                   n_heads=HEADS, n_points=POINTS,
                                   group_num=2, msda_backend="xla")
    args = (jnp.asarray(tgt), jnp.asarray(qpos), jnp.asarray(refp),
            jnp.asarray(src), SHAPES, jnp.asarray(dembed))
    params = jax.tree.map(np.asarray,
                          layer.init(jax.random.PRNGKey(0), *args,
                                     training=False)["params"])
    _map_torch_mha(params["cross_attn_depth"], "cross_attn_depth", sd)
    _map_torch_mha(params["self_attn"], "self_attn", sd)
    _map_msda(params["cross_attn"], "cross_attn", sd)
    for n in ("sa_qcontent_proj", "sa_qpos_proj", "sa_kcontent_proj",
              "sa_kpos_proj"):
        _dense(n, params, n, sd)       # sa_v_proj is dead in the reference
    _dense("linear1", params, "linear1", sd)
    _dense("linear2", params, "linear2", sd)
    for n in ("norm_depth", "norm1", "norm2", "norm3"):
        _norm(params, n, n, sd)

    j_out = layer.apply({"params": params}, *args, training=False)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               atol=3e-4, rtol=1e-4)
