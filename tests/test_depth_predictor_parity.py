"""Differential parity: DepthPredictor vs the reference's own torch module.

Loads the reference implementation
(MonoDETR/lib/models/monodetr/depth_predictor/depth_predictor.py) directly
(torch CPU; the subpackage has no CUDA dependency), copies its randomly
initialized weights into the Flax module, and asserts all four outputs
(depth_logits, depth_embed, weighted_depth, depth_pos_embed_ip) agree on a
shared random input.  This pins the LID bin values, the 3-scale fusion
(incl. F.interpolate bilinear semantics), the conv/GroupNorm head, the
post-norm depth encoder layer, and the 1D-interpolated learned depth
positional embedding.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_DP = "/root/reference/MonoDETR/lib/models/monodetr/depth_predictor"
D_MODEL = 256        # the reference hardcodes Embedding(depth_max+1, 256)
NUM_BINS = 16
H16, W16 = 12, 20


def _load_reference_depth_predictor():
    pkg = types.ModuleType("refdp")
    pkg.__path__ = [REF_DP]
    sys.modules["refdp"] = pkg
    for name in ("transformer", "depth_predictor"):
        spec = importlib.util.spec_from_file_location(
            f"refdp.{name}", f"{REF_DP}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refdp.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["refdp.depth_predictor"].DepthPredictor


def _conv_kernel(w):
    # torch (O, I, kh, kw) -> flax (kh, kw, I, O)
    return np.transpose(w.detach().numpy(), (2, 3, 1, 0))


def _dense(w):
    return w.detach().numpy().T


def _map_params(tm, params):
    """Copy the torch module's weights into the flax param tree (in place)."""
    sd = {k: v for k, v in tm.state_dict().items()}
    p = params

    def put(dst, key, val):
        assert dst[key].shape == val.shape, (key, dst[key].shape, val.shape)
        dst[key] = val

    for tname, fname in (("proj", "proj"), ("upsample", "upsample"),
                         ("downsample", "downsample")):
        put(p[fname], "kernel", _conv_kernel(sd[f"{tname}.0.weight"]))
        put(p[fname], "bias", sd[f"{tname}.0.bias"].numpy())
    # GroupNorms in flax call order: proj, upsample, downsample, head1, head2
    for i, tname in enumerate(("proj.1", "upsample.1", "downsample.1",
                               "depth_head.1", "depth_head.4")):
        put(p[f"GroupNorm_{i}"], "scale", sd[f"{tname}.weight"].numpy())
        put(p[f"GroupNorm_{i}"], "bias", sd[f"{tname}.bias"].numpy())
    put(p["head1"], "kernel", _conv_kernel(sd["depth_head.0.weight"]))
    put(p["head1"], "bias", sd["depth_head.0.bias"].numpy())
    put(p["head2"], "kernel", _conv_kernel(sd["depth_head.3.weight"]))
    put(p["head2"], "bias", sd["depth_head.3.bias"].numpy())
    put(p["classifier"], "kernel", _conv_kernel(sd["depth_classifier.weight"]))
    put(p["classifier"], "bias", sd["depth_classifier.bias"].numpy())

    enc = p["encoder"]
    pre = "depth_encoder.layers.0."
    inw = sd[pre + "self_attn.in_proj_weight"].numpy()
    inb = sd[pre + "self_attn.in_proj_bias"].numpy()
    d = D_MODEL
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        put(enc["self_attn"][name], "kernel", inw[i * d:(i + 1) * d].T)
        put(enc["self_attn"][name], "bias", inb[i * d:(i + 1) * d])
    put(enc["self_attn"]["out_proj"], "kernel",
        _dense(sd[pre + "self_attn.out_proj.weight"]))
    put(enc["self_attn"]["out_proj"], "bias",
        sd[pre + "self_attn.out_proj.bias"].numpy())
    put(enc["Dense_0"], "kernel", _dense(sd[pre + "linear1.weight"]))
    put(enc["Dense_0"], "bias", sd[pre + "linear1.bias"].numpy())
    put(enc["Dense_1"], "kernel", _dense(sd[pre + "linear2.weight"]))
    put(enc["Dense_1"], "bias", sd[pre + "linear2.bias"].numpy())
    for n in ("norm1", "norm2"):
        put(enc[n], "scale", sd[pre + n + ".weight"].numpy())
        put(enc[n], "bias", sd[pre + n + ".bias"].numpy())

    put(p, "depth_pos_embed", sd["depth_pos_embed.weight"].numpy())
    return params


def test_depth_predictor_matches_reference():
    import jax
    import jax.numpy as jnp

    from monosowa_tpu.models.depth_predictor import DepthPredictor

    RefDP = _load_reference_depth_predictor()
    torch.manual_seed(0)
    tm = RefDP({"num_depth_bins": NUM_BINS, "depth_min": 1e-3,
                "depth_max": 60.0, "hidden_dim": D_MODEL})
    tm.eval()

    rng = np.random.default_rng(0)
    b = 2
    f8 = rng.normal(size=(b, D_MODEL, H16 * 2, W16 * 2)).astype(np.float32)
    f16 = rng.normal(size=(b, D_MODEL, H16, W16)).astype(np.float32)
    f32 = rng.normal(size=(b, D_MODEL, H16 // 2, W16 // 2)).astype(np.float32)
    f64 = rng.normal(size=(b, D_MODEL, H16 // 4, W16 // 4)).astype(np.float32)
    # one positional embedding shared across the batch (the flax module
    # takes an unbatched (H, W, D) pos; tile it for the torch call)
    pos1 = rng.normal(size=(1, D_MODEL, H16, W16)).astype(np.float32) * 0.1
    pos = np.tile(pos1, (b, 1, 1, 1))
    mask = torch.zeros((b, H16, W16), dtype=torch.bool)

    with torch.no_grad():
        t_logits, t_embed, t_wd, t_ip = tm(
            [torch.from_numpy(f) for f in (f8, f16, f32, f64)],
            mask, torch.from_numpy(pos))

    model = DepthPredictor(d_model=D_MODEL, num_depth_bins=NUM_BINS,
                           depth_min=1e-3, depth_max=60.0)
    feats = [jnp.asarray(np.transpose(f, (0, 2, 3, 1)))
             for f in (f8, f16, f32)]
    # the reference broadcasts ONE pos over the batch inside the encoder;
    # our module takes (H, W, D) and does the same — but the torch call
    # gets a per-batch pos, so feed batch element 0's pos to both
    pos_hw = jnp.asarray(np.transpose(pos[0], (1, 2, 0)))
    variables = model.init(jax.random.PRNGKey(0), feats, pos_hw)
    params = jax.tree.map(np.asarray, variables["params"])
    params = _map_params(tm, params)
    j_logits, j_embed, j_wd, j_ip = model.apply(
        {"params": params}, feats, pos_hw)

    def nchw(x):
        return np.transpose(np.asarray(x), (0, 3, 1, 2))

    np.testing.assert_allclose(nchw(j_logits), t_logits.numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_wd), t_wd.numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(nchw(j_ip), t_ip.numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(nchw(j_embed), t_embed.numpy(),
                               atol=5e-4, rtol=1e-4)


def test_lid_bin_values_match_reference_formula():
    from monosowa_tpu.models.depth_predictor import lid_bin_values

    num_bins, dmin, dmax = 80, 1e-3, 60.0
    bin_size = 2 * (dmax - dmin) / (num_bins * (1 + num_bins))
    ind = torch.linspace(0, num_bins - 1, num_bins)
    ref = torch.cat([(ind + 0.5).pow(2) * bin_size / 2 - bin_size / 8 + dmin,
                     torch.tensor([dmax])])
    np.testing.assert_allclose(lid_bin_values(num_bins, dmin, dmax),
                               ref.numpy(), rtol=1e-6)
