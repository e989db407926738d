"""Torch-weights importer test (load_torch_resnet_state).

torchvision is not in this image, but torch is: synthesize a state dict
with the exact torchvision resnet50 key layout and shapes, import it, and
check (a) numerical equivalence of the imported stem + first bottleneck
against an independent torch.nn.functional forward of the same weights
(frozen-BN eval semantics, reference backbone.py:28-65), and (b) a full
backbone forward runs finite with the imported tree.  Also covers the
4-channel RGB-D stem rule: conv1 stays the fresh xavier kernel
(backbone.py:109-111 replaces conv1 AFTER the pretrained load).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from monosowa_tpu.models.backbone import (ResNet50,
                                          load_torch_resnet_state)

STAGES = ((64, 64, 256), (256, 128, 512), (512, 256, 1024), (1024, 512, 2048))
BLOCKS = (3, 4, 6, 3)


def synth_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {"conv1.weight": t(64, 3, 7, 7),
          "bn1.weight": t(64) + 1.0, "bn1.bias": t(64),
          "bn1.running_mean": t(64),
          "bn1.running_var": torch.rand(64, generator=g) + 0.5}
    for s, ((cin0, mid, out), blocks) in enumerate(zip(STAGES, BLOCKS)):
        for b in range(blocks):
            cin = cin0 if b == 0 else out
            pre = f"layer{s + 1}.{b}"
            sd[pre + ".conv1.weight"] = t(mid, cin, 1, 1)
            sd[pre + ".conv2.weight"] = t(mid, mid, 3, 3)
            sd[pre + ".conv3.weight"] = t(out, mid, 1, 1)
            for i, ch in ((1, mid), (2, mid), (3, out)):
                sd[f"{pre}.bn{i}.weight"] = t(ch) + 1.0
                sd[f"{pre}.bn{i}.bias"] = t(ch)
                sd[f"{pre}.bn{i}.running_mean"] = t(ch)
                sd[f"{pre}.bn{i}.running_var"] = \
                    torch.rand(ch, generator=g) + 0.5
            if b == 0:
                sd[pre + ".downsample.0.weight"] = t(out, cin, 1, 1)
                sd[pre + ".downsample.1.weight"] = t(out) + 1.0
                sd[pre + ".downsample.1.bias"] = t(out)
                sd[pre + ".downsample.1.running_mean"] = t(out)
                sd[pre + ".downsample.1.running_var"] = \
                    torch.rand(out, generator=g) + 0.5
    return sd


def _torch_frozen_bn(x, sd, pre, eps=1e-5):
    w = sd[pre + ".weight"]
    b = sd[pre + ".bias"]
    rm = sd[pre + ".running_mean"]
    rv = sd[pre + ".running_var"]
    scale = w * (rv + eps).rsqrt()
    return x * scale[None, :, None, None] + \
        (b - rm * scale)[None, :, None, None]


def _torch_stem_and_block(img_nchw, sd):
    """Independent torch forward: stem + layer1.0 bottleneck, frozen-BN."""
    import torch.nn.functional as F
    y = F.conv2d(img_nchw, sd["conv1.weight"], stride=2, padding=3)
    y = F.relu(_torch_frozen_bn(y, sd, "bn1"))
    y = F.max_pool2d(y, 3, stride=2, padding=1)
    idn = y
    b = F.conv2d(y, sd["layer1.0.conv1.weight"])
    b = F.relu(_torch_frozen_bn(b, sd, "layer1.0.bn1"))
    b = F.conv2d(b, sd["layer1.0.conv2.weight"], padding=1)
    b = F.relu(_torch_frozen_bn(b, sd, "layer1.0.bn2"))
    b = F.conv2d(b, sd["layer1.0.conv3.weight"])
    b = _torch_frozen_bn(b, sd, "layer1.0.bn3")
    dn = F.conv2d(idn, sd["layer1.0.downsample.0.weight"])
    dn = _torch_frozen_bn(dn, sd, "layer1.0.downsample.1")
    return F.relu(b + dn)


@pytest.fixture(scope="module")
def imported(tmp_path_factory):
    sd = synth_state_dict()
    path = str(tmp_path_factory.mktemp("sd") / "resnet50.pth")
    torch.save(sd, path)
    model = ResNet50()
    img = np.zeros((1, 64, 96, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img))
    loaded = load_torch_resnet_state(
        {"params": variables["params"], "frozen": variables["frozen"]}, path)
    return model, loaded, sd


def test_kernel_layout_and_bn_mapping(imported):
    model, loaded, sd = imported
    k = np.asarray(loaded["params"]["conv1"]["kernel"])
    assert k.shape == (7, 7, 3, 64)
    np.testing.assert_array_equal(
        k, sd["conv1.weight"].numpy().transpose(2, 3, 1, 0))
    bn = loaded["frozen"]["layer3_2"]["bn2"]
    np.testing.assert_array_equal(np.asarray(bn["mean"]),
                                  sd["layer3.2.bn2.running_mean"].numpy())
    dn = loaded["frozen"]["layer4_0"]["down_bn"]
    np.testing.assert_array_equal(np.asarray(dn["var"]),
                                  sd["layer4.0.downsample.1.running_var"].numpy())


def test_forward_matches_torch_through_first_block(imported):
    """Stem + layer1.0 of the imported flax model == independent torch
    functional forward of the same weights."""
    import flax.linen as nn

    model, loaded, sd = imported
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 64, 96, 3)).astype(np.float32)

    want = _torch_stem_and_block(
        torch.from_numpy(img.transpose(0, 3, 1, 2)), sd).numpy()

    class StemBlock(nn.Module):
        @nn.compact
        def __call__(self, x):
            from monosowa_tpu.models.backbone import Bottleneck
            from monosowa_tpu.models.layers import FrozenBatchNorm
            y = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)), use_bias=False,
                        name="conv1")(x)
            y = FrozenBatchNorm(64, name="bn1")(y)
            y = nn.relu(y)
            y = nn.max_pool(y, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
            return Bottleneck(64, stride=1, downsample=True,
                              name="layer1_0")(y)

    sub = StemBlock()
    keys = ("conv1", "bn1", "layer1_0")
    vs = {"params": {k: loaded["params"][k] for k in keys
                     if k in loaded["params"]},
          "frozen": {k: loaded["frozen"][k] for k in keys
                     if k in loaded["frozen"]}}
    got = np.asarray(sub.apply(vs, jnp.asarray(img)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=2e-4, atol=2e-4)


def test_full_backbone_forward_finite(imported):
    model, loaded, sd = imported
    img = np.random.default_rng(1).normal(size=(1, 64, 96, 3)) \
        .astype(np.float32)
    outs = model.apply(loaded, jnp.asarray(img))
    assert len(outs) == 3
    for o, ch in zip(outs, (512, 1024, 2048)):
        assert o.shape[-1] == ch
        assert np.isfinite(np.asarray(o)).all()


def test_depth_stem_keeps_fresh_conv1(tmp_path):
    """depth_input=True: the 4-channel conv1 must NOT be overwritten by the
    3-channel pretrained stem (reference backbone.py:109-111)."""
    sd = synth_state_dict()
    path = str(tmp_path / "resnet50.pth")
    torch.save(sd, path)
    model = ResNet50(depth_input=True)
    img = np.zeros((1, 64, 96, 4), np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img))
    before = np.asarray(variables["params"]["conv1"]["kernel"]).copy()
    loaded = load_torch_resnet_state(
        {"params": variables["params"], "frozen": variables["frozen"]}, path)
    after = np.asarray(loaded["params"]["conv1"]["kernel"])
    assert after.shape == (7, 7, 4, 64)
    np.testing.assert_array_equal(before, after)
    # but everything else was imported
    np.testing.assert_array_equal(
        np.asarray(loaded["frozen"]["bn1"]["mean"]),
        sd["bn1.running_mean"].numpy())
