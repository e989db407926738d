"""ResNet-50 backbone with frozen batch norm (Flax, NHWC).

Behavioral contract (MonoDETR/lib/models/monodetr/backbone.py:68-144):
torchvision ResNet-50 with FrozenBatchNorm2d, returning layer2/3/4 features
(strides 8/16/32, channels 512/1024/2048).  Weights are ImageNet-pretrained
in the reference; offline we random-init and provide
``load_torch_resnet_state`` to import a converted torchvision state dict
when one is available on disk.

TPU-first: NHWC layout (XLA's native conv layout), bfloat16-friendly.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from monosowa_tpu.models.layers import FrozenBatchNorm


class Bottleneck(nn.Module):
    features: int           # bottleneck width; output = 4x
    stride: int = 1
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        out_ch = self.features * 4
        identity = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = FrozenBatchNorm(self.features, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = FrozenBatchNorm(self.features, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = FrozenBatchNorm(out_ch, name="bn3")(y)
        if self.downsample:
            identity = nn.Conv(out_ch, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="down_conv")(x)
            identity = FrozenBatchNorm(out_ch, name="down_bn")(identity)
        return nn.relu(y + identity)


class ResNet50(nn.Module):
    """Returns (C3, C4, C5): strides 8/16/32, channels 512/1024/2048.

    ``depth_input``: 4-channel RGB-D stem (reference backbone.py:109-111:
    conv1 re-made as 4-in with xavier-uniform init; the input channel count
    itself is inferred from the input).  Deviation: the reference also
    swaps FrozenBatchNorm for trainable BatchNorm2d in depth mode — here
    the norm stays frozen (no pretrained RGB-D stats exist either way).
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    depth_input: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        stem_init = (nn.initializers.xavier_uniform() if self.depth_input
                     else nn.initializers.lecun_normal())
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, kernel_init=stem_init, dtype=self.dtype,
                    name="conv1")(x)
        y = FrozenBatchNorm(64, name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outputs = []
        widths = (64, 128, 256, 512)
        for stage, (blocks, w) in enumerate(zip(self.stage_sizes, widths)):
            stride = 1 if stage == 0 else 2
            y = Bottleneck(w, stride=stride, downsample=True,
                           dtype=self.dtype, name=f"layer{stage + 1}_0")(y)
            for b in range(1, blocks):
                y = Bottleneck(w, dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}")(y)
            if stage >= 1:
                outputs.append(y)
        return tuple(outputs)


BACKBONE_CHANNELS = (512, 1024, 2048)
BACKBONE_STRIDES = (8, 16, 32)

# ImageNet normalization used by the reference dataset pipeline
# (kitti_dataset.py mean/std).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_torch_resnet_state(variables: dict, state_path: str) -> dict:
    """Import a torchvision resnet50 state_dict (saved via torch.save) into
    this module's variable tree.  Maps OIHW conv weights to HWIO and BN
    buffers into the ``frozen`` collection.  Returns updated variables.
    """
    import torch

    sd = torch.load(state_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    params = {k: dict(v) for k, v in variables["params"].items()}
    frozen = {k: dict(v) for k, v in variables["frozen"].items()}

    def conv_w(name):
        return jnp.asarray(sd[name].numpy().transpose(2, 3, 1, 0))

    def put_bn(dst, src):
        frozen[dst] = {
            "scale": jnp.asarray(sd[src + ".weight"].numpy()),
            "bias": jnp.asarray(sd[src + ".bias"].numpy()),
            "mean": jnp.asarray(sd[src + ".running_mean"].numpy()),
            "var": jnp.asarray(sd[src + ".running_var"].numpy()),
        }

    # 4-channel RGB-D stem keeps its fresh xavier conv1 — the reference
    # replaces conv1 AFTER loading pretrained weights (backbone.py:109-111)
    stem = np.asarray(params["conv1"]["kernel"])
    if stem.shape[2] == sd["conv1.weight"].shape[1]:
        params["conv1"] = {"kernel": conv_w("conv1.weight")}
    put_bn("bn1", "bn1")
    for stage, blocks in enumerate((3, 4, 6, 3)):
        for b in range(blocks):
            pre = f"layer{stage + 1}.{b}"
            dst = f"layer{stage + 1}_{b}"
            blk_params = {
                "conv1": {"kernel": conv_w(pre + ".conv1.weight")},
                "conv2": {"kernel": conv_w(pre + ".conv2.weight")},
                "conv3": {"kernel": conv_w(pre + ".conv3.weight")},
            }
            blk_frozen = {}
            for i in (1, 2, 3):
                sub = {
                    "scale": jnp.asarray(sd[f"{pre}.bn{i}.weight"].numpy()),
                    "bias": jnp.asarray(sd[f"{pre}.bn{i}.bias"].numpy()),
                    "mean": jnp.asarray(sd[f"{pre}.bn{i}.running_mean"].numpy()),
                    "var": jnp.asarray(sd[f"{pre}.bn{i}.running_var"].numpy()),
                }
                blk_frozen[f"bn{i}"] = sub
            if f"{pre}.downsample.0.weight" in sd:
                blk_params["down_conv"] = {
                    "kernel": conv_w(pre + ".downsample.0.weight")}
                blk_frozen["down_bn"] = {
                    "scale": jnp.asarray(sd[pre + ".downsample.1.weight"].numpy()),
                    "bias": jnp.asarray(sd[pre + ".downsample.1.bias"].numpy()),
                    "mean": jnp.asarray(
                        sd[pre + ".downsample.1.running_mean"].numpy()),
                    "var": jnp.asarray(
                        sd[pre + ".downsample.1.running_var"].numpy()),
                }
            params[dst] = blk_params
            frozen[dst] = blk_frozen
    return {"params": params, "frozen": frozen}
