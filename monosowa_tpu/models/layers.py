"""Shared model building blocks (Flax linen).

Mixed precision: modules take a ``dtype`` (compute dtype) following the
standard flax policy — parameters stay float32, activations/matmuls run in
``dtype`` (bfloat16 on TPU doubles MXU throughput and halves HBM traffic),
and numerically-sensitive reductions (softmax logits, layer norms) stay
float32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def resolve_dtype(compute_dtype: str):
    """Model-level policy string -> jnp dtype.  "auto" = bfloat16 on TPU,
    float32 elsewhere (CPU bf16 is emulated and slower; parity tests run
    on CPU in f32)."""
    if compute_dtype == "auto":
        return jnp.bfloat16 if jax.default_backend() == "tpu" \
            else jnp.float32
    return jnp.dtype(compute_dtype)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Logit with clamping (reference: MonoDETR utils/misc.py inverse_sigmoid)."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, 1.0)
    x2 = jnp.clip(1.0 - x, eps, 1.0)
    return jnp.log(x1) - jnp.log(x2)


class MLP(nn.Module):
    """Simple multi-layer perceptron with ReLU between layers
    (reference: monodetr.py MLP)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype)(x))
        return nn.Dense(self.output_dim, dtype=self.dtype)(x)


class FrozenBatchNorm(nn.Module):
    """BatchNorm with all four tensors frozen (reference backbone.py:28-65).

    Stats and affine live in the ``frozen`` collection so the optimizer never
    sees them; pretrained values can be loaded into that collection.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.variable("frozen", "scale",
                              lambda: jnp.ones(self.features)).value
        bias = self.variable("frozen", "bias",
                             lambda: jnp.zeros(self.features)).value
        mean = self.variable("frozen", "mean",
                             lambda: jnp.zeros(self.features)).value
        var = self.variable("frozen", "var",
                            lambda: jnp.ones(self.features)).value
        w = scale * jax.lax.rsqrt(var + self.eps)
        b = bias - mean * w
        # w/b fold in float32, then cast to the activation dtype so a bf16
        # backbone stays bf16 (f32 w would silently promote every conv)
        return x * w.astype(x.dtype) + b.astype(x.dtype)


class MultiHeadAttention(nn.Module):
    """Standard dot-product MHA, batch-first: (B, Lq, D) x (B, Lk, D).

    Functional equivalent of torch nn.MultiheadAttention as used by the
    decoder's depth cross-attention and group self-attention
    (depthaware_transformer.py:399-409)."""

    num_heads: int
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, query, key, value, key_mask: Optional[jnp.ndarray] = None,
                 attn_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        d = query.shape[-1]
        dh = d // self.num_heads

        def split(x):
            return x.reshape(x.shape[:-1] + (self.num_heads, dh))

        q = split(nn.Dense(d, dtype=self.dtype, name="q_proj")(query))
        k = split(nn.Dense(d, dtype=self.dtype, name="k_proj")(key))
        v = split(nn.Dense(d, dtype=self.dtype, name="v_proj")(value))
        # logits accumulate in f32 regardless of the qkv compute dtype
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(dh)
        if key_mask is not None:
            logits = jnp.where(key_mask[:, None, None, :], -1e9, logits)
        if attn_mask is not None:
            # (Lq, Lk) True = blocked (DN-DETR block structure)
            logits = jnp.where(attn_mask[None, None, :, :], -1e9, logits)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(
            out.reshape(query.shape[:-1] + (d,)))


class GroupNorm32(nn.Module):
    """GroupNorm(32) over channel-last tensors (torch GroupNorm equivalent)."""

    features: int

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=32, epsilon=1e-5)(x)


def xavier_uniform_init() -> Callable:
    return nn.initializers.xavier_uniform()
