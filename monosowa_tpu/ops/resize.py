"""Torch-exact separable image resizing in JAX (NHWC).

Why not ``jax.image.resize``: the ported model families (DINOv2 position
embeddings, the DPT fusion neck, SAM mask upsampling) were trained with
``torch.nn.functional.interpolate`` semantics and the ports are
differentially tested against the torch implementations bit-for-bit at
f32 tolerance, so the resize must reproduce torch exactly:

* ``align_corners=True``: source coordinate ``i * (S-1)/(D-1)``;
* ``align_corners=False``: half-pixel centers ``(i + 0.5) * S/D - 0.5``
  with replicate border clamping and NO anti-aliasing on downsample
  (``jax.image.resize`` anti-aliases when scale < 1 — torch does not
  unless ``antialias=True``);
* bicubic uses the cubic convolution kernel with A = -0.75
  (``jax.image.resize(method='cubic')`` uses the Keys kernel A = -0.5).

Each axis is resized by a dense (D, S) interpolation matrix contracted on
the MXU — output sizes here are small (feature maps / embedding grids), so
a matmul beats serialized gathers on TPU and keeps everything jittable.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _linear_matrix(dst: int, src: int, align_corners: bool) -> np.ndarray:
    """(dst, src) row-stochastic linear interpolation matrix, torch-exact."""
    m = np.zeros((dst, src), np.float32)
    for i in range(dst):
        if align_corners:
            x = 0.0 if dst == 1 else i * (src - 1) / (dst - 1)
        else:
            x = (i + 0.5) * src / dst - 0.5
        x = min(max(x, 0.0), float(src - 1))
        i0 = int(np.floor(x))
        i1 = min(i0 + 1, src - 1)
        t = x - i0
        m[i, i0] += 1.0 - t
        m[i, i1] += t
    return m


def _cubic_weights(t: float, a: float = -0.75) -> np.ndarray:
    """Cubic convolution weights for taps at offsets (-1, 0, 1, 2)."""
    def w(x):
        x = abs(x)
        if x <= 1.0:
            return (a + 2.0) * x**3 - (a + 3.0) * x**2 + 1.0
        if x < 2.0:
            return a * x**3 - 5.0 * a * x**2 + 8.0 * a * x - 4.0 * a
        return 0.0
    return np.array([w(t + 1.0), w(t), w(1.0 - t), w(2.0 - t)], np.float64)


def _cubic_matrix(dst: int, src: int, align_corners: bool) -> np.ndarray:
    """(dst, src) bicubic (A=-0.75) matrix with replicate border clamping."""
    m = np.zeros((dst, src), np.float64)
    for i in range(dst):
        if align_corners:
            x = 0.0 if dst == 1 else i * (src - 1) / (dst - 1)
        else:
            x = (i + 0.5) * src / dst - 0.5
        i0 = int(np.floor(x))
        t = x - i0
        for k, wk in enumerate(_cubic_weights(t)):
            m[i, min(max(i0 - 1 + k, 0), src - 1)] += wk
    return m.astype(np.float32)


def _cubic_aa_matrix(dst: int, src: int) -> np.ndarray:
    """Torch/PIL ``antialias=True`` bicubic: A = -0.5 kernel, scaled to the
    downsample factor, taps via ``int(center ± support + 0.5)``, weights
    normalized (empirically exact vs ``F.interpolate(..., antialias=True)``,
    incl. the upsample case where torch still routes through the AA kernel)."""
    m = np.zeros((dst, src), np.float64)
    invscale = src / dst
    kscale = max(invscale, 1.0)
    support = 2.0 * kscale
    for i in range(dst):
        center = (i + 0.5) * invscale
        jmin = max(int(center - support + 0.5), 0)
        jmax = min(int(center + support + 0.5), src)
        ws = _np_cubic_kernel((np.arange(jmin, jmax) + 0.5 - center) / kscale)
        m[i, jmin:jmax] = ws / ws.sum()
    return m.astype(np.float32)


def _np_cubic_kernel(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    x = np.abs(x)
    return np.where(
        x <= 1.0, (a + 2.0) * x**3 - (a + 3.0) * x**2 + 1.0,
        np.where(x < 2.0, a * (x**3 - 5.0 * x**2 + 8.0 * x - 4.0), 0.0))


@functools.lru_cache(maxsize=256)
def _matrix(dst: int, src: int, align_corners: bool, mode: str) -> np.ndarray:
    if mode == "linear":
        return _linear_matrix(dst, src, align_corners)
    if mode == "cubic":
        return _cubic_matrix(dst, src, align_corners)
    if mode == "cubic_aa":
        return _cubic_aa_matrix(dst, src)
    raise ValueError(mode)


def _resize_nhwc(x: jnp.ndarray, out_hw, align_corners: bool,
                 mode: str) -> jnp.ndarray:
    """x: (..., H, W, C) -> (..., H', W', C); interior dims preserved."""
    oh, ow = int(out_hw[0]), int(out_hw[1])
    h, w = x.shape[-3], x.shape[-2]
    dt = x.dtype
    y = x.astype(jnp.float32)
    if oh != h:
        mh = jnp.asarray(_matrix(oh, h, align_corners, mode))
        y = jnp.einsum("oh,...hwc->...owc", mh, y)
    if ow != w:
        mw = jnp.asarray(_matrix(ow, w, align_corners, mode))
        y = jnp.einsum("ow,...hwc->...hoc", mw, y)
    return y.astype(dt)


def resize_bilinear_torch(x: jnp.ndarray, out_hw,
                          align_corners: bool = False) -> jnp.ndarray:
    """``F.interpolate(mode='bilinear')``-exact resize of (..., H, W, C)."""
    return _resize_nhwc(x, out_hw, align_corners, "linear")


def resize_bicubic_torch(x: jnp.ndarray, out_hw, align_corners: bool = False,
                         antialias: bool = False) -> jnp.ndarray:
    """``F.interpolate(mode='bicubic')``-exact resize of (..., H, W, C)."""
    if antialias:
        if align_corners:
            raise NotImplementedError("torch AA path is align_corners=False")
        return _resize_nhwc(x, out_hw, False, "cubic_aa")
    return _resize_nhwc(x, out_hw, align_corners, "cubic")
