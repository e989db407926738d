"""Micro-benchmark behind the ops/msda_mxu.py sparse-gather analysis.

Does Mosaic lower ``jnp.take_along_axis`` (``tpu.dynamic_gather``) inside
a Pallas kernel with a (256, 128) sublane-gather operand, and how does it
compare against the one-hot chunk dot on the same access pattern?

Result on v5e via axon (2026-08-20): the gather variant FAILS to compile
on device — "Mosaic failed to compile TPU kernel: Not implemented:
Multiple source vregs along gather dimension" (sublane gathers are
single-vreg only, i.e. 8 f32 rows).  Both variants are exact in
interpret mode (`--interpret`), which is how the repo's "gatherK" MSDA
mode stays parity-tested until Mosaic lifts the restriction.

Usage: python tools/bench_gather_micro.py [gather|onehot] [--interpret]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _kernel_gather(idx_ref, quad_ref, out_ref, *, bq, d4, k_win, block):
    acc = jnp.zeros((bq, d4), jnp.float32)
    ii = idx_ref[:, 0]
    lo = jnp.min(jnp.where(ii < 0, jnp.int32(2 ** 30), ii))
    t_total = quad_ref.shape[0]
    n_chunks = t_total // block
    base_c = jnp.clip(lo // block, 0, max(n_chunks - k_win, 0))
    for k in range(k_win):
        w0 = (base_c + k) * block
        win = quad_ref[pl.dslice(w0, block), :].astype(jnp.float32)
        il = ii - w0
        inwin = (il >= 0) & (il < block)
        ilc = jnp.clip(il, 0, block - 1)
        idx2 = jnp.broadcast_to(ilc[:, None], (bq, d4))
        g = jnp.take_along_axis(win, idx2, axis=0)
        acc = acc + jnp.where(inwin[:, None], g, 0.0)
    out_ref[:] = acc


def _kernel_onehot(idx_ref, quad_ref, out_ref, *, bq, d4, k_win, block):
    acc = jnp.zeros((bq, d4), jnp.float32)
    ii = idx_ref[:, 0]
    lo = jnp.min(jnp.where(ii < 0, jnp.int32(2 ** 30), ii))
    t_total = quad_ref.shape[0]
    n_chunks = t_total // block
    base_c = jnp.clip(lo // block, 0, max(n_chunks - k_win, 0))
    for k in range(k_win):
        w0 = (base_c + k) * block
        iota = w0 + jax.lax.broadcasted_iota(jnp.int32, (bq, block), 1)
        oh = (ii[:, None] == iota).astype(jnp.bfloat16)
        acc = acc + jnp.dot(oh, quad_ref[pl.dslice(w0, block), :],
                            preferred_element_type=jnp.float32)
    out_ref[:] = acc


def run(kind, bq=256, d4=128, t_total=10240, block=None, k_win=None,
        reps=16, interpret=False):
    if kind == "gather":
        kern, block, k_win = _kernel_gather, block or 256, k_win or 4
    else:
        kern, block, k_win = _kernel_onehot, block or 512, k_win or 2
    nb = t_total // bq
    rng = np.random.default_rng(0)
    # clustered indices per block, like deformable anchors
    centers = rng.integers(0, t_total - 600, nb)
    idx = (centers[:, None] + rng.integers(0, 500, (nb, bq))).astype(np.int32)
    idx = np.minimum(idx, t_total - 1).reshape(nb * bq, 1)
    idx = np.broadcast_to(idx, (nb * bq, 128)).copy()
    quad = rng.standard_normal((t_total, d4)).astype(jnp.bfloat16)

    f = pl.pallas_call(
        functools.partial(kern, bq=bq, d4=d4, k_win=k_win, block=block),
        grid=(nb,),
        in_specs=[pl.BlockSpec((bq, 128), lambda i: (i, 0)),
                  pl.BlockSpec((t_total, d4), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((bq, d4), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nb * bq, d4), jnp.float32),
        interpret=interpret,
    )
    f = jax.jit(f)
    out = np.asarray(f(idx, quad))

    # oracle
    want = np.asarray(quad, np.float32)[idx[:, 0]]
    # windows may miss out-of-window idx; emulate coverage
    ii = idx[:, 0].reshape(nb, bq)
    lo = ii.min(1)
    base_c = np.clip(lo // block, 0, t_total // block - k_win)
    cov = ((ii >= (base_c[:, None] * block))
           & (ii < (base_c[:, None] + k_win) * block))
    want = want.reshape(nb, bq, d4) * cov[:, :, None]
    err = np.abs(out.reshape(nb, bq, d4) - want).max()
    print(f"{kind}: max err {err}  coverage {cov.mean():.3f}")

    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(idx, quad)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{kind}: {dt * 1e3:.3f} ms per call "
          f"(block={block}, k_win={k_win})")


if __name__ == "__main__":
    kind = sys.argv[1] if len(sys.argv) > 1 else "gather"
    interp = "--interpret" in sys.argv
    run(kind, interpret=interp)
