"""Benchmark MSDA forward/backward variants at detector shapes on the
current jax default device (TPU under axon).

Usage: python tools/bench_msda.py [xla|pallas|both]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, args, iters=5, warmup=2):
    """Time with a host scalar pull per iteration — under axon the only
    trustworthy sync is fetching a value to the host."""
    def summed(*a):
        out = fn(*a)
        return jax.tree.reduce(lambda x, y: x + jnp.sum(y), out,
                               jnp.float32(0.0))
    summed = jax.jit(summed)
    for _ in range(warmup):
        float(summed(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(summed(*args))
    return (time.perf_counter() - t0) / iters


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    b, m, d, p = 8, 8, 32, 4
    shapes = ((48, 160), (24, 80), (12, 40), (6, 20))
    s = sum(h * w for h, w in shapes)
    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.normal(size=(b, s, m, d)).astype(np.float32))
    for q, tag in ((s, "encoder"), (550, "decoder")):
        loc = jnp.asarray(
            rng.uniform(0, 1, (b, q, m, len(shapes), p, 2))
            .astype(np.float32))
        w = jnp.asarray(
            rng.uniform(0, 1, (b, q, m, len(shapes), p)).astype(np.float32))

        if which in ("xla", "both"):
            from monosowa_tpu.ops.msda import ms_deform_attn
            f = jax.jit(lambda v, l, a: ms_deform_attn(v, shapes, l, a))
            t = bench(f, (value, loc, w))
            print(f"xla fwd    {tag}: {t * 1e3:8.2f} ms")

            def loss(v, l, a):
                return jnp.sum(ms_deform_attn(v, shapes, l, a) ** 2)
            g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            t = bench(g, (value, loc, w))
            print(f"xla fwd+bwd {tag}: {t * 1e3:8.2f} ms")

        if which in ("pallas", "both"):
            from monosowa_tpu.ops.msda_pallas import ms_deform_attn_pallas
            for bq in (64, 128, 256):
                f = jax.jit(lambda v, l, a, bq=bq: ms_deform_attn_pallas(
                    v, shapes, l, a, block_q=bq))
                try:
                    t = bench(f, (value, loc, w))
                    print(f"pallas fwd {tag} block_q={bq}: {t * 1e3:8.2f} ms")
                except Exception as e:
                    print(f"pallas fwd {tag} block_q={bq}: FAILED "
                          f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
