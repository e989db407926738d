"""Benchmark MSDA forward/backward variants at detector shapes on the
current jax default device (TPU under axon).

Usage: python tools/bench_msda.py [xla|pallas|mxu|both]

Env knobs:
  MSDA_CASES     xla case list (see below)
  MSDA_MXU_CASES mxu kernel cases, e.g. "256:2048:,256:512:dynamic"
                 (block_q:block_t:skip; empty skip = dense sweep)
  MSDA_TAGS      comma list of "encoder"/"decoder" to bench (default both)
  MSDA_LOCAL=1   sample locations = per-query reference point + small
                 offsets (the trained model's regime: deformable samples
                 are local) instead of uniform-random over the image —
                 uniform locs are the WORST case for anchor-range chunk
                 skipping and do not represent the model
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monosowa_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache("/tmp/jax_cache")


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


def _local_locs(rng, shapes, q, b, m, p, margin=0.02):
    """Reference-point + small-offset sampling locations (the model's
    regime).  Encoder queries (q == sum HW) sit at their own grid
    position; decoder-style query sets get random reference points (a
    decoder block has no raster locality — representative of its worst
    case too)."""
    refs = []
    for h, w_l in shapes:
        yy, xx = np.meshgrid(np.arange(h), np.arange(w_l), indexing="ij")
        refs.append(np.stack([(xx.ravel() + 0.5) / w_l,
                              (yy.ravel() + 0.5) / h], -1))
    refs = np.concatenate(refs, 0)                     # (sum HW, 2)
    if q != refs.shape[0]:
        refs = rng.uniform(0, 1, (q, 2))
    off = rng.uniform(-margin, margin, (b, q, m, len(shapes), p, 2))
    return (refs[None, :, None, None, None, :] + off).astype(np.float32)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    b, m, d, p = 8, 8, 32, 4
    shapes = ((48, 160), (24, 80), (12, 40), (6, 20))
    s = sum(h * w for h, w in shapes)
    rng = np.random.default_rng(0)
    local = os.environ.get("MSDA_LOCAL", "") == "1"
    tags = os.environ.get("MSDA_TAGS", "encoder,decoder").split(",")
    value = jnp.asarray(rng.normal(size=(b, s, m, d)).astype(np.float32))
    for q, tag in ((s, "encoder"), (550, "decoder")):
        if tag not in tags:
            continue
        if local:
            loc = jnp.asarray(_local_locs(rng, shapes, q, b, m, p))
        else:
            loc = jnp.asarray(
                rng.uniform(0, 1, (b, q, m, len(shapes), p, 2))
                .astype(np.float32))
        w = jnp.asarray(
            rng.uniform(0, 1, (b, q, m, len(shapes), p)).astype(np.float32))

        if which in ("xla", "both"):
            from monosowa_tpu.ops.msda import ms_deform_attn

            # case spec: mode[:bwd_mode][/cq=N][/dvq=N][/v=f32] via
            # MSDA_CASES="onehot,quad/cq=2048/dvq=1024,onehot:quad"
            spec = os.environ.get(
                "MSDA_CASES",
                "quad/v=f32,quad,onehot/v=f32,onehot")
            for case in spec.split(","):
                parts = case.split("/")
                mode = parts[0]
                bwd_mode = ""
                if ":" in mode:
                    mode, bwd_mode = mode.split(":")
                kw = dict(gather_mode=mode, bwd_gather_mode=bwd_mode,
                          onehot_dtype=jnp.bfloat16)
                vdt = jnp.bfloat16
                for opt in parts[1:]:
                    if opt == "v=f32":
                        vdt = jnp.float32
                        if mode == "quad" and "onehot" not in case:
                            kw["onehot_dtype"] = jnp.float32
                    elif opt.startswith("cq="):
                        kw["chunk_q"] = int(opt[3:])
                    elif opt.startswith("dvq="):
                        kw["dv_chunk_q"] = int(opt[4:])
                v_in = value.astype(vdt)
                f = jax.jit(lambda v, l, a, kw=kw:
                            ms_deform_attn(v, shapes, l, a, **kw))
                t = bench(f, (v_in, loc, w))
                print(f"xla fwd     {tag} [{case}]: {t * 1e3:8.2f} ms",
                      flush=True)

                def loss(v, l, a, kw=kw):
                    return jnp.sum(ms_deform_attn(
                        v, shapes, l, a, **kw).astype(jnp.float32) ** 2)
                g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
                t = bench(g, (v_in, loc, w))
                print(f"xla fwd+bwd {tag} [{case}]: {t * 1e3:8.2f} ms",
                      flush=True)

        if which in ("mxu", "both"):
            from monosowa_tpu.ops.msda_mxu import (ms_deform_attn_mxu,
                                                   msda_gdot_mxu)
            spec = os.environ.get(
                "MSDA_MXU_CASES", "256:2048:,512:2048:,256:4096:")
            for case in spec.split(","):
                bq_s, bt_s, skip = case.split(":")
                bq, bt = int(bq_s), int(bt_s)
                skip = skip or False
                f = jax.jit(lambda v, l, a, bq=bq, bt=bt, skip=skip:
                            ms_deform_attn_mxu(
                                v, shapes, l, a, block_q=bq, block_t=bt,
                                skip_chunks=skip))
                g = jax.jit(lambda v, l, dd, bq=bq, bt=bt, skip=skip:
                            msda_gdot_mxu(
                                v, shapes, l, dd, block_q=bq, block_t=bt,
                                skip_chunks=skip))
                dout = jnp.asarray(rng.normal(
                    size=(b, q, m, d)).astype(np.float32))
                parts = os.environ.get("MSDA_MXU_PARTS", "fwd,gdot")
                try:
                    if "fwd" in parts:
                        t = bench(f, (value.astype(jnp.bfloat16), loc, w))
                        print(f"mxu fwd     {tag} [{case}]: "
                              f"{t * 1e3:8.2f} ms", flush=True)
                    if "gdot" in parts:
                        t = bench(g, (value.astype(jnp.bfloat16), loc, dout))
                        print(f"mxu gdot    {tag} [{case}]: "
                              f"{t * 1e3:8.2f} ms", flush=True)
                    if "dvalue" in parts:
                        from monosowa_tpu.ops.msda_mxu import msda_dvalue_mxu
                        dv = jax.jit(lambda l, a, dd, bq=bq, bt=bt, skip=skip:
                                     msda_dvalue_mxu(
                                         shapes, l, a, dd, block_q=bq,
                                         block_t=bt, skip_chunks=skip))
                        t = bench(dv, (loc, w, dout))
                        print(f"mxu dvalue  {tag} [{case}]: "
                              f"{t * 1e3:8.2f} ms", flush=True)
                except Exception as e:
                    print(f"mxu         {tag} [{case}]: FAILED "
                          f"{type(e).__name__}: {str(e)[:300]}", flush=True)

        if which in ("dvx",):
            # XLA dValue baseline (the scan _msda_dvalue)
            from monosowa_tpu.ops.msda import _msda_dvalue
            dout = jnp.asarray(rng.normal(size=(b, q, m, d))
                               .astype(np.float32))
            for dvq in (256, 512):
                f = jax.jit(lambda v, l, a, dd, dvq=dvq: _msda_dvalue(
                    v, shapes, l, a, dd, dvq, jnp.bfloat16, "quad"))
                t = bench(f, (value.astype(jnp.bfloat16), loc, w, dout))
                print(f"xla dvalue  {tag} [dvq={dvq}]: {t * 1e3:8.2f} ms",
                      flush=True)

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
