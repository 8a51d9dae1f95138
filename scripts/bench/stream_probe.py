"""Aggregate-HBM-bandwidth probe: K concurrent weight streams in ONE kernel.

The decode step is a serial chain of weight-streaming matvecs; the single-
stream DMA probe (int8_matvec.py --probe) measured ~435 GB/s on one
(IN, OUT) int8 stream vs the chip's ~819 GB/s HBM roofline. If one pallas
input ref's double-buffered DMA pipeline cannot saturate HBM, fusing the
per-layer matvec chain (qkv in one kernel, gate+up+down in one kernel —
each ref gets its OWN DMA pipeline) raises aggregate bandwidth without
changing any math. This probe quantifies that: K identical int8 arrays
streamed block-by-block in one pallas_call, near-zero compute.

Usage: python scripts/bench/stream_probe.py [--ks 1,2,3,4] [--bo 1536]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[2] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

IN, OUT = 3584, 152064


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="1,2,3,4")
    ap.add_argument("--bo", type=int, default=1536)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--vmem-mb", type=int, default=0,
                    help="raise Mosaic's scoped-vmem limit (CompilerParams "
                         "vmem_limit_bytes) so multi-stream kernels keep "
                         "large per-stream blocks")
    ap.add_argument("--contig", action="store_true",
                    help="pre-tiled (G, IN, bo) weight layout: each grid "
                         "block is one fully CONTIGUOUS HBM slab instead "
                         "of OUT-strided (IN, bo) reads of bo-byte bursts")
    ap.add_argument("--split-same", action="store_true",
                    help="K refs over ONE array at K different column "
                         "offsets (grid covers OUT/K per ref): K "
                         "concurrent DMA pipelines on a single weight, "
                         "no copies — the fused-matvec building block")
    args = ap.parse_args()
    import jax.experimental.pallas as pl

    bo = args.bo

    kw = {}
    if args.vmem_mb:
        from jax.experimental.pallas import tpu as pltpu

        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=args.vmem_mb << 20)
    for K in [int(s) for s in args.ks.split(",")]:
        # VMEM: 2 pipeline buffers per stream must fit the scoped budget
        budget = ((args.vmem_mb - 3) if args.vmem_mb else 13) << 20
        bo = args.bo
        while 2 * K * IN * bo > budget:
            bo -= 128
        bo = max(bo, 128)
        while OUT % bo:
            bo -= 128

        G = OUT // bo

        def probe_kernel(*refs):
            t_ref = refs[K]
            o_ref = refs[K + 1]
            acc = t_ref[...]
            for r in refs[:K]:
                blk = r[0] if args.contig else r[...]      # (IN, bo)
                acc = acc + blk[0, :].astype(jnp.float32)[None]
            o_ref[...] = acc

        w_spec = (pl.BlockSpec((1, IN, bo), lambda i: (i, 0, 0))
                  if args.contig else
                  pl.BlockSpec((IN, bo), lambda i: (0, i)))

        @jax.jit
        def rep(qs):
            call = pl.pallas_call(
                probe_kernel,
                grid=(G,),
                in_specs=[w_spec for _ in range(K)]
                + [pl.BlockSpec((1, 1), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((1, bo), lambda i: (0, i)),
                out_shape=jax.ShapeDtypeStruct((1, OUT), jnp.float32),
                **kw,
            )

            def body(i, acc):
                t = i.astype(jnp.float32).reshape(1, 1) * 1e-6
                y = call(*qs, t)
                return acc + y.sum()
            return jax.lax.fori_loop(0, args.iters, body,
                                     jnp.zeros((), jnp.float32))

        if args.split_same:
            # ONE (IN, OUT) array, K refs at staggered column offsets;
            # grid covers OUT/(K*bo) steps, each step streams K blocks
            while (OUT // K) % bo:
                bo -= 128
            G = OUT // bo
            Gk = G // K

            def probe_kernel(*refs):  # noqa: F811
                t_ref = refs[K]
                acc = t_ref[...]
                outs = refs[K + 1:]
                for r, o_ref in zip(refs[:K], outs):
                    o_ref[...] = acc + r[0, :].astype(jnp.float32)[None]

            def in_map(off):
                return lambda i: (0, i + off)

            @jax.jit
            def rep(qs):  # noqa: F811
                call = pl.pallas_call(
                    probe_kernel,
                    grid=(Gk,),
                    in_specs=[pl.BlockSpec((IN, bo), in_map(j * Gk))
                              for j in range(K)]
                    + [pl.BlockSpec((1, 1), lambda i: (0, 0))],
                    out_specs=[pl.BlockSpec((1, bo), lambda i: (0, i))
                               for _ in range(K)],
                    out_shape=[jax.ShapeDtypeStruct((1, OUT // K), jnp.float32)
                               for _ in range(K)],
                    **kw,
                )

                def body(i, acc):
                    t = i.astype(jnp.float32).reshape(1, 1) * 1e-6
                    ys = call(*([qs[0]] * K), t)
                    return acc + sum(y.sum() for y in ys)
                return jax.lax.fori_loop(0, args.iters, body,
                                         jnp.zeros((), jnp.float32))

            qs = [jax.random.randint(jax.random.PRNGKey(0), (IN, OUT),
                                     -127, 128, jnp.int8)]
            nb = IN * OUT
            float(rep(qs))
            t0 = time.perf_counter()
            float(rep(qs))
            dt = (time.perf_counter() - t0) / args.iters
            print(f"K={K} split-same (bo={bo}): {dt * 1e3:.3f} ms/call  "
                  f"{nb / dt / 1e9:.0f} GB/s", flush=True)
            continue

        qs = [jax.random.randint(jax.random.PRNGKey(k), (IN, OUT), -127, 128,
                                 jnp.int8) for k in range(K)]
        if args.contig:
            qs = [q.reshape(IN, G, bo).transpose(1, 0, 2) for q in qs]
            qs = [jax.device_put(q) for q in qs]
        float(rep(qs))
        t0 = time.perf_counter()
        float(rep(qs))
        dt = (time.perf_counter() - t0) / args.iters
        nbytes = K * IN * OUT
        print(f"K={K} (bo={bo}): {dt * 1e3:.3f} ms/call  "
              f"aggregate {nbytes / dt / 1e9:.0f} GB/s  "
              f"per-stream {nbytes / dt / 1e9 / K:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
