"""Microbench: int8 weight-only lm_head matvec — pallas kernel vs XLA.

Decode-time lm_head (3584 x 152064, per-channel int8) at matvec batch
sizes. BENCH_NOTES measured XLA's fused-convert dot at ~345 GB/s on this
shape while the rest of the decode layer stream averages ~660 GB/s; the
pallas kernel (kernels/quant_matvec.py::int8_matmul) streams the int8
bytes once and converts in-register.

One process, 2 timed jits (tunnel hazard rules in CLAUDE.md). Timing is
the repo-standard on-device fori_loop with loop-index input perturbation
and a single scalar fetch (block_until_ready is a no-op on the tunnel).
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

IN, OUT = 3584, 152064  # Qwen2-7B lm_head


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--bo", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=0)
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--probe", action="store_true",
                    help="DMA-only pallas probe: stream the int8 weight "
                         "through VMEM with near-zero compute, to split "
                         "bandwidth-bound from VPU-convert-bound")
    ap.add_argument("--probe-dtype", default="int8",
                    choices=("int8", "bfloat16"))
    args = ap.parse_args()

    from video3d_tpu.kernels.quant_matvec import int8_matmul

    if args.probe:
        import functools

        import jax.experimental.pallas as pl

        bo = args.bo or 1536

        def probe_kernel(q_ref, t_ref, o_ref):
            # touch one sublane row of the block: full DMA, ~no compute;
            # t varies per iteration so XLA cannot hoist the call
            o_ref[...] = q_ref[0, :].astype(jnp.float32)[None] + t_ref[...]

        @jax.jit
        def rep_probe(q):
            call = pl.pallas_call(
                probe_kernel,
                grid=(OUT // bo,),
                in_specs=[pl.BlockSpec((IN, bo), lambda i: (0, i)),
                          pl.BlockSpec((1, 1), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((1, bo), lambda i: (0, i)),
                out_shape=jax.ShapeDtypeStruct((1, OUT), jnp.float32),
            )

            def body(i, acc):
                t = i.astype(jnp.float32).reshape(1, 1) * 1e-6
                y = call(q, t)
                return acc + y.sum()
            return jax.lax.fori_loop(0, args.iters, body,
                                     jnp.zeros((), jnp.float32))

        dt_ = getattr(jnp, args.probe_dtype)
        q = jax.random.randint(jax.random.PRNGKey(0), (IN, OUT), -127, 128,
                               jnp.int8).astype(dt_)
        float(rep_probe(q))
        t0 = time.perf_counter()
        float(rep_probe(q))
        dt = (time.perf_counter() - t0) / args.iters
        nbytes = IN * OUT * q.dtype.itemsize
        print(f"probe(bo={bo}, {args.probe_dtype}): {dt * 1e3:.3f} ms/call  "
              f"{nbytes / dt / 1e9:.0f} GB/s  "
              f"{IN * OUT / dt / 1e9:.0f} Gelem/s", flush=True)
        return

    key = jax.random.PRNGKey(0)
    q = jax.random.randint(key, (IN, OUT), -127, 128, jnp.int8)
    scale = jnp.full((1, OUT), 1e-2, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (args.batch, IN),
                          jnp.bfloat16)
    iters = args.iters

    @jax.jit
    def rep_xla(x, q, scale):
        def body(i, acc):
            y = (x + i.astype(x.dtype) * 1e-6) @ q.astype(x.dtype)
            y = y * scale.astype(x.dtype)
            return acc + y.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    @jax.jit
    def rep_kernel(x, q, scale):
        def body(i, acc):
            y = int8_matmul(x + i.astype(x.dtype) * 1e-6, q, scale,
                            block_out=args.bo, chunk=args.chunk)
            return acc + y.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    bytes_per = IN * OUT + 4 * OUT + 2 * args.batch * IN  # int8 w dominates
    pairs = (("kernel", rep_kernel),) if args.skip_xla else (
        ("xla", rep_xla), ("kernel", rep_kernel))
    for name, fn in pairs:
        float(fn(x, q, scale))  # compile + warm
        t0 = time.perf_counter()
        float(fn(x, q, scale))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt * 1e3:.3f} ms/call  "
              f"{bytes_per / dt / 1e9:.0f} GB/s  (B={args.batch})",
              flush=True)


if __name__ == "__main__":
    main()
