"""KV-cache read probe for the 32k decode fix.

decode_attention currently (a) ``transpose(0,2,1,3)``s the cache per step
— at 32k XLA materializes a full HBM copy (read + write + kernel read =
3x traffic) — and (b) streams (1, block_s, hd) = 512 KB blocks through a
(B*KV, nj) grid whose per-step overhead floor (~6-18 us, measured by the
stream_probe series) dwarfs the 0.6 us DMA of such a block.

The fix candidate mirrors the r4 ragged paged kernel: FOLD the kv heads
— read (bs, KV, hd) blocks straight off the token-major (S, KV, hd)
cache (no transpose, 4x bigger blocks, KV x fewer steps). This probe
measures that read pattern as a pure stream (k + v = 2 refs).
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

S, KV, HD = 32768, 4, 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bss", default="4096,8192,16384")
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    import jax.experimental.pallas as pl

    for bs in [int(s) for s in args.bss.split(",")]:
        nj = S // bs

        def kernel(k_ref, v_ref, t_ref, o_ref):
            row = (t_ref[...]
                   + k_ref[0, 0, :].astype(jnp.float32)[None]
                   + v_ref[0, 0, :].astype(jnp.float32)[None])
            o_ref[...] = jnp.broadcast_to(row, o_ref.shape)

        spec = pl.BlockSpec((bs, KV, HD), lambda j: (j, 0, 0))

        @jax.jit
        def rep(k, v):
            call = pl.pallas_call(
                kernel,
                grid=(nj,),
                in_specs=[spec, spec,
                          pl.BlockSpec((1, HD), lambda j: (0, 0))],
                out_specs=pl.BlockSpec((8, HD), lambda j: (j, 0)),
                out_shape=jax.ShapeDtypeStruct((nj * 8, HD), jnp.float32),
            )

            def body(i, acc):
                t = jnp.full((1, HD), i.astype(jnp.float32) * 1e-6)
                y = call(k, v, t)
                return acc + y.sum()
            return jax.lax.fori_loop(0, args.iters, body,
                                     jnp.zeros((), jnp.float32))

        k = jax.random.randint(jax.random.PRNGKey(0), (S, KV, HD), -127, 128,
                               jnp.int8)
        v = jax.random.randint(jax.random.PRNGKey(1), (S, KV, HD), -127, 128,
                               jnp.int8)
        float(rep(k, v))
        t0 = time.perf_counter()
        float(rep(k, v))
        dt = (time.perf_counter() - t0) / args.iters
        nb = 2 * S * KV * HD
        print(f"fold bs={bs} ({nj} steps): {dt * 1e3:.3f} ms/call  "
              f"{nb / dt / 1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
