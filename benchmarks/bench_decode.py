"""Decode + TTFT benchmarks on the real chip.

Two serving-side numbers (north star, BASELINE.md):
* decode: ms/token and cache-stream GB/s vs context length and cache dtype
  (bf16 / int8 / fp8) — `python benchmarks/bench_decode.py`
* TTFT: time-to-first-token of the attention layer (prefill flash fwd) at
  128K / 512K / (1M with reduced heads: a single v5e's HBM bounds the 1M
  config; the full-head 1M point is the multi-host v5p-16 target) —
  `python benchmarks/bench_decode.py --ttft`

Timing uses on-device chaining + host-reduction sync (see bench.py: the axon
tunnel adds ~30ms per round trip and does not reliably fence on
block_until_ready).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_decode(args):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from long_context_attention_tpu.ops.decode import decode_attention
    from long_context_attention_tpu.ops.kv_cache import quantize_kv

    B, H, HKV, D = args.batch, args.heads, args.kv_heads, args.head_dim
    print(f"# decode: b={B} h={H}/{HKV} d={D} platform={jax.default_backend()}")
    print(f"{'ctx':>8} {'dtype':>6} {'ms/tok':>8} {'GB/s':>6} {'tok/s':>7}")
    for S in args.ctx:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, H, D), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, HKV, S, D), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, HKV, S, D), jnp.bfloat16)
        jax.block_until_ready(v)
        lengths = jnp.full((B,), S, jnp.int32)
        for dt in args.dtypes:
            if dt == "bfloat16":
                kc, vc, ksc, vsc, bytes_per = k, v, None, None, 2
            else:
                kc, ksc = quantize_kv(k, dt)
                vc, vsc = quantize_kv(v, dt)
                jax.block_until_ready(vc)
                bytes_per = 1.04

            @jax.jit
            def chained(q, kc, vc, ksc, vsc):
                def body(i, qq):
                    o = decode_attention(qq, kc, vc, lengths, ksc, vsc,
                                         block_kv=args.block_kv)
                    return qq * 0 + o.astype(qq.dtype)
                return jnp.sum(lax.fori_loop(0, args.iters, body, q
                                             ).astype(jnp.float32))

            float(chained(q, kc, vc, ksc, vsc))  # compile
            best = float("inf")  # best-of-3: the tunnel adds ~40% jitter
            for _ in range(3):
                t0 = time.perf_counter()
                float(chained(q, kc, vc, ksc, vsc))
                best = min(best, time.perf_counter() - t0)
            dtm = best / args.iters
            gb = 2 * B * HKV * S * D * bytes_per / 1e9
            print(f"{S:>8} {dt[:6]:>6} {dtm * 1e3:>8.2f} {gb / dtm:>6.0f} "
                  f"{B / dtm:>7.0f}", flush=True)


def bench_ttft(args):
    import jax
    import jax.numpy as jnp

    from long_context_attention_tpu.ops.flash import flash_attention

    D = args.head_dim
    print(f"# TTFT (attention prefill fwd) platform={jax.default_backend()}")
    print(f"{'ctx':>8} {'h':>3} {'hkv':>4} {'ms':>9} {'TFLOP/s':>8}")
    # (seq, h, h_kv): 1M runs with reduced heads on one v5e (HBM limit)
    for S, H, HKV in [(131072, 32, 8), (524288, 8, 2), (1048576, 4, 1)]:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (1, S, H, D), jnp.bfloat16)
        k = jax.random.normal(ks[1], (1, S, HKV, D), jnp.bfloat16)
        v = jax.random.normal(ks[2], (1, S, HKV, D), jnp.bfloat16)
        jax.block_until_ready(v)
        f = jax.jit(lambda q, k, v: jnp.sum(
            flash_attention(q, k, v, causal=True).astype(jnp.float32)))
        float(f(q, k, v))  # compile
        best = min(timeit(f, q, k, v) for _ in range(3))
        flops = 2 * 2 * H * S * S * D * 0.5
        print(f"{S:>8} {H:>3} {HKV:>4} {best * 1e3:>9.1f} "
              f"{flops / best / 1e12:>8.1f}", flush=True)
        del q, k, v  # free before the next (larger) shape allocates


def timeit(f, *xs):
    t0 = time.perf_counter()
    float(f(*xs))
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ttft", action="store_true")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--block-kv", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--ctx", type=int, nargs="+", default=[65536])
    ap.add_argument("--dtypes", nargs="+",
                    default=["bfloat16", "int8"],
                    choices=["bfloat16", "int8", "float8_e4m3fn"])
    args = ap.parse_args()
    if args.ttft:
        bench_ttft(args)
    else:
        bench_decode(args)


if __name__ == "__main__":
    main()
