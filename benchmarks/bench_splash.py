"""Measure jax's splash attention (the strongest pre-existing TPU kernel) at
the headline shapes — the honest vs_baseline denominator per VERDICT.md #1.

GQA is native: the MQA splash kernel is vmapped over kv-heads with the g
query heads of each group acting as the MQA "heads" (no KV repeat).

Usage: python benchmarks/bench_splash.py [--seq N] [--iters N] [--block N]
"""

import argparse
import time


def bench_splash(seq: int, iters: int, heads: int = 32, kv_heads: int = 8,
                 head_dim: int = 128, causal: bool = True,
                 block: int = 1024, bwd: bool = False):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    g = heads // kv_heads
    mask = sm.MultiHeadMask(
        [sm.CausalMask((seq, seq)) if causal else sm.FullMask((seq, seq))
         for _ in range(g)])
    block_sizes = sk.BlockSizes(
        block_q=min(block, seq), block_kv=min(block, seq),
        block_kv_compute=min(block, seq),
        block_q_dkv=min(block, seq), block_kv_dkv=min(block, seq),
        block_kv_dkv_compute=min(block, seq),
        block_q_dq=min(block, seq), block_kv_dq=min(block, seq),
    )
    kernel = sk.make_splash_mqa_single_device(mask=mask,
                                              block_sizes=block_sizes)
    # vmap over kv-head groups: q (h_kv, g, s, d), k/v (h_kv, s, d)
    gqa = jax.vmap(kernel, in_axes=(0, 0, 0))

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (kv_heads, g, seq, head_dim), jnp.bfloat16)
    k = jax.random.normal(kk, (kv_heads, seq, head_dim), jnp.bfloat16)
    v = jax.random.normal(kv, (kv_heads, seq, head_dim), jnp.bfloat16)

    if bwd:
        grad = jax.grad(
            lambda q, k, v: jnp.sum(gqa(q, k, v).astype(jnp.float32)),
            argnums=(0, 1, 2))

        @jax.jit
        def chained(q, k, v):
            def body(_, qq):
                dq, dk, dv = grad(qq, k, v)
                return (qq + dq.astype(qq.dtype) * 0
                        + jnp.sum(dk).astype(qq.dtype) * 0
                        + jnp.sum(dv).astype(qq.dtype) * 0)
            return jnp.sum(lax.fori_loop(0, iters, body, q
                                         ).astype(jnp.float32))
    else:
        @jax.jit
        def chained(q, k, v):
            def body(_, qq):
                return gqa(qq, k, v).astype(q.dtype)
            return jnp.sum(lax.fori_loop(0, iters, body, q
                                         ).astype(jnp.float32))

    float(chained(q, k, v))  # compile
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(chained(q, k, v))
        best = min(best, time.perf_counter() - t0)
    dt = best / iters
    frac = 0.5 if causal else 1.0
    # useful-FLOP convention (matches bench.py): fwd 2 matmuls, +bwd 5 more
    flops = 2 * 2 * heads * seq * seq * head_dim * frac * (3.5 if bwd else 1)
    return flops / dt / 1e12, dt


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=32768)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--block", type=int, default=1024)
    ap.add_argument("--no-causal", action="store_true")
    args = ap.parse_args()
    tf, dt = bench_splash(args.seq, args.iters, causal=not args.no_causal,
                          block=args.block)
    print(f"splash seq={args.seq} block={args.block} "
          f"causal={not args.no_causal}: {tf:.1f} TFLOP/s  {dt*1e3:.2f} ms")
