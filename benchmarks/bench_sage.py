"""Benchmark the INT8 quantized-MXU (Sage-role) prefill kernel vs the bf16
flash kernel at the headline shapes.

Effective TFLOP/s uses the same useful-FLOP convention as bench.py (2 matmuls
x 2*b*h*s^2*d x 0.5 causal) — the int8 path can exceed the chip's bf16 peak
because the MXU runs s8 x s8 at 2x the bf16 rate; "effective" rates measure
attention work per second, not silicon FLOPs.

Usage: python benchmarks/bench_sage.py [--seq N] [--iters N] [--no-bf16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(seq, iters, *, heads=32, kv_heads=8, head_dim=128, causal=True,
          impl="sage", pv_int8=True, best_of=3):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from long_context_attention_tpu.ops.flash import flash_attention
    from long_context_attention_tpu.ops.sage import sage_attention

    b = 1
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, seq, heads, head_dim), jnp.bfloat16)
    k = jax.random.normal(kk, (b, seq, kv_heads, head_dim), jnp.bfloat16)
    v = jax.random.normal(kv, (b, seq, kv_heads, head_dim), jnp.bfloat16)

    # NOTE: the inner fn must use chained's ARGUMENTS, not close over the
    # outer arrays — closures become HLO constants shipped through the
    # remote-compile tunnel (HTTP 413 at 128K; CLAUDE.md gotcha)
    if impl == "sage":
        def one(qq, kk_, vv):
            return sage_attention(qq, kk_, vv, causal=causal, pv_int8=pv_int8)
    else:
        def one(qq, kk_, vv):
            return flash_attention(qq, kk_, vv, causal=causal)

    @jax.jit
    def chained(q, k, v):
        def body(_, qq):
            return one(qq, k, v).astype(q.dtype)
        return jnp.sum(lax.fori_loop(0, iters, body, q).astype(jnp.float32))

    float(chained(q, k, v))  # compile + warm
    best = float("inf")
    for _ in range(best_of):
        t0 = time.perf_counter()
        float(chained(q, k, v))
        best = min(best, time.perf_counter() - t0)
    dt = best / iters
    frac = 0.5 if causal else 1.0
    flops = 2 * 2 * b * heads * seq * seq * head_dim * frac
    return flops / dt / 1e12, dt


def bench_ring_step(seq_local, iters, *, heads=32, kv_heads=8, head_dim=128,
                    impl="sage", diagonal=False, best_of=3):
    """One ring STEP at position-descriptor shapes: local q block at global
    offset q0 attending a rotated KV block at offset kv0 (both traced, like
    the ring passes them). ``diagonal`` = the self step (in-tile causal
    masking); otherwise an interior step (q strictly after kv: all tiles
    fully visible). Measures the ring x sage dispatch the reference gets
    from `ring/ring_flash_attn.py:36`."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from long_context_attention_tpu.ops.flash import flash_attention_fwd
    from long_context_attention_tpu.ops.sage import sage_attention_fwd

    b = 1
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, seq_local, heads, head_dim), jnp.bfloat16)
    k = jax.random.normal(kk, (b, seq_local, kv_heads, head_dim), jnp.bfloat16)
    v = jax.random.normal(kv, (b, seq_local, kv_heads, head_dim), jnp.bfloat16)
    q0 = jnp.asarray([seq_local if not diagonal else 0], jnp.int32)
    kv0 = jnp.asarray([0], jnp.int32)

    if impl == "sage_prequant":
        # r5 direct-int8 ring step: KV arrives PRE-quantized (rotated int8 +
        # per-token scales) and feeds the s8 MXU straight — the per-step
        # quantization VPU sweep of plain impl="sage" disappears
        from long_context_attention_tpu.ops.kv_cache import quantize_kv
        from long_context_attention_tpu.ops.sage import (
            sage_attention_fwd_prequant)

        k8, ks = quantize_kv(k, "int8")
        v8, vs = quantize_kv(v, "int8")
        ks = jnp.transpose(ks, (0, 2, 1))
        vs = jnp.transpose(vs, (0, 2, 1))

        @jax.jit
        def chained(q, k8, v8, ks, vs, q0, kv0):
            def body(_, qq):
                out, _ = sage_attention_fwd_prequant(
                    qq, k8, v8, ks, vs, causal=True,
                    q_offsets=q0, kv_offsets=kv0)
                return out.astype(q.dtype)
            return jnp.sum(lax.fori_loop(0, iters, body, q
                                         ).astype(jnp.float32))

        def run():
            return float(chained(q, k8, v8, ks, vs, q0, kv0))
    else:
        fn = sage_attention_fwd if impl == "sage" else flash_attention_fwd

        @jax.jit
        def chained(q, k, v, q0, kv0):
            def body(_, qq):
                out, _ = fn(qq, k, v, causal=True, q_offsets=q0,
                            kv_offsets=kv0)
                return out.astype(q.dtype)
            return jnp.sum(lax.fori_loop(0, iters, body, q
                                         ).astype(jnp.float32))

        def run():
            return float(chained(q, k, v, q0, kv0))

    run()
    best = float("inf")
    for _ in range(best_of):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    dt = best / iters
    frac = 0.5 if diagonal else 1.0
    flops = 2 * 2 * b * heads * seq_local * seq_local * head_dim * frac
    return flops / dt / 1e12, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=131072)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--no-bf16", action="store_true")
    ap.add_argument("--non-causal", action="store_true")
    ap.add_argument("--ring-step", action="store_true",
                    help="benchmark one ring step (position-descriptor "
                         "shapes) sage vs bf16 at --seq local tokens")
    args = ap.parse_args()
    causal = not args.non_causal

    if args.ring_step:
        for diag in (False, True):
            kind = "diagonal" if diag else "interior"
            tf_s, dt_s = bench_ring_step(args.seq, args.iters, impl="sage",
                                         diagonal=diag)
            tf_p, dt_p = bench_ring_step(args.seq, args.iters,
                                         impl="sage_prequant", diagonal=diag)
            tf_f, dt_f = bench_ring_step(args.seq, args.iters, impl="pallas",
                                         diagonal=diag)
            print(f"ring step {kind:9s} ({args.seq} local): "
                  f"sage {tf_s:6.1f} eff-TFLOP/s ({dt_s*1e3:.1f} ms)  "
                  f"sage-direct-int8 {tf_p:6.1f} ({dt_p*1e3:.1f} ms)  "
                  f"bf16 {tf_f:6.1f} ({dt_f*1e3:.1f} ms)  "
                  f"direct vs bf16 {dt_f/dt_p:.2f}x, vs sage "
                  f"{dt_s/dt_p:.2f}x", file=sys.stderr)
        print(json.dumps({"metric": f"sage_ring_step_{args.seq//1024}k",
                          "value": round(tf_p, 2), "unit": "TFLOP/s",
                          "vs_baseline": round(dt_f / dt_p, 3)}))
        return

    rows = []
    for impl, pv in (("sage", True), ("sage", False)):
        tf, dt = bench(args.seq, args.iters, causal=causal, impl=impl,
                       pv_int8=pv)
        rows.append((f"sage pv_int8={pv}", tf, dt))
        print(f"{rows[-1][0]:20s} {tf:7.1f} eff-TFLOP/s  {dt*1e3:8.2f} ms",
              file=sys.stderr)
    if not args.no_bf16:
        tf, dt = bench(args.seq, args.iters, causal=causal, impl="pallas")
        rows.append(("bf16 flash", tf, dt))
        print(f"{rows[-1][0]:20s} {tf:7.1f} TFLOP/s      {dt*1e3:8.2f} ms",
              file=sys.stderr)

    best = max(rows, key=lambda r: r[1])
    bf16 = next((r for r in rows if r[0] == "bf16 flash"), None)
    print(json.dumps({
        "metric": f"sage_attn_eff_tflops_{args.seq//1024}k"
                  f"_{'causal' if causal else 'noncausal'}_gqa",
        "value": round(rows[0][1], 2),
        "unit": "TFLOP/s",
        "vs_baseline": (round(rows[0][1] / bf16[1], 3) if bf16 else None),
    }))


if __name__ == "__main__":
    main()
