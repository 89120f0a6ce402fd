"""Benchmark block-sparse attention vs the dense causal flash kernel.

The sparse kernel's promise is cost proportional to live tiles: a density-d
mask should run ~1/d of the dense kernel's time at equal per-tile efficiency.
This reports, per pattern, wall time, effective TFLOP/s over *live* work,
and the speedup vs dense causal — plus "sparse efficiency": achieved speedup
divided by the ideal (1/density) speedup.

Usage: python benchmarks/bench_sparse.py [--seq N] [--iters N] [--block N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_one(fn, q, k, v, iters, best_of=3):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def chained(q, k, v):
        def body(_, qq):
            return fn(qq, k, v).astype(q.dtype)
        return jnp.sum(lax.fori_loop(0, iters, body, q).astype(jnp.float32))

    float(chained(q, k, v))  # compile + warm
    best = float("inf")
    for _ in range(best_of):
        t0 = time.perf_counter()
        float(chained(q, k, v))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def bench_ring(args):
    """Ring x sparse prefill cost profile on the REAL chip: 128K global
    tokens split across --ring ranks (zigzag), streaming global mask. One
    chip cannot run the collective, but the per-(rank, step) kernels are
    exactly what each rank executes between permutes — the tables are
    rank-flattened and rank is a traced argument, so we sweep it. Reports
    per-step max-over-ranks kernel time (the SPMD step cost) and the total
    vs the dense ring's."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from long_context_attention_tpu.ops.sparse import (
        _sparse_fwd_bhsd, global_local_block_mask)
    from long_context_attention_tpu.parallel.ring_sparse import (
        _ring_step_tables)
    from long_context_attention_tpu.ops.flash import flash_attention_fwd

    b, h, hkv, d = 1, args.heads, args.kv_heads, args.head_dim
    S, W = args.seq, args.ring
    s_local = S // W
    blk = args.block
    n = S // blk
    if args.per_head:
        # SPARSE_SAGE-style per-head tuning: each head its own window width
        widths = [4 + 2 * (i % 5) for i in range(h)]
        mask = np.stack([global_local_block_mask(n, n, w, sink_tiles=1)
                         for w in widths])
    else:
        mask = global_local_block_mask(n, n, 8, sink_tiles=1)
    per_head = mask.ndim == 3
    g = h // hkv
    steps = _ring_step_tables(
        np.ascontiguousarray(mask).tobytes(), mask.shape, True, W, "zigzag",
        s_local, s_local, blk, blk, g)

    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    qb = jax.random.normal(kq, (b, h, s_local, d), jnp.bfloat16)
    kb = jax.random.normal(kk, (b, hkv, s_local, d), jnp.bfloat16)
    vb = jax.random.normal(kv, (b, hkv, s_local, d), jnp.bfloat16)
    scale = 1.0 / (d ** 0.5)

    total_sparse = 0.0
    for t in range(W):
        row_tabs, _ = steps[t]

        def one(rank):
            @jax.jit
            def chained(qb, kb, vb, r):
                def body(_, qq):
                    out, _ = _sparse_fwd_bhsd(
                        qq, kb, vb, row_tabs, per_head, scale=scale,
                        bq=blk, bkv=blk, interpret=False, rank=r, n_ranks=W)
                    return out.astype(qq.dtype)
                return jnp.sum(lax.fori_loop(0, args.iters, body, qb
                                             ).astype(jnp.float32))
            r = jnp.asarray([rank], jnp.int32)
            float(chained(qb, kb, vb, r))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(chained(qb, kb, vb, r))
                best = min(best, time.perf_counter() - t0)
            return best / args.iters

        per_rank = [one(r) for r in range(W)]
        step_cost = max(per_rank)  # SPMD: every rank waits for the slowest
        total_sparse += step_cost
        print(f"ring step {t}: per-rank ms "
              f"{['%.2f' % (x*1e3) for x in per_rank]}  "
              f"step (max) {step_cost*1e3:.2f} ms", file=sys.stderr)

    # dense ring reference: step cost = one causal position-kernel call on
    # (s_local q) x (s_local kv) — measure the diagonal (worst) step
    @jax.jit
    def dense_chain(qs, ks, vs):
        def body(_, qq):
            out, _ = flash_attention_fwd(
                jnp.swapaxes(qq, 1, 2), jnp.swapaxes(ks, 1, 2),
                jnp.swapaxes(vs, 1, 2), causal=True,
                q_offsets=jnp.asarray([0], jnp.int32),
                kv_offsets=jnp.asarray([0], jnp.int32))
            return jnp.swapaxes(out, 1, 2).astype(qq.dtype)
        return jnp.sum(lax.fori_loop(0, args.iters, body, qs
                                     ).astype(jnp.float32))

    float(dense_chain(qb, kb, vb))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(dense_chain(qb, kb, vb))
        best = min(best, time.perf_counter() - t0)
    dense_total = best / args.iters * W  # W steps per ring pass
    print(f"ring x sparse total (sum of max-rank steps): "
          f"{total_sparse*1e3:.2f} ms vs dense ring ~{dense_total*1e3:.2f} "
          f"ms -> {dense_total/total_sparse:.2f}x", file=sys.stderr)
    print(json.dumps({
        "metric": (f"ring_sparse{'_perhead' if args.per_head else ''}"
                   f"_prefill_speedup_{args.seq//1024}k_r{W}"),
        "value": round(dense_total / total_sparse, 2),
        "unit": "x dense ring",
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=131072)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--block", type=int, default=1024)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--ring", type=int, default=0,
                    help="measure the ring x sparse per-step kernels at "
                         "--seq global tokens over N ranks (real chip)")
    ap.add_argument("--per-head", action="store_true",
                    help="per-head (3-D) mask: varied window per head")
    args = ap.parse_args()
    if args.ring:
        bench_ring(args)
        return

    import jax
    import jax.numpy as jnp

    from long_context_attention_tpu.ops.flash import flash_attention
    from long_context_attention_tpu.ops.sparse import (
        block_sparse_attention,
        global_local_block_mask,
        mask_density,
        strided_block_mask,
    )

    b, s, h, hkv, d = 1, args.seq, args.heads, args.kv_heads, args.head_dim
    n = s // args.block
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, s, hkv, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, s, hkv, d), jnp.bfloat16)

    dense_dt = bench_one(
        lambda qq, kk_, vv: flash_attention(qq, kk_, vv, causal=True),
        q, k, v, args.iters)
    dense_flops = 2 * 2 * b * h * s * s * d * 0.5
    print(f"{'dense causal':28s} {dense_dt*1e3:9.2f} ms  "
          f"{dense_flops/dense_dt/1e12:7.1f} TFLOP/s", file=sys.stderr)

    patterns = {
        # StreamingLLM shape: 1 sink tile + 8-tile local band
        "stream(sink1,win8)": global_local_block_mask(n, n, 8, sink_tiles=1),
        # dilated: every 8th kv tile + 4-tile local band
        "strided(8,local4)": strided_block_mask(n, n, 8, local_tiles=4),
        # wide band: half-density window
        f"window({n//2})": global_local_block_mask(n, n, n // 2, sink_tiles=0),
    }

    rows = []
    for name, mask in patterns.items():
        dens = mask_density(mask, causal=True)
        dt = bench_one(
            lambda qq, kk_, vv, m=mask: block_sparse_attention(
                qq, kk_, vv, m, causal=True,
                block_q=args.block, block_kv=args.block),
            q, k, v, args.iters)
        live_flops = 2 * 2 * b * h * s * s * d * dens
        speedup = dense_dt / dt
        eff = speedup * dens / 0.5  # vs ideal 0.5/dens speedup over causal
        rows.append((name, dens, dt, speedup, eff))
        print(f"{name:28s} {dt*1e3:9.2f} ms  {live_flops/dt/1e12:7.1f} "
              f"live-TFLOP/s  density {dens:.3f}  {speedup:5.2f}x dense  "
              f"eff {eff:.2f}", file=sys.stderr)

    headline = rows[0]
    print(json.dumps({
        "metric": f"block_sparse_attn_speedup_{args.seq//1024}k_{headline[0]}",
        "value": round(headline[3], 2),
        "unit": "x dense causal",
        "density": round(headline[1], 4),
        "sparse_efficiency": round(headline[4], 3),
    }))


if __name__ == "__main__":
    main()
