"""1M-token single-chip StreamingLLM capability demo (VERDICT r3 #9).

Full flagship attention shapes — 32 q-heads / 8 kv-heads, head_dim 128 — at
ONE MILLION tokens of context on a single v5e, which dense attention cannot
do at this head count (q + out alone are 16 GB). The StreamingLLM attention
shape (sink + sliding window, arXiv:2309.17453) makes it feasible via the
r4 BANDED kv grids: both the prefill kernel (`ops/flash.py _banded_gt`)
and `decode_attention` iterate only the sink tiles + each query's window
band, so windowed-attention cost is proportional to the window, not the
context (a masked grid over the full 1M kv paid ~1000 dead steps per q
tile — 11.8 s TTFT before banding). Prefill runs q chunk-by-chunk against
the resident 1M-token KV (4 GB bf16) with ONE kernel call per chunk; the
8 GB full `out` is never materialized (each chunk's out feeds the next
layer in a real model; here it reduces).

Prints TTFT (chunked windowed prefill over all 1M tokens) and decode
ms/token at 1M context.

Usage: python benchmarks/bench_streaming_1m.py [--seq 1048576]
       [--window 8192] [--sink 128] [--chunk 65536]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=1048576)
    ap.add_argument("--window", type=int, default=8192)
    ap.add_argument("--sink", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=65536)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--decode-iters", type=int, default=2000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from long_context_attention_tpu.ops.decode import decode_attention
    from long_context_attention_tpu.ops.flash import flash_attention_fwd

    S, W, SINK, C = args.seq, args.window, args.sink, args.chunk
    H, HKV, D = args.heads, args.kv_heads, args.head_dim
    n_chunks = S // C
    print(f"# StreamingLLM @ {S} tokens, {H}/{HKV} heads d={D}, "
          f"window {W} + sink {SINK}, chunk {C} "
          f"({jax.devices()[0].device_kind})", file=sys.stderr)

    kk, kv = jax.random.split(jax.random.PRNGKey(0))
    k = jax.random.normal(kk, (1, S, HKV, D), jnp.bfloat16)
    v = jax.random.normal(kv, (1, S, HKV, D), jnp.bfloat16)
    jax.block_until_ready(v)

    @jax.jit
    def prefill(k, v):
        def body(i, acc):
            # per-chunk q generated on the fly (holding the full 8 GB q is
            # exactly what this attention shape avoids; a real model's
            # chunked prefill produces q chunk-by-chunk the same way)
            qc = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(1), i),
                                   (1, C, H, D), jnp.bfloat16)
            q0 = i * C
            # ONE call against the full resident kv: the kernel's banded kv
            # grid (r4, ops/flash.py _banded_gt) iterates only the sink
            # tiles + each q tile's window band — no slicing, no dead steps
            out, _ = flash_attention_fwd(
                qc, k, v, causal=True, window_size=(W, -1),
                sink_tokens=SINK,
                q_offsets=q0[None].astype(jnp.int32),
                kv_offsets=jnp.zeros((1,), jnp.int32))
            return acc + jnp.sum(out.astype(jnp.float32))
        return lax.fori_loop(0, n_chunks, body, 0.0)

    t0 = time.perf_counter()
    float(prefill(k, v))  # compile + run
    cold = time.perf_counter() - t0
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(prefill(k, v))
        best = min(best, time.perf_counter() - t0)
    vis = min(W + SINK, S)  # useful visible columns per row
    flops = 2 * 2 * H * S * vis * D
    print(f"TTFT (attn prefill, warm): {best:.2f} s  "
          f"({flops / best / 1e12:.1f} useful-TFLOP/s on ~{vis}-wide rows; "
          f"cold incl. compile {cold:.1f} s)", flush=True)

    # decode at full 1M context: decode_attention's BANDED grid (r4)
    # iterates only the sink tiles + the window band — one kernel call on
    # the full cache, cost independent of s_max
    kc = jnp.transpose(k, (0, 2, 1, 3))
    vc = jnp.transpose(v, (0, 2, 1, 3))
    q1 = jax.random.normal(jax.random.PRNGKey(2), (1, H, D), jnp.bfloat16)
    lens = jnp.full((1,), S, jnp.int32)

    @jax.jit
    def dec(q, kc, vc):
        def body(i, qq):
            o = decode_attention(qq, kc, vc, lens, window_size=(W, -1),
                                 sink_tokens=SINK)
            return qq * 0 + o.astype(qq.dtype)
        return jnp.sum(lax.fori_loop(0, args.decode_iters, body, q
                                     ).astype(jnp.float32))

    float(dec(q1, kc, vc))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(dec(q1, kc, vc))
        best = min(best, time.perf_counter() - t0)
    ms = best / args.decode_iters * 1e3
    stream_gb = 2 * HKV * (W + SINK) * D * 2 / 1e9
    print(f"decode @ {S} ctx: {ms:.3f} ms/token "
          f"({stream_gb / (ms / 1e3):.0f} GB/s over the {W + SINK}-token "
          f"window+sink band — the banded kernel grid)", flush=True)


if __name__ == "__main__":
    main()
