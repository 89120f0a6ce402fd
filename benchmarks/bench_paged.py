"""Paged vs dense serving on the real chip.

Two measurements with the ~1B model:

1. kernel overhead — chained decode-attention over a paged pool (page
   2048) vs the dense cache at the same batch/context: the price of
   page-granular DMA.
2. the concurrency win — mixed-length requests served by the dense
   batcher at the biggest batch its cache fits vs the paged batcher at
   2x the rows from a pool of the same HBM footprint: aggregate tok/s.

``--stall`` adds a third measurement: the inter-token stall a RUNNING row
suffers while a long prompt is admitted mid-stream, batch admission vs
``interleave_admission=True`` (chunked prefill with decode blocks between
chunks) — the running row's max token gap should drop from ~whole-prompt
prefill latency to ~one chunk.

Usage: python benchmarks/bench_paged.py [--ctx 32768] [--page 2048] [--stall]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=32768)
    ap.add_argument("--page", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--dim", type=int, default=2048)
    ap.add_argument("--skip-e2e", action="store_true")
    ap.add_argument("--stall", action="store_true",
                    help="measure admission-induced inter-token stall")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from long_context_attention_tpu.models.llama import ModelConfig, init_params
    from long_context_attention_tpu.ops.decode import decode_attention
    from long_context_attention_tpu.ops.kv_cache import KVCache, PagedKVCache
    from long_context_attention_tpu.serving import (
        ContinuousEngine,
        PagedContinuousEngine,
        Request,
    )

    cfg = ModelConfig(
        vocab=32000, dim=args.dim, n_layers=args.layers, n_heads=16,
        n_kv_heads=8, head_dim=args.dim // 16, ffn_hidden=int(args.dim * 2.7),
        layout="basic",
    )
    L, HKV, D, H = args.layers, 8, args.dim // 16, 16
    B, N = 8, args.steps
    s_max = ((args.ctx + 4095) // 4096) * 4096
    n_pages = s_max // args.page
    key = jax.random.PRNGKey(0)
    lengths = jnp.full((B,), args.ctx, jnp.int32)
    q0 = jax.random.normal(key, (B, H, D), jnp.bfloat16)

    def bench_chain(cache_args, page_table=None):
        # cache arrays are jit ARGUMENTS — closing over them ships them as
        # HLO constants through the remote-compile tunnel (CLAUDE.md)
        @jax.jit
        def chain(q0, kc, vc, ksc, vsc, pt):
            def step(q, _):
                def layer(qq, li):
                    o = decode_attention(qq, kc, vc, lengths, ksc, vsc,
                                         layer=li, page_table=pt)
                    return o.astype(jnp.bfloat16), None
                q, _ = lax.scan(layer, q, jnp.arange(L))
                return q, None
            q, _ = lax.scan(step, q0, length=N)
            return q
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = chain(q0, *cache_args, page_table)
            float(jnp.sum(r.astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        return best / N * 1e3

    # dense cache at b=8
    dense = KVCache.init(L, B, s_max, HKV, D, "int8")
    t_d = bench_chain((dense.k, dense.v, dense.k_scale, dense.v_scale))
    del dense

    # paged pool with exactly the rows' pages (same bytes) + scratch
    pool_pages = B * n_pages + 1
    paged = PagedKVCache.init(L, B, pool_pages, args.page, n_pages, HKV, D,
                              "int8")
    pt = np.arange(1, pool_pages).reshape(B, n_pages).astype(np.int32)
    import dataclasses as _dc
    paged = _dc.replace(paged, page_table=jnp.asarray(pt),
                        length=lengths)
    t_p = bench_chain((paged.k, paged.v, paged.k_scale, paged.v_scale),
                      paged.page_table)
    gb = 2 * L * B * HKV * args.ctx * D
    print(f"attn dense b={B} @{args.ctx}: {t_d:6.2f} ms/step "
          f"({gb/t_d/1e6:.0f} GB/s)")
    print(f"attn paged b={B} @{args.ctx}: {t_p:6.2f} ms/step "
          f"({gb/t_p/1e6:.0f} GB/s, page {args.page})", flush=True)
    del paged

    if args.stall:
        # --- admission stall: running row's max inter-token gap ------------
        import dataclasses as _dc2

        params = init_params(jax.random.PRNGKey(0), cfg)
        times: list = []

        @_dc2.dataclass(frozen=True)
        class _Timed(PagedContinuousEngine):
            def _step(self, *a, **kw):
                nxt, cache = PagedContinuousEngine._step(self, *a, **kw)
                np.asarray(nxt)  # sync: timestamp = real token emission
                times.append(time.perf_counter())
                return nxt, cache

        rng = np.random.default_rng(0)
        long_prompt = list(rng.integers(0, cfg.vocab, args.ctx))
        # rows fill at t=0; req1 finishes fast, then req2's LONG prompt
        # admits while req0 is still decoding — the stall under test
        # req0 must OUTLIVE req2's whole admission (ctx/prefill_chunk
        # chunks, one per scheduler iteration) so every measured gap is a
        # genuinely-running row's stall, not req2's own TTFT tail
        reqs = [Request(id=0, tokens=list(rng.integers(0, cfg.vocab, 2048)),
                        max_new=24 + args.ctx // 256),
                Request(id=1, tokens=list(rng.integers(0, cfg.vocab, 1024)),
                        max_new=4),
                Request(id=2, tokens=long_prompt, max_new=4)]
        s_cap = ((args.ctx + 8191) // 4096) * 4096
        pool = (3 * s_cap) // args.page + 1
        for name, inter in [("batch admission", False),
                            ("interleaved    ", True)]:
            eng = _Timed(cfg, s_max=s_cap, max_batch=2, cache_dtype="int8",
                         page_size=args.page, pool_pages=pool,
                         interleave_admission=inter, prefill_chunk=256)
            eng.serve(params, reqs)  # warm compiles
            times.clear()
            eng.serve(params, reqs)
            gaps = np.diff(np.asarray(times)) * 1e3
            print(f"stall {name}: max inter-token gap "
                  f"{gaps.max():7.1f} ms  (median {np.median(gaps):5.1f} ms, "
                  f"{args.ctx}-tok prompt admitted mid-stream)", flush=True)

    if args.skip_e2e:
        return

    # --- end-to-end: SHORT contexts, equal cache HBM, 4x the rows ----------
    # At long context the KV stream scales per-row, so more rows do not
    # raise tok/s (total KV bytes = sum over requests of tokens x ctx,
    # batching-independent) — paging's wins there are CAPACITY and queue
    # latency. Throughput wins appear where the WEIGHT stream dominates:
    # short contexts, where dense b is capped by s_max-sized reservations
    # but the paged pool holds 4x the rows in the same bytes.
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ctxs = [int(c) for c in rng.choice([1024, 2048], 48)]
    reqs = [Request(id=i,
                    tokens=list(rng.integers(0, cfg.vocab, c)),
                    max_new=64)
            for i, c in enumerate(ctxs)]
    s_cap = 16384  # dense engines reserve this per row (the long-tail SLA)
    dense_eng = ContinuousEngine(cfg, s_max=s_cap, max_batch=8,
                                 cache_dtype="int8", step_block=8,
                                 host_overlap=True)
    # same cache bytes as dense b=8, but short requests need only 1-2 pages
    pool = (8 * s_cap) // args.page + 1
    paged_eng = PagedContinuousEngine(cfg, s_max=s_cap, max_batch=32,
                                      cache_dtype="int8", step_block=8,
                                      host_overlap=True,
                                      page_size=args.page, pool_pages=pool)
    for name, eng in [("dense b=8 ", dense_eng), ("paged b=32", paged_eng)]:
        eng.serve(params, reqs[:2])  # warm compiles
        t0 = time.perf_counter()
        res = eng.serve(params, reqs)
        wall = time.perf_counter() - t0
        got = sum(len(r.tokens) for r in res.values())
        print(f"e2e {name}: {wall:6.1f} s  {got/wall:6.0f} tok/s "
              f"({got} tokens)", flush=True)

    # sharded-paged machinery on real hardware (r5): a 1-device mesh runs
    # the partitioned pool + shard_map paths with degenerate collectives —
    # proves the multi-chip paged engine's device programs compile and
    # stream on a real chip (multi-chip hardware absent on this image)
    from long_context_attention_tpu.parallel.mesh import make_usp_mesh
    from long_context_attention_tpu.serving import (
        ShardedPagedContinuousEngine,
    )

    mesh1 = make_usp_mesh(1, 1, 1, devices=jax.devices()[:1])
    sp_eng = ShardedPagedContinuousEngine(
        cfg, s_max=s_cap, max_batch=32, cache_dtype="int8", step_block=8,
        mesh=mesh1, page_size=args.page, pool_pages=pool)
    sp_eng.serve(params, reqs[:2])
    t0 = time.perf_counter()
    res = sp_eng.serve(params, reqs)
    wall = time.perf_counter() - t0
    got = sum(len(r.tokens) for r in res.values())
    print(f"e2e sharded-paged (1-chip mesh) b=32: {wall:6.1f} s  "
          f"{got/wall:6.0f} tok/s ({got} tokens)", flush=True)


if __name__ == "__main__":
    main()
