"""Automatic prefix caching on the real chip: shared-system-prompt serving.

Workload: R requests sharing one long system prompt (page-aligned) with
short per-request tails and modest decode budgets — the RAG/agent shape
where prefill dominates. The plain paged batcher prefills the full prompt
per request; the prefix-caching batcher prefills it once, then each
admission reuses the shared pages and computes only its tail via chunked
multi-token decode (serving/continuous.py:_suffix_chunk).

Usage: python benchmarks/bench_prefix.py [--sys-len 16384] [--reqs 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sys-len", type=int, default=16384)
    ap.add_argument("--tail", type=int, default=64)
    ap.add_argument("--reqs", type=int, default=8)
    ap.add_argument("--max-new", type=int, default=16)
    ap.add_argument("--page", type=int, default=2048)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--dim", type=int, default=2048)
    args = ap.parse_args()

    import numpy as np

    from long_context_attention_tpu.models.llama import ModelConfig, init_params
    from long_context_attention_tpu.serving import (
        PagedContinuousEngine,
        Request,
    )
    import jax

    cfg = ModelConfig(
        vocab=32000, dim=args.dim, n_layers=args.layers, n_heads=16,
        n_kv_heads=8, head_dim=args.dim // 16, ffn_hidden=int(args.dim * 2.7),
        layout="basic",
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    system = list(rng.integers(0, cfg.vocab, args.sys_len))
    reqs = [Request(id=i,
                    tokens=system + list(rng.integers(0, cfg.vocab,
                                                      args.tail)),
                    max_new=args.max_new)
            for i in range(args.reqs)]
    prompt = args.sys_len + args.tail
    s_max = ((prompt + args.max_new + 4095) // 4096) * 4096
    # pool: 4 rows' worth of pages + the shared prefix + scratch
    pool = 4 * (s_max // args.page) + (args.sys_len // args.page) + 2

    common = dict(s_max=s_max, max_batch=4, cache_dtype="int8",
                  step_block=8, host_overlap=True, page_size=args.page,
                  pool_pages=pool)
    plain = PagedContinuousEngine(cfg, **common)
    pfx = PagedContinuousEngine(cfg, prefix_cache=True,
                                prefill_chunk=args.chunk, **common)

    for name, eng in [("plain ", plain), ("prefix", pfx)]:
        eng.serve(params, reqs[:1])  # warm compiles (incl. suffix path: the
        # second serve's first admission hits nothing — cache resets — so
        # warm the suffix path too by serving a duplicate pair
        eng.serve(params, [reqs[0], reqs[1]])
        t0 = time.perf_counter()
        res = eng.serve(params, reqs)
        wall = time.perf_counter() - t0
        got = sum(len(r.tokens) for r in res.values())
        hit = getattr(eng, "stats", {}).get("prefix_hit_tokens", 0)
        print(f"{name}: {wall:6.2f} s  {got/wall:6.1f} tok/s  "
              f"({args.reqs} reqs x {prompt}-tok prompt, "
              f"hit_tokens={hit})", flush=True)


if __name__ == "__main__":
    main()
