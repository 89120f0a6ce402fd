"""Continuous-batching throughput: sequential vs host-overlapped scheduler.

Serves M requests through a fixed decode batch and reports wall-clock
tokens/s for (step_block, host_overlap) combinations. On this image the
host round trip is ~30 ms through the axon tunnel, so the overlap win is
exaggerated vs a local chip — but the structure (device never idles on
host bookkeeping) is what production serving needs either way.

Usage: python benchmarks/bench_continuous.py [--requests 24] [--ctx 1024]
       [--new 48] [--batch 8] [--dtype int8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=24)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--new", type=int, default=48)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="int8")
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--dim", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from long_context_attention_tpu.models.llama import ModelConfig, init_params
    from long_context_attention_tpu.serving import ContinuousEngine, Request

    cfg = ModelConfig(
        vocab=32000, dim=args.dim, n_layers=args.layers, n_heads=16,
        n_kv_heads=8, head_dim=args.dim // 16, ffn_hidden=int(args.dim * 2.7),
        layout="basic",
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    s_max = ((args.ctx + args.new + 4095) // 4096) * 4096
    reqs = [
        Request(id=i,
                tokens=list(np.asarray(jax.random.randint(
                    jax.random.PRNGKey(i), (args.ctx - (i % 7),), 0,
                    cfg.vocab))),
                max_new=args.new - (i % 5))
        for i in range(args.requests)
    ]
    total_tokens = sum(r.max_new for r in reqs)
    print(f"# {args.requests} requests, ~{args.ctx} ctx, {total_tokens} "
          f"decode tokens total, max_batch={args.batch}", file=sys.stderr)
    print(f"{'step_block':>10} {'overlap':>8} {'wall_s':>8} {'tok/s':>8}")

    baseline = None
    for blk, ovl in [(1, False), (1, True), (4, False), (4, True),
                     (8, True)]:
        eng = ContinuousEngine(cfg, s_max=s_max, max_batch=args.batch,
                               cache_dtype=args.dtype, step_block=blk,
                               host_overlap=ovl)
        # warm: compile prefill buckets + step
        eng.serve(params, reqs[:2])
        t0 = time.perf_counter()
        results = eng.serve(params, reqs)
        wall = time.perf_counter() - t0
        got = sum(len(r.tokens) for r in results.values())
        if baseline is None:
            baseline = results
        else:
            for i in results:
                assert results[i].tokens == baseline[i].tokens, i
        print(f"{blk:>10} {str(ovl):>8} {wall:>8.2f} {got/wall:>8.0f}",
              flush=True)


if __name__ == "__main__":
    main()
