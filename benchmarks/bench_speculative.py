"""Speculative-decoding verify economics on the real chip.

Measures, with the ~1B serving model of `bench_engine.py`:
  * one single-token `decode_step` (ms/step, chained N deep)
  * one gamma+1-token `decode_multi_step` verify (ms/round, chained with a
    free rollback — ``length`` reset — between rounds so context stays put)
and reports the verify/step cost ratio R. A speculative round then emits
``accepted + 1`` tokens for R step-equivalents of target compute plus
gamma cheap draft steps, so tokens-per-target-step = (accepted + 1) / R.

Usage: python benchmarks/bench_speculative.py [--ctx 32768] [--batch 8]
       [--gamma 4] [--steps 32] [--dtype int8]
"""

import argparse
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=32768)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--gamma", type=int, default=4)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--dtype", default="int8")
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--dim", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from long_context_attention_tpu.models.llama import (
        ModelConfig, init_params, decode_step, decode_multi_step,
    )
    from long_context_attention_tpu.ops.kv_cache import KVCache

    cfg = ModelConfig(
        vocab=32000, dim=args.dim, n_layers=args.layers, n_heads=16,
        n_kv_heads=8, head_dim=args.dim // 16, ffn_hidden=int(args.dim * 2.7),
        layout="basic",
    )
    b, N, n_run = args.batch, args.steps, args.gamma + 1
    s_max = ((args.ctx + N * n_run + 4095) // 4096) * 4096
    params = init_params(jax.random.PRNGKey(0), cfg)

    def fresh_cache():
        c = KVCache.init(cfg.n_layers, b, s_max, cfg.n_kv_heads,
                         cfg.head_dim, args.dtype)
        return dataclasses.replace(
            c, length=jnp.full((b,), args.ctx, jnp.int32))

    @functools.partial(jax.jit, donate_argnums=1)
    def single_chain(params, cache, tok0):
        def step(carry, _):
            cache, tok = carry
            logits, cache = decode_step(params, cache, tok, cfg)
            return (cache, jnp.argmax(logits, -1).astype(jnp.int32)), None
        (cache, tok), _ = lax.scan(step, (cache, tok0), length=N)
        # the donated cache MUST be an output or XLA copies it (OOM)
        return tok, cache

    @functools.partial(jax.jit, donate_argnums=1)
    def verify_chain(params, cache, run0):
        base_len = cache.length  # context stays fixed: rollback every round
        def step(carry, _):
            cache, run = carry
            logits, cache = decode_multi_step(params, cache, run, cfg)
            cache = dataclasses.replace(cache, length=base_len)  # rollback
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return (cache, nxt), None
        (cache, run), _ = lax.scan(step, (cache, run0), length=N)
        return run, cache

    def bench(fn, make_args, reps=3):
        best = float("inf")
        for _ in range(reps):
            a = make_args()
            t0 = time.perf_counter()
            r = fn(*a)
            float(jnp.sum(r[0].astype(jnp.float32)))  # sync on the tokens
            best = min(best, time.perf_counter() - t0)
            del a, r
        return best / N * 1e3

    tok0 = jnp.zeros((b,), jnp.int32)
    run0 = jnp.zeros((b, n_run), jnp.int32)
    t1 = bench(single_chain, lambda: (params, fresh_cache(), tok0))
    tv = bench(verify_chain, lambda: (params, fresh_cache(), run0))
    r = tv / t1
    import json
    print(json.dumps({
        "metric": "spec_verify_cost_ratio",
        "value": round(r, 3),
        "unit": f"x one decode step (gamma={args.gamma}, b={b}, "
                f"ctx={args.ctx}, {args.dtype})",
        "single_ms": round(t1, 2), "verify_ms": round(tv, 2),
        "tokens_per_target_step_at_full_acceptance":
            round((args.gamma + 1) / r, 2),
    }))


if __name__ == "__main__":
    main()
