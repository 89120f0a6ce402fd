"""End-to-end serving benchmark: tokens/s/chip with a ~1B-param model.

The BASELINE.json north-star asks for tokens/s/chip at long context — this
drives the full Engine (chunked prefill + jitted decode loop) with a
1.3B-parameter Llama-family config on the real chip, sweeping cache dtype
(bf16 vs int8) and batch.

Usage: python benchmarks/bench_engine.py [--ctx 32768] [--batch 1 4]
       [--new 16] [--dtypes bfloat16 int8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=32768)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--new", type=int, default=16)
    ap.add_argument("--batch", type=int, nargs="+", default=[1, 4])
    ap.add_argument("--dtypes", nargs="+", default=["bfloat16", "int8"])
    ap.add_argument("--weights", default="bfloat16",
                    help="decode weight dtype: bfloat16 | int8 (w8a8)")
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--dim", type=int, default=2048)
    ap.add_argument("--window", type=int, default=-1,
                    help="Mistral-style sliding window (banded decode/prefill)")
    ap.add_argument("--sink", type=int, default=0,
                    help="StreamingLLM sink tokens (needs --window)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from long_context_attention_tpu.models.llama import ModelConfig, init_params
    from long_context_attention_tpu.serving import Engine
    from long_context_attention_tpu.serving.engine import SamplingParams

    cfg = ModelConfig(
        vocab=32000, dim=args.dim, n_layers=args.layers, n_heads=16,
        n_kv_heads=8, head_dim=args.dim // 16, ffn_hidden=int(args.dim * 2.7),
        layout="basic", window_left=args.window, sink_tokens=args.sink,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"# model: {n_params/1e9:.2f}B params, ctx={args.ctx}, "
          f"platform={jax.default_backend()}", file=sys.stderr)
    print(f"{'batch':>5} {'cache':>8} {'prefill_s':>10} {'ttft_s':>8} "
          f"{'ms/tok':>8} {'tok/s/chip':>10}")

    for b in args.batch:
        prompt = jax.random.randint(jax.random.PRNGKey(1), (b, args.ctx), 0,
                                    cfg.vocab, jnp.int32)
        for dt in args.dtypes:
            s_max = ((args.ctx + args.new + 4095) // 4096) * 4096
            eng = Engine(cfg=cfg, s_max=s_max, cache_dtype=dt,
                         weight_dtype=args.weights)
            t0 = time.perf_counter()
            logits, cache = eng.prefill_chunked(params, prompt, args.chunk)
            jax.block_until_ready(logits)
            float(jnp.sum(logits))
            prefill_s = time.perf_counter() - t0

            first = jnp.argmax(logits, -1).astype(jnp.int32)
            dparams = eng.decode_params(params)
            # _decode_scan donates the cache, and the timed run must decode
            # from the *same* post-prefill state as the compile run (ADVICE
            # r1 #4). A full jnp.copy of the cache doubles cache HBM and
            # OOMs b=8 @32K (2 x 9 GB int8) — instead re-run the (already
            # compiled) prefill to regenerate the identical cache.
            toks, cache2 = eng._decode_scan(
                dparams, cache, args.new, first, SamplingParams(),
                jax.random.PRNGKey(0))
            float(jnp.sum(toks))
            del cache, cache2
            # the regeneration is also the WARM prefill (TTFT) measurement:
            # the first prefill above paid compile through the tunnel
            t0 = time.perf_counter()
            logits2, cache = eng.prefill_chunked(params, prompt, args.chunk)
            float(jnp.sum(logits2))
            warm_prefill_s = time.perf_counter() - t0
            # fence the regenerated prefill before timing (the tunnel does
            # not reliably fence on block_until_ready; reduce-transfer does)
            float(jnp.sum(cache.length))
            jax.block_until_ready(cache.k)
            t0 = time.perf_counter()
            toks, cache3 = eng._decode_scan(
                dparams, cache, args.new, first, SamplingParams(),
                jax.random.PRNGKey(0))
            float(jnp.sum(toks))
            dt_tok = (time.perf_counter() - t0) / args.new
            print(f"{b:>5} {dt[:8]:>8} {prefill_s:>10.2f} "
                  f"{warm_prefill_s:>8.2f} "
                  f"{dt_tok*1e3:>8.2f} {b/dt_tok:>10.0f}", flush=True)
            del cache, cache3


if __name__ == "__main__":
    main()
