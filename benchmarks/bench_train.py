"""End-to-end training throughput: 0.88B llama-family model, single chip.

Measures ms/step, tokens/s/chip, and MFU (6ND convention — parameter
FLOPs only, so recompute under remat counts against MFU) across sequence
lengths and remat policies. The r5 ``remat="attn"`` policy saves the ring
attention's (out, lse) through jax.checkpoint so the backward recompute
skips the attention kernel (parallel/ring.py:_ring_vjp_fwd).

CLAUDE.md compile-lottery note applies: the axon remote compiler
occasionally deals a 4-11x slower schedule for the same jit — if a number
looks wrong, re-run in a fresh process before believing it.

Usage: python benchmarks/bench_train.py [--seqs 8192 32768]
       [--remats full attn] [--steps 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", type=int, nargs="+", default=[8192, 32768])
    ap.add_argument("--remats", nargs="+", default=["full", "attn"])
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--dim", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=16)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from long_context_attention_tpu.models.llama import (
        ModelConfig, init_params, make_train_step,
    )
    from long_context_attention_tpu.parallel import make_usp_mesh

    base = ModelConfig(vocab=32000, dim=args.dim, n_layers=args.layers,
                       n_heads=16, n_kv_heads=8, head_dim=args.dim // 16,
                       ffn_hidden=int(args.dim * 2.7), layout="basic")
    mesh = make_usp_mesh(1, 1, 1, devices=jax.devices()[:1])
    opt = optax.adamw(1e-4)
    peak = 197e12  # v5e bf16

    params0 = init_params(jax.random.PRNGKey(0), base)
    n_params = sum(x.size for x in jax.tree.leaves(params0))
    print(f"# {n_params / 1e9:.2f}B params, {args.layers}L dim {args.dim}, "
          f"b=1, single v5e", flush=True)
    del params0

    for remat in args.remats:
        cfg = dataclasses.replace(base, remat=remat)
        step = make_train_step(cfg, mesh, opt)
        for s in args.seqs:
            params = init_params(jax.random.PRNGKey(0), cfg)
            state = opt.init(params)
            tok = jax.random.randint(jax.random.PRNGKey(1), (1, s), 0,
                                     cfg.vocab, jnp.int32)
            lab = jnp.roll(tok, -1, axis=1)
            msk = jnp.ones_like(tok, jnp.float32)
            try:
                params, state, loss = step(params, state, tok, lab, msk)
                float(loss)  # compile + warm
                best = float("inf")
                for _ in range(args.steps):
                    t0 = time.perf_counter()
                    params, state, loss = step(params, state, tok, lab, msk)
                    float(loss)
                    best = min(best, time.perf_counter() - t0)
                flops = 6 * s * n_params
                print(f"remat={remat:<5} seq={s:>6}: {best * 1e3:7.1f} "
                      f"ms/step  {s / best:8.0f} tok/s  "
                      f"{flops / best / 1e12:5.1f} TFLOP/s (6ND) "
                      f"= {flops / best / peak * 100:4.1f}% MFU",
                      flush=True)
            except Exception as e:
                msg = str(e)
                hint = ("  [HTTP 500 from the remote-compile helper is "
                        "usually a MASKED HBM OOM — the 'Used X of 15.75G "
                        "hbm' detail only appears on the raw stderr ERROR "
                        "stream when the jit runs outside a try/except]"
                        if "HTTP 500" in msg else "")
                print(f"remat={remat:<5} seq={s:>6}: FAILED "
                      f"{type(e).__name__}: {msg[:120]}{hint}", flush=True)
            del params, state


if __name__ == "__main__":
    main()
