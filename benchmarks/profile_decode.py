"""Component-level decode-step profile at serving shapes.

Times four on-device chained loops (N steps inside one jit, synced by a
reduction transfer — the tunnel methodology from docs/PERF.md) to localize
where a serving decode step's time goes:

  attn   — decode_attention only, 16 layers/step over the filled cache
  append — cache_append only, 16 layers/step (aliased in-place splice)
  matmul — the transformer skeleton (norms/QKV/RoPE/quantize/wo/FFN/lm_head)
           with attention stubbed to the query row
  full   — the real decode_step

The components overlap inside XLA (DMA vs MXU), so the sum exceeds `full`
when healthy; a component near `full` on its own is the bottleneck.

Usage: python benchmarks/profile_decode.py [--batch 8] [--ctx 32768]
       [--steps 64] [--dtype int8]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=32768)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--dtype", default="int8")
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--dim", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from long_context_attention_tpu.models.llama import (
        ModelConfig, init_params, decode_step, rmsnorm, rope, _ffn,
    )
    from long_context_attention_tpu.ops.decode import (
        cache_append, decode_attention,
    )
    from long_context_attention_tpu.ops.kv_cache import KVCache, quantize_kv
    import dataclasses as _dc

    cfg = ModelConfig(
        vocab=32000, dim=args.dim, n_layers=args.layers, n_heads=16,
        n_kv_heads=8, head_dim=args.dim // 16, ffn_hidden=int(args.dim * 2.7),
        layout="basic",
    )
    b, L = args.batch, args.layers
    h, hkv, d = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    s_max = ((args.ctx + args.steps + 4095) // 4096) * 4096
    N = args.steps
    key = jax.random.PRNGKey(0)
    params = init_params(key, cfg)

    def fresh_cache():
        c = KVCache.init(L, b, s_max, hkv, d, args.dtype)
        # mark ctx slots filled; contents are zeros (bandwidth is the same)
        return _dc.replace(c, length=jnp.full((b,), args.ctx, jnp.int32))

    def _sync(r):
        # fence via a reduction TRANSFER (tunnel methodology) of a tiny
        # slice — summing a whole int8 cache would materialize it in fp32
        leaf = jax.tree.leaves(r)[0]
        sl = leaf[(0,) * (leaf.ndim - 1)]
        float(jnp.sum(sl.astype(jnp.float32)))

    def bench(fn, *a, reps=3, **kw):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(fn(*a, **kw))
            best = min(best, time.perf_counter() - t0)
        return best / N * 1e3  # ms/step

    def bench_donating(fn, make_args, reps=3):
        # cache-donating chains consume their inputs: fresh args per rep
        best = float("inf")
        for _ in range(reps):
            a = make_args()
            t0 = time.perf_counter()
            r = fn(*a)
            _sync(r)
            best = min(best, time.perf_counter() - t0)
            del a, r
        return best / N * 1e3

    lengths = jnp.full((b,), args.ctx, jnp.int32)
    q0 = jax.random.normal(key, (b, h, d), jnp.bfloat16)
    scale = d ** -0.5

    # ---- attention-only ---------------------------------------------------
    @jax.jit
    def attn_chain(q0, kc, vc, ksc, vsc, lengths):
        def step(q, _):
            def layer(qq, li):
                return decode_attention(
                    qq, kc, vc, lengths, ksc, vsc, softmax_scale=scale,
                    layer=li), None
            q, _ = lax.scan(layer, q, jnp.arange(L))
            return q, None
        q, _ = lax.scan(step, q0, length=N)
        return q

    c = fresh_cache()
    t_attn = bench(attn_chain, q0, c.k, c.v, c.k_scale, c.v_scale, lengths)
    print(f"attn   {t_attn:8.2f} ms/step   "
          f"({2 * L * b * hkv * args.ctx * d / t_attn / 1e6:.0f} GB/s KV)",
          flush=True)
    del c

    # ---- append-only ------------------------------------------------------
    kq, ks1 = quantize_kv(jax.random.normal(key, (b, hkv, 1, d)), args.dtype)
    vq, vs1 = quantize_kv(jax.random.normal(key, (b, hkv, 1, d)), args.dtype)
    quant = ks1 is not None

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def append_chain(kc, vc, ksc, vsc, pos):
        def step(carry, _):
            def layer(cc, li):
                if quant:
                    r = cache_append(cc[0], cc[1], kq, vq, pos, cc[2], cc[3],
                                     ks1, vs1, layer=li)
                    return (r[0], r[1], r[2], r[3]), None
                r = cache_append(cc[0], cc[1], kq, vq, pos, layer=li)
                return (r[0], r[1], cc[2], cc[3]), None
            cc, _ = lax.scan(layer, carry, jnp.arange(L))
            return cc, None
        cc, _ = lax.scan(step, (kc, vc, ksc, vsc), length=N)
        return cc  # ALL donated buffers must be outputs or donation fails

    def _app_args():
        c = fresh_cache()
        return (c.k, c.v, c.k_scale, c.v_scale, lengths)

    t_app = bench_donating(append_chain, _app_args)
    print(f"append {t_app:8.2f} ms/step", flush=True)

    # ---- matmul skeleton (attention stubbed) -------------------------------
    @jax.jit
    def matmul_chain(params, tok0, pos):
        def step(tok, _):
            x = params["embed"][tok][:, None]
            def layer(xx, lp):
                hh = rmsnorm(xx, lp["attn_norm"], cfg.norm_eps)
                q = (hh @ lp["wq"]).reshape(b, 1, h, d)
                k = (hh @ lp["wk"]).reshape(b, 1, hkv, d)
                v = (hh @ lp["wv"]).reshape(b, 1, hkv, d)
                q = rope(q, pos[:, None], cfg.rope_theta)
                k = rope(k, pos[:, None], cfg.rope_theta)
                _ = quantize_kv(jnp.transpose(k, (0, 2, 1, 3)), args.dtype)
                _ = quantize_kv(jnp.transpose(v, (0, 2, 1, 3)), args.dtype)
                attn = q[:, 0]  # stub: the query row stands in for attention
                xx = xx + (attn.reshape(b, 1, cfg.q_dim)
                           @ lp["wo"]).astype(xx.dtype)
                h2 = rmsnorm(xx, lp["mlp_norm"], cfg.norm_eps)
                xx = xx + _ffn(cfg, lp, h2, full_capacity=True).astype(xx.dtype)
                return xx, None
            x, _ = lax.scan(layer, x, params["layers"])
            x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
            logits = (x[:, 0] @ params["lm_head"]).astype(jnp.float32)
            return jnp.argmax(logits, -1).astype(jnp.int32), None
        tok, _ = lax.scan(step, tok0, length=N)
        return tok

    tok0 = jnp.zeros((b,), jnp.int32)
    t_mm = bench(matmul_chain, params, tok0, lengths)
    print(f"matmul {t_mm:8.2f} ms/step", flush=True)

    # ---- full decode_step ---------------------------------------------------
    @functools.partial(jax.jit, donate_argnums=1)
    def full_chain(params, cache, tok0):
        def step(carry, _):
            cache, tok = carry
            logits, cache = decode_step(params, cache, tok, cfg)
            return (cache, jnp.argmax(logits, -1).astype(jnp.int32)), None
        (cache, tok), _ = lax.scan(step, (cache, tok0), length=N)
        # the donated cache MUST be an output or XLA copies it (OOM)
        return tok, cache

    t_full = bench_donating(full_chain,
                            lambda: (params, fresh_cache(), tok0))
    print(f"full   {t_full:8.2f} ms/step", flush=True)
    print(f"# sum(attn+append+matmul) = {t_attn + t_app + t_mm:.2f} ms; "
          f"overlap headroom = {t_attn + t_app + t_mm - t_full:.2f} ms")


if __name__ == "__main__":
    main()
