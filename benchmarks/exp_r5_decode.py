"""Round-5 decode-bandwidth experiments (VERDICT r4 item 1).

Sweeps the int8 decode kernel across softmax form (max-free vs online) and
block_kv, against the bf16 kernel as the proven-ceiling control (~745 GB/s).
Deep-chained timing per CLAUDE.md methodology (tunnel RTT amortized, best-of-3).

Usage: python benchmarks/exp_r5_decode.py [--ctx 32768] [--iters 100]
"""

import argparse
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=32768)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 8])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from long_context_attention_tpu.ops.decode import decode_attention
    from long_context_attention_tpu.ops.kv_cache import quantize_kv

    H, HKV, D = 32, 8, 128
    ctx = args.ctx

    def run(batch, dtype, bkv, safe, mxu=True, iters=None):
        iters = iters or args.iters
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (batch, H, D), jnp.bfloat16)
        k = jax.random.normal(ks[1], (batch, HKV, ctx, D), jnp.bfloat16)
        v = jax.random.normal(ks[2], (batch, HKV, ctx, D), jnp.bfloat16)
        if dtype == "int8":
            kc, ksc = quantize_kv(k, "int8")
            vc, vsc = quantize_kv(v, "int8")
            bpe = 1.04
        else:
            kc, vc, ksc, vsc = k, v, None, None
            bpe = 2.0
        del k, v
        lengths = jnp.full((batch,), ctx, jnp.int32)

        @jax.jit
        def chained(q, kc, vc, ksc, vsc):
            def body(i, qq):
                o = decode_attention(qq, kc, vc, lengths, ksc, vsc,
                                     block_kv=bkv, safe_softmax=safe,
                                     mxu_int8=mxu)
                return qq * 0 + o.astype(qq.dtype)
            return jnp.sum(lax.fori_loop(0, iters, body, q).astype(jnp.float32))

        float(chained(q, kc, vc, ksc, vsc))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(q, kc, vc, ksc, vsc))
            best = min(best, time.perf_counter() - t0)
        dt = best / iters
        gbps = 2 * batch * HKV * ctx * D * bpe / 1e9 / dt
        return dt * 1e3, gbps

    print(f"# decode sweep ctx={ctx} h={H}/{HKV} d={D} "
          f"iters={args.iters}", flush=True)
    for b in args.batches:
        for dtype, bkvs in (("int8", (4096, 8192, 16384)),
                            ("bf16", (4096, 8192))):
            for bkv in bkvs:
                for safe in (False, True):
                    ms, gbps = run(b, dtype, bkv, safe)
                    tag = "online " if safe else "maxfree"
                    print(f"b={b} {dtype} bkv={bkv:>5} {tag}: "
                          f"{ms:7.3f} ms  {gbps:6.1f} GB/s", flush=True)
        # int8 with the dequant-cast path (mxu_int8=False) as a reference
        ms, gbps = run(b, "int8", 4096, False, mxu=False)
        print(f"b={b} int8 bkv= 4096 maxfree dequant-cast: "
              f"{ms:7.3f} ms  {gbps:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
