"""USP benchmark harness — the `benchmark/benchmark_longctx.py` analog.

Sweeps (ulysses x ring) x layout x fwd/fwd+bwd and prints iter/s + achieved
attention TFLOP/s per config, plus GQA and packed-QKV modes, mirroring the
reference's sweep drivers (`scripts/run_qkvpack_compare.sh`, `run_gqa.sh`).

On this image multi-chip hardware is absent, so mesh sweeps run on the
8-device virtual CPU mesh by default (structure/limits validation — NOT perf;
pass --tpu to run single-chip degenerate meshes on the real chip). Kernel
perf numbers come from the repo-root bench.py on the real chip.

Usage:
  python benchmarks/bench_usp.py                    # CPU-mesh sweep
  python benchmarks/bench_usp.py --tpu              # real-chip 1x1x1
  python benchmarks/bench_usp.py --seq 8192 --heads 32 --kv-heads 8
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="run on the real chip (1x1x1 mesh) instead of the "
                         "8-device CPU mesh")
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--kv-heads", type=int, default=4)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--bwd", action="store_true", help="also time fwd+bwd")
    args = ap.parse_args()

    if not args.tpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8").strip()
    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from long_context_attention_tpu.parallel import (
        LongContextAttention, make_usp_mesh, permute_for_layout)

    n_dev = len(jax.devices())
    degrees = ([(1, 1)] if args.tpu else
               [(u, r) for u in (1, 2, 4, 8) for r in (1, 2, 4, 8)
                if u * r == min(n_dev, 8) and args.kv_heads % u == 0])
    layouts = ["basic", "zigzag", "stripe"]

    b, s, h, hkv, d = (args.batch, args.seq, args.heads, args.kv_heads,
                       args.head_dim)
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kd = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, s, hkv, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, s, hkv, d), jnp.bfloat16)
    dout = jax.random.normal(kd, (b, s, h, d), jnp.bfloat16)
    flops_fwd = 2 * 2 * b * h * s * s * d * 0.5

    print(f"# devices={n_dev} platform={jax.default_backend()} "
          f"b={b} s={s} h={h}/{hkv} d={d}")
    print(f"{'ulysses':>7} {'ring':>4} {'layout':>7} {'mode':>7} "
          f"{'ms/iter':>9} {'iter/s':>8} {'TFLOP/s':>8}")

    for u, r in degrees:
        mesh = make_usp_mesh(dp=1, ulysses=u, ring=r)
        for layout in layouts:
            if layout == "zigzag" and s % (2 * r):
                continue
            layer = LongContextAttention(mesh=mesh, layout=layout)
            qp, kp, vp = (permute_for_layout(x, layout, r) for x in (q, k, v))
            modes = [("fwd", lambda: layer(qp, kp, vp, causal=True))]
            if args.bwd:
                def loss(q_, k_, v_):
                    o = layer(q_, k_, v_, causal=True)
                    return jnp.sum(o.astype(jnp.float32)
                                   * dout.astype(jnp.float32))
                g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
                modes.append(("fwd+bwd", lambda: g(qp, kp, vp)))
            for mode, fn in modes:
                jax.block_until_ready(fn())  # compile
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = fn()
                jax.block_until_ready(out)
                dt = (time.perf_counter() - t0) / args.iters
                mm = 4.5 if mode == "fwd+bwd" else 1.0
                print(f"{u:>7} {r:>4} {layout:>7} {mode:>7} "
                      f"{dt * 1e3:>9.2f} {1 / dt:>8.2f} "
                      f"{flops_fwd * mm / dt / 1e12:>8.2f}")


if __name__ == "__main__":
    main()
