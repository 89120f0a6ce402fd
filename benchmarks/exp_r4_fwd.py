"""Round-4 forward-kernel experiments: close the VPU-softmax / MXU gap.

The 128K headline has been flat at ~132 TFLOP/s (67% of v5e bf16 peak) for two
rounds. docs/PERF.md names the cause: per 1024x1024 tile, ~5M fp32 VPU ops
(scale-mult, row-max, sub, exp2, row-sum, casts) serialize against ~2.7us of
MXU work. This harness measures kernel VARIANTS attacking that:

  fold   — fold scale*log2e into q OUTSIDE the kernel (saves 1M fp32 mults/tile)
  bf16   — exp2 in bf16 (packed VPU, existing opt-in exp_bf16)
  qsub=N — split the q tile into N row-bands, each with its own online-softmax
           state: zero extra VPU work, but band i+1's QK matmul is independent
           of band i's exp/softmax, so Mosaic's scheduler can overlap MXU and
           VPU across bands (the VERDICT r3 "sub-tiling" lever, on the q axis
           where it costs nothing instead of the kv axis where it adds
           rescales).

Usage: python benchmarks/exp_r4_fwd.py [--seq 131072] [--iters 4] [--reps 3]
       [--check-only]
"""

import argparse
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(-1e30)
_LOG2E = math.log2(math.e)
_LN2 = math.log(2.0)


def _variant_kernel(iq_tab_ref, ik_tab_ref, q_ref, k_ref, v_ref,
                    out_ref, lse_ref, *scratch,
                    bq, fold, bf16, qsub, smode):
    """Tri-grid causal forward, variant-parameterized.

    smode: 'online' (running max), 'nomax' (p = exp2(s) raw — fp32 range
    carries it for |score| < ~87), 'clamp' (p = exp2(min(s, CAP)) — overflow-
    safe; underflow rows fall to the dead-row guard).
    """
    idx = pl.program_id(2)
    iq = iq_tab_ref[idx]
    ik = ik_tab_ref[idx]
    sub = bq // qsub
    # scratch: per-band (m, l, acc)
    m_scr, l_scr, acc_scr = scratch

    @pl.when(ik == 0)
    def _init():
        if smode == "online":
            m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def band(i, masked):
        r0 = i * sub
        q = q_ref[0, 0, r0:r0 + sub, :]
        k = k_ref[0, 0, :, :]
        v = v_ref[0, 0, :, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if not fold:
            s = s * (1.0 / math.sqrt(q_ref.shape[-1]) * _LOG2E)
        if masked:
            rows = r0 + jax.lax.broadcasted_iota(jnp.int32, (sub, bq), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (sub, bq), 1)
            mask = cols > rows
            s = jnp.where(mask, NEG_INF, s)

        if smode != "online":
            if smode == "clamp":
                s = jnp.minimum(s, 80.0)
            if bf16:
                p = jnp.exp2(s.astype(jnp.bfloat16))
                psum_row = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
                pv = p
            else:
                p = jnp.exp2(s)
                psum_row = jnp.sum(p, axis=1, keepdims=True)
                pv = p.astype(v.dtype)
            l_scr[r0:r0 + sub, :1] = l_scr[r0:r0 + sub, :1] + psum_row
            acc_scr[r0:r0 + sub, :] = acc_scr[r0:r0 + sub, :] + jax.lax.dot(
                pv, v, preferred_element_type=jnp.float32)
            return

        m_prev = m_scr[r0:r0 + sub, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        if bf16:
            p = jnp.exp2((s - m_new).astype(jnp.bfloat16))
            if masked:
                p = jnp.where(mask, jnp.bfloat16(0.0), p)
            psum_row = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
            pv = p
        else:
            p = jnp.exp2(s - m_new)
            if masked:
                p = jnp.where(mask, 0.0, p)
            psum_row = jnp.sum(p, axis=1, keepdims=True)
            pv = p.astype(v.dtype)
        alpha = jnp.exp2(m_prev - m_new)
        l_new = l_scr[r0:r0 + sub, :1] * alpha + psum_row
        acc_scr[r0:r0 + sub, :] = acc_scr[r0:r0 + sub, :] * alpha + jax.lax.dot(
            pv, v, preferred_element_type=jnp.float32)
        m_scr[r0:r0 + sub, :] = jnp.broadcast_to(m_new, (sub, m_scr.shape[1]))
        l_scr[r0:r0 + sub, :] = jnp.broadcast_to(l_new, (sub, l_scr.shape[1]))

    @pl.when(ik < iq)
    def _():
        for i in range(qsub):
            band(i, masked=False)

    @pl.when(ik == iq)
    def _():
        for i in range(qsub):
            band(i, masked=True)

    @pl.when(ik == iq)
    def _emit():
        l = l_scr[:, :1]
        if smode == "online":
            out_ref[...] = (acc_scr[...] / l).astype(out_ref.dtype
                                                     ).reshape(out_ref.shape)
            lse_ref[...] = (m_scr[:, :1] * _LN2 + jnp.log(l)
                            ).reshape(lse_ref.shape)
        else:
            dead = l == 0.0
            safe_l = jnp.where(dead, 1.0, l)
            out_ref[...] = jnp.where(dead, 0.0, acc_scr[...] / safe_l
                                     ).astype(out_ref.dtype
                                              ).reshape(out_ref.shape)
            lse_ref[...] = jnp.where(dead, -jnp.inf, jnp.log(safe_l)
                                     ).reshape(lse_ref.shape)


def _tri_decode(idx):
    """linear step -> (iq, ik) on the triangular grid, arithmetically:
    iq = floor((sqrt(8 idx + 1) - 1)/2), exact after a +-1 fix-up. f32 sqrt
    is exact enough up to ~2M steps (2M tokens at bq=1024) — no SMEM tables,
    so no ~370K-token cap and flat compile time."""
    rf = jnp.sqrt(8.0 * idx.astype(jnp.float32) + 1.0)
    r = ((rf - 1.0) * 0.5).astype(jnp.int32)
    r = jnp.where(r * (r + 1) // 2 > idx, r - 1, r)
    r = jnp.where((r + 1) * (r + 2) // 2 <= idx, r + 1, r)
    ik = idx - r * (r + 1) // 2
    return r, ik


def _variant_kernel_sqrt(q_ref, k_ref, v_ref, out_ref, lse_ref, *scratch,
                         bq, fold, bf16, qsub, smode):
    idx = pl.program_id(2)
    iq, ik = _tri_decode(idx)

    class _Tab:
        def __getitem__(self, _):
            return iq

    class _TabK:
        def __getitem__(self, _):
            return ik

    _variant_kernel(_Tab(), _TabK(), q_ref, k_ref, v_ref, out_ref, lse_ref,
                    *scratch, bq=bq, fold=fold, bf16=bf16, qsub=qsub,
                    smode=smode)


def tri_fwd(q, k, v, *, bq=1024, bkv=None, fold=False, bf16=False, qsub=1,
            smode="online", sqrt_decode=False):
    """q (b,h,s,d) BHSD causal self-attention, variant tri kernel."""
    b, h, s, d = q.shape
    h_kv = k.shape[1]
    g = h // h_kv
    if fold:
        q = (q.astype(jnp.float32) * (1.0 / math.sqrt(d) * _LOG2E)
             ).astype(q.dtype)
    nq = s // bq
    tri = nq * (nq + 1) // 2
    if sqrt_decode:
        def qi(ib, ih, idx):
            return (ib, ih, _tri_decode(idx)[0], 0)

        def kvi(ib, ih, idx):
            return (ib, ih // g, _tri_decode(idx)[1], 0)

        def lsei(ib, ih, idx):
            return (ib * h + ih, _tri_decode(idx)[0], 0, 0)

        out, lse = pl.pallas_call(
            functools.partial(_variant_kernel_sqrt, bq=bq, fold=fold,
                              bf16=bf16, qsub=qsub, smode=smode),
            grid=(b, h, tri),
            in_specs=[
                pl.BlockSpec((1, 1, bq, d), qi),
                pl.BlockSpec((1, 1, bq, d), kvi),
                pl.BlockSpec((1, 1, bq, d), kvi),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, bq, d), qi),
                pl.BlockSpec((1, 1, 1, bq), lsei),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
                jax.ShapeDtypeStruct((b * h, s // bq, 1, bq), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * h * s * s * d,
                bytes_accessed=q.size * 2 + k.size * 4,
                transcendentals=b * h * s * s // 2,
            ),
        )(q, k, v)
        return out, lse.reshape(b, h, s)

    iq_tab = jnp.asarray(np.repeat(np.arange(nq), np.arange(1, nq + 1)), jnp.int32)
    ik_tab = jnp.asarray(np.concatenate([np.arange(i + 1) for i in range(nq)]),
                         jnp.int32)

    def qi(ib, ih, idx, iq_t, ik_t):
        return (ib, ih, iq_t[idx], 0)

    def kvi(ib, ih, idx, iq_t, ik_t):
        return (ib, ih // g, ik_t[idx], 0)

    def lsei(ib, ih, idx, iq_t, ik_t):
        return (ib * h + ih, iq_t[idx], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, h, tri),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), qi),
            pl.BlockSpec((1, 1, bq, d), kvi),
            pl.BlockSpec((1, 1, bq, d), kvi),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), qi),
            pl.BlockSpec((1, 1, 1, bq), lsei),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        functools.partial(_variant_kernel, bq=bq, fold=fold, bf16=bf16,
                          qsub=qsub, smode=smode),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, s // bq, 1, bq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * s * s * d,
            bytes_accessed=q.size * 2 + k.size * 4,
            transcendentals=b * h * s * s // 2,
        ),
    )(iq_tab, ik_tab, q, k, v)
    return out, lse.reshape(b, h, s)


VARIANTS = [
    ("fold+clamp", dict(fold=True, smode="clamp")),
    ("fold+clamp+sqrt", dict(fold=True, smode="clamp", sqrt_decode=True)),
]


def check(args):
    """Correctness at small seq vs the production kernel."""
    from long_context_attention_tpu.ops.flash import flash_attention
    b, s, hq, hkv, d = 1, 8192, 8, 2, 128
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, s, hq, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, s, hkv, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, s, hkv, d), jnp.bfloat16)
    ref = flash_attention(q, k, v, causal=True)
    qb = jnp.swapaxes(q, 1, 2)
    kb = jnp.swapaxes(k, 1, 2)
    vb = jnp.swapaxes(v, 1, 2)
    for name, kw in VARIANTS:
        out, _ = jax.jit(functools.partial(tri_fwd, **kw))(qb, kb, vb)
        out = jnp.swapaxes(out, 1, 2)
        diff = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                     - ref.astype(jnp.float32))))
        print(f"  {name:20s} max|diff| vs prod kernel = {diff:.5f}")


def bench(args):
    b, hq, hkv, d = 1, 32, 8, 128
    s = args.seq
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hq, s, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, hkv, s, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, hkv, s, d), jnp.bfloat16)
    flops = 2 * 2 * b * hq * s * s * d * 0.5

    for name, kw in VARIANTS:
        f = functools.partial(tri_fwd, **kw)

        @jax.jit
        def chained(q, k, v):
            def body(_, qq):
                return f(qq, k, v)[0].astype(q.dtype)
            return jnp.sum(lax.fori_loop(0, args.iters, body, q
                                         ).astype(jnp.float32))

        t_compile0 = time.perf_counter()
        float(chained(q, k, v))  # compile + warm
        t_compile = time.perf_counter() - t_compile0
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(chained(q, k, v))
            best = min(best, time.perf_counter() - t0)
        dt = best / args.iters
        print(f"  {name:20s} {flops / dt / 1e12:7.1f} TFLOP/s   "
              f"{dt * 1e3:8.2f} ms   (compile+warm {t_compile:.0f}s)",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=131072)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--check-only", action="store_true")
    ap.add_argument("--bench-only", action="store_true")
    args = ap.parse_args()
    print(f"backend={jax.default_backend()} device={jax.devices()[0].device_kind}")
    if not args.bench_only:
        print("correctness (8K, 8/2 heads):")
        check(args)
    if not args.check_only:
        print(f"bench ({args.seq} tokens, 32/8 heads, causal):")
        bench(args)


if __name__ == "__main__":
    main()
