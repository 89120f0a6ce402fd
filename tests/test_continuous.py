"""Continuous batching: every request must produce exactly the tokens the
dedicated single-request engine produces (iteration-level scheduling must be
invisible to the math), across admission order, queueing, and EOS exits."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from long_context_attention_tpu.models.llama import ModelConfig, init_params
from long_context_attention_tpu.serving import ContinuousEngine, Engine, Request

CFG = ModelConfig(vocab=96, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                  head_dim=32, ffn_hidden=128, layout="basic")
S_MAX = 256


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CFG)


def _prompt(seed, n):
    return list(np.asarray(
        jax.random.randint(jax.random.PRNGKey(seed), (n,), 0, CFG.vocab)))


def _expected(params, prompt, max_new):
    eng = Engine(CFG, s_max=S_MAX)
    res = eng.generate(params, jnp.asarray([prompt], jnp.int32), max_new)
    return list(np.asarray(res.tokens)[0])


def test_matches_dedicated_engine_with_queueing(params):
    """5 requests through 2 rows: queued admissions, different prompt
    lengths and budgets — greedy outputs equal the b=1 engine's."""
    reqs = [Request(id=i, tokens=_prompt(i, n), max_new=m)
            for i, (n, m) in enumerate([(10, 6), (33, 4), (64, 8),
                                        (17, 3), (50, 5)])]
    eng = ContinuousEngine(CFG, s_max=S_MAX, max_batch=2)
    results = eng.serve(params, reqs)
    assert sorted(results) == [0, 1, 2, 3, 4]
    for r in reqs:
        want = _expected(params, r.tokens, r.max_new)
        got = results[r.id].tokens
        assert got == want, (r.id, got, want)


def test_eos_frees_row_early(params):
    """A request that hits EOS stops (inclusive) and its row serves the
    next request; survivors are unaffected."""
    base = _prompt(7, 21)
    full = _expected(params, base, 8)
    eos = full[3]  # force an early exit 4 tokens in
    reqs = [Request(id=0, tokens=base, max_new=8),
            Request(id=1, tokens=_prompt(8, 12), max_new=5),
            Request(id=2, tokens=_prompt(9, 40), max_new=4)]
    eng = ContinuousEngine(CFG, s_max=S_MAX, max_batch=1)  # pure queueing
    results = eng.serve(params, reqs, eos_id=eos)
    assert results[0].tokens == full[:4]
    # others unaffected unless they also hit the eos token
    for r in reqs[1:]:
        want = _expected(params, r.tokens, r.max_new)
        if eos in want:
            want = want[:want.index(eos) + 1]
        assert results[r.id].tokens == want


def test_int8_cache_and_capacity_guard(params):
    eng = ContinuousEngine(CFG, s_max=S_MAX, max_batch=2, cache_dtype="int8")
    reqs = [Request(id=0, tokens=_prompt(3, 16), max_new=4)]
    out = eng.serve(params, reqs)
    assert len(out[0].tokens) == 4
    with pytest.raises(ValueError, match="capacity"):
        eng.serve(params, [Request(id=1, tokens=_prompt(4, 200),
                                   max_new=100)])


def test_sharded_continuous_matches_dedicated(params):
    """Multi-chip continuous batching (8-dev CPU mesh, cache sharded over
    ring x ulysses) serves zigzag-trained weights with the same greedy
    tokens as the single-device engine, through queueing and row reuse."""
    from long_context_attention_tpu.models.llama import init_params
    from long_context_attention_tpu.parallel.mesh import make_usp_mesh
    from long_context_attention_tpu.serving import ShardedContinuousEngine

    import dataclasses as dc
    zcfg = dc.replace(CFG, layout="zigzag")
    zparams = init_params(jax.random.PRNGKey(0), zcfg)
    mesh = make_usp_mesh(1, 2, 4)
    # prompt lengths are bucket-padded to 64/128/... — divisible by 8 shards.
    # Seed base 10 hits a one-bf16-ulp top-2 logit tie that flips a greedy
    # token between the sharded USP prefill and the single-device tri kernel
    # (different kernels since the r4 fast softmax); 110+ are tie-free.
    reqs = [Request(id=i, tokens=_prompt(110 + i, n), max_new=m)
            for i, (n, m) in enumerate([(40, 5), (100, 4), (64, 6)])]
    eng = ShardedContinuousEngine(zcfg, s_max=S_MAX, max_batch=2,
                                  cache_dtype="int8", mesh=mesh)
    results = eng.serve(zparams, reqs)
    for r in reqs:
        ded = Engine(zcfg, s_max=S_MAX, cache_dtype="int8")
        want = list(np.asarray(ded.generate(
            zparams, jnp.asarray([r.tokens], jnp.int32), r.max_new).tokens)[0])
        assert results[r.id].tokens == want, (r.id, results[r.id].tokens, want)


@pytest.mark.parametrize("sharded", [False, True])
def test_step_block_equals_per_token(params, sharded):
    """step_block > 1 (device-side EOS/budget tracking, one host sync per
    block) must produce byte-identical results to per-token stepping under
    greedy decoding — including mid-block finishes and admissions."""
    from long_context_attention_tpu.parallel.mesh import make_usp_mesh
    from long_context_attention_tpu.serving import ShardedContinuousEngine

    reqs = [Request(id=i, tokens=_prompt(20 + i, n), max_new=m)
            for i, (n, m) in enumerate([(24, 7), (40, 3), (16, 9)])]
    base = _expected  # noqa: keep flake quiet
    if sharded:
        mesh = make_usp_mesh(1, 2, 4)
        mk = lambda blk: ShardedContinuousEngine(
            CFG, s_max=S_MAX, max_batch=2, mesh=mesh, step_block=blk)
    else:
        mk = lambda blk: ContinuousEngine(CFG, s_max=S_MAX, max_batch=2,
                                          step_block=blk)
    # force an EOS mid-stream for one request via a token we know appears
    r1 = mk(1).serve(params, reqs)
    r4 = mk(4).serve(params, reqs)
    for i in range(3):
        assert r1[i].tokens == r4[i].tokens, (i, r1[i].tokens, r4[i].tokens)

    eos = r1[2].tokens[4]  # truncates request 2 mid-block
    r1e = mk(1).serve(params, reqs, eos_id=eos)
    r4e = mk(4).serve(params, reqs, eos_id=eos)
    for i in range(3):
        assert r1e[i].tokens == r4e[i].tokens, (i, r1e[i].tokens,
                                                r4e[i].tokens)


@pytest.mark.parametrize("sharded", [False, True])
@pytest.mark.parametrize("blk", [1, 4])
def test_host_overlap_equals_sequential(params, sharded, blk):
    """host_overlap=True (scheduler pipelined one block behind the device,
    device-resident token/active/budget vectors) must produce the SAME
    greedy results as the sequential loop — across queueing, mid-block
    finishes, one-block-late re-admissions, and EOS exits."""
    from long_context_attention_tpu.parallel.mesh import make_usp_mesh
    from long_context_attention_tpu.serving import ShardedContinuousEngine

    reqs = [Request(id=i, tokens=_prompt(30 + i, n), max_new=m)
            for i, (n, m) in enumerate([(24, 7), (40, 3), (16, 9),
                                        (12, 5), (33, 2)])]
    if sharded:
        mesh = make_usp_mesh(1, 2, 4)
        mk = lambda ov: ShardedContinuousEngine(
            CFG, s_max=S_MAX, max_batch=2, mesh=mesh, step_block=blk,
            host_overlap=ov)
    else:
        mk = lambda ov: ContinuousEngine(CFG, s_max=S_MAX, max_batch=2,
                                         step_block=blk, host_overlap=ov)
    seq = mk(False).serve(params, reqs)
    ovl = mk(True).serve(params, reqs)
    assert sorted(ovl) == sorted(seq)
    for i in seq:
        assert ovl[i].tokens == seq[i].tokens, (i, ovl[i].tokens,
                                                seq[i].tokens)

    eos = seq[2].tokens[4]
    seqe = mk(False).serve(params, reqs, eos_id=eos)
    ovle = mk(True).serve(params, reqs, eos_id=eos)
    for i in seqe:
        assert ovle[i].tokens == seqe[i].tokens, (i, ovle[i].tokens,
                                                  seqe[i].tokens)


DRAFT = ModelConfig(vocab=96, dim=32, n_layers=1, n_heads=2, n_kv_heads=1,
                    head_dim=32, ffn_hidden=64, layout="basic")


@pytest.fixture(scope="module")
def dparams():
    from long_context_attention_tpu.models.llama import init_params as ip
    return ip(jax.random.PRNGKey(9), DRAFT)


def test_speculative_continuous_matches_plain(params, dparams):
    """Speculative rounds inside the continuous scheduler must be invisible
    to the math: greedy outputs equal the plain ContinuousEngine's (every
    emitted token is a target-greedy token; the draft only changes how many
    arrive per round), across queueing and different budgets."""
    from long_context_attention_tpu.serving import SpeculativeContinuousEngine

    reqs = [Request(id=i, tokens=_prompt(30 + i, n), max_new=m)
            for i, (n, m) in enumerate([(12, 7), (40, 5), (25, 9),
                                        (18, 4)])]
    plain = ContinuousEngine(CFG, s_max=S_MAX, max_batch=2
                             ).serve(params, reqs)
    spec = SpeculativeContinuousEngine(
        CFG, s_max=S_MAX, max_batch=2, draft_cfg=DRAFT, gamma=3
    ).serve(params, dparams, reqs)
    assert sorted(spec) == sorted(plain)
    for i in plain:
        assert spec[i].tokens == plain[i].tokens, (
            i, spec[i].tokens, plain[i].tokens)


def test_speculative_continuous_eos_and_self_draft(params, dparams):
    """EOS truncates mid-round (the freed row admits the next request), and
    a self-draft (draft == target) accepts essentially everything — the
    round count collapses toward ceil(max_new / (gamma + 1))."""
    from long_context_attention_tpu.serving import SpeculativeContinuousEngine

    reqs = [Request(id=0, tokens=_prompt(41, 20), max_new=8),
            Request(id=1, tokens=_prompt(42, 12), max_new=6)]
    plain = ContinuousEngine(CFG, s_max=S_MAX, max_batch=1
                             ).serve(params, reqs)
    eos = plain[0].tokens[3]
    plain_e = ContinuousEngine(CFG, s_max=S_MAX, max_batch=1
                               ).serve(params, reqs, eos_id=eos)
    spec_e = SpeculativeContinuousEngine(
        CFG, s_max=S_MAX, max_batch=1, draft_cfg=DRAFT, gamma=4
    ).serve(params, dparams, reqs, eos_id=eos)
    for i in plain_e:
        assert spec_e[i].tokens == plain_e[i].tokens

    # self-draft: target drafts for itself -> near-total acceptance
    self_spec = SpeculativeContinuousEngine(
        CFG, s_max=S_MAX, max_batch=2, draft_cfg=CFG, gamma=4
    ).serve(params, params, reqs)
    for i in plain:
        assert self_spec[i].tokens == plain[i].tokens


def test_speculative_continuous_sampled_runs(params, dparams):
    """Leviathan-sampled mode inside the continuous scheduler: completes
    every request with the right budget (distribution exactness is proven
    at the SpeculativeEngine level; here we check the scheduler plumbing)."""
    from long_context_attention_tpu.serving import SpeculativeContinuousEngine
    from long_context_attention_tpu.serving.engine import SamplingParams

    reqs = [Request(id=i, tokens=_prompt(50 + i, n), max_new=m)
            for i, (n, m) in enumerate([(10, 5), (22, 7), (15, 4)])]
    out = SpeculativeContinuousEngine(
        CFG, s_max=S_MAX, max_batch=2, draft_cfg=DRAFT, gamma=3
    ).serve(params, dparams, reqs,
            sampling=SamplingParams(temperature=0.8, top_k=20),
            key=jax.random.PRNGKey(5))
    assert sorted(out) == [0, 1, 2]
    for r in reqs:
        assert len(out[r.id].tokens) == r.max_new


def test_sharded_speculative_continuous_matches_plain(params, dparams):
    """Speculative continuous batching over the 8-device sharded cache:
    greedy outputs equal the single-device plain ContinuousEngine's (verify
    runs straddle shard boundaries as lengths cross slot multiples), and
    Leviathan-sampled mode completes with the right budgets."""
    from long_context_attention_tpu.parallel.mesh import make_usp_mesh
    from long_context_attention_tpu.serving import (
        ShardedSpeculativeContinuousEngine,
    )
    from long_context_attention_tpu.serving.engine import SamplingParams

    from long_context_attention_tpu.models.llama import init_params as ip

    # the draft prefills USP-sharded over the same mesh, so it needs
    # ulysses-divisible kv heads (same constraint as any served model)
    draft8 = ModelConfig(vocab=96, dim=32, n_layers=1, n_heads=4,
                         n_kv_heads=2, head_dim=16, ffn_hidden=64,
                         layout="basic")
    dparams8 = ip(jax.random.PRNGKey(9), draft8)
    mesh = make_usp_mesh(1, 2, 4)
    reqs = [Request(id=i, tokens=_prompt(60 + i, n), max_new=m)
            for i, (n, m) in enumerate([(40, 8), (64, 5), (33, 7)])]
    spec = ShardedSpeculativeContinuousEngine(
        CFG, s_max=S_MAX, max_batch=2, cache_dtype="int8", mesh=mesh,
        draft_cfg=draft8, gamma=3,
    ).serve(params, dparams8, reqs)
    plain8 = ContinuousEngine(CFG, s_max=S_MAX, max_batch=2,
                              cache_dtype="int8").serve(params, reqs)
    for i in plain8:
        assert spec[i].tokens == plain8[i].tokens, (
            i, spec[i].tokens, plain8[i].tokens)

    sampled = ShardedSpeculativeContinuousEngine(
        CFG, s_max=S_MAX, max_batch=2, mesh=mesh, draft_cfg=draft8, gamma=3,
    ).serve(params, dparams8, reqs,
            sampling=SamplingParams(temperature=0.7, top_k=16),
            key=jax.random.PRNGKey(4))
    assert sorted(sampled) == [0, 1, 2]
    for r in reqs:
        assert len(sampled[r.id].tokens) == r.max_new


def test_logprobs_match_teacher_forcing(params):
    """return_logprobs=True: every reported logprob (admission first
    token AND decode steps, per-step and blocked schedulers) equals
    log-softmax of the model's logits at that position, checked by
    teacher-forcing prompt + generation through the prefill path."""
    from jax.sharding import PartitionSpec as P

    from long_context_attention_tpu.models.llama import forward_local
    from long_context_attention_tpu.parallel.mesh import make_usp_mesh

    prompt = _prompt(3, 12)
    reqs = [Request(id=0, tokens=prompt, max_new=5)]
    eng = ContinuousEngine(CFG, s_max=S_MAX, max_batch=2,
                           return_logprobs=True)
    res = eng.serve(params, reqs)[0]
    assert len(res.logprobs) == len(res.tokens) == 5

    seq = prompt + res.tokens
    toks = np.zeros((1, 64), np.int32)  # pad: trailing junk is causal-dead
    toks[0, :len(seq)] = seq
    mesh = make_usp_mesh(1, 1, 1, devices=jax.devices()[:1])

    def fwd(p, t):
        return forward_local(p, t, CFG, ulysses_axis="ulysses",
                             ring_axis="ring")

    logits = jax.shard_map(fwd, mesh=mesh, in_specs=(P(), P()),
                           out_specs=P(), check_vma=False)(
        params, jnp.asarray(toks))
    lsm = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    for j, (tok, lp) in enumerate(zip(res.tokens, res.logprobs)):
        want = float(lsm[0, len(prompt) - 1 + j, tok])
        assert abs(lp - want) < 5e-2, (j, lp, want)

    # blocked / pipelined / paged-interleaved schedulers report the same
    # logprobs (same per-step compute, different host loops)
    from long_context_attention_tpu.serving import PagedContinuousEngine
    variants = [
        ContinuousEngine(CFG, s_max=S_MAX, max_batch=2, step_block=3,
                         return_logprobs=True),
        ContinuousEngine(CFG, s_max=S_MAX, max_batch=2, step_block=2,
                         host_overlap=True, return_logprobs=True),
        PagedContinuousEngine(CFG, s_max=S_MAX, max_batch=2, page_size=128,
                              pool_pages=8, interleave_admission=True,
                              prefill_chunk=64, return_logprobs=True),
    ]
    for v in variants:
        r2 = v.serve(params, reqs)[0]
        assert r2.tokens == res.tokens
        np.testing.assert_allclose(r2.logprobs, res.logprobs, atol=2e-2)


def test_logprobs_off_by_default_and_spec_guard(params):
    reqs = [Request(id=0, tokens=_prompt(4, 8), max_new=2)]
    res = ContinuousEngine(CFG, s_max=S_MAX, max_batch=1).serve(params,
                                                                reqs)[0]
    assert res.logprobs is None
    from long_context_attention_tpu.serving import (
        SpeculativeContinuousEngine,
    )
    with pytest.raises(ValueError, match="logprobs"):
        SpeculativeContinuousEngine(CFG, s_max=S_MAX, max_batch=1,
                                    draft_cfg=CFG, return_logprobs=True)


def test_streaming_llm_sharded_speculative(params):
    """StreamingLLM (sliding window + sinks) x speculative decoding x
    ShardedContinuousEngine on the CPU mesh — the three round-3 features
    that previously did not compose (VERDICT r3 #5): the sharded verify
    takes per-(row, token) window bounds and each rank keeps its slice of
    the sink prefix visible. Greedy outputs must equal the plain (non-
    speculative) ShardedContinuousEngine's — speculative rounds invisible
    to the math within the sharded kernel family (sharded-vs-single-device
    windowed logits differ in the fp32 LSE merge order and are gated
    separately at 80% trajectory agreement, test_serving.py)."""
    import dataclasses as dc

    from long_context_attention_tpu.models.llama import init_params as ip
    from long_context_attention_tpu.parallel.mesh import make_usp_mesh
    from long_context_attention_tpu.serving import (
        ShardedContinuousEngine,
        ShardedSpeculativeContinuousEngine,
    )

    wcfg = dc.replace(CFG, window_left=24, sink_tokens=8)
    draft8 = ModelConfig(vocab=96, dim=32, n_layers=1, n_heads=4,
                         n_kv_heads=2, head_dim=16, ffn_hidden=64,
                         layout="basic", window_left=24, sink_tokens=8)
    dparams8 = ip(jax.random.PRNGKey(9), draft8)
    mesh = make_usp_mesh(1, 2, 4)
    # prompts exceed window + sink so both masks bite, and lengths cross
    # shard-slot multiples during decode (slots = s_max / 8). Seed base 70
    # hits a genuine one-bf16-ulp top-2 logit tie (gap 0.0156 at |logit| 2 —
    # the CLAUDE.md shape-rounding near-tie) that flips one greedy token
    # between the 1-row and 4-row matmul shapes; 80+ are tie-free.
    reqs = [Request(id=i, tokens=_prompt(80 + i, n), max_new=m)
            for i, (n, m) in enumerate([(40, 8), (64, 6), (50, 7)])]
    spec = ShardedSpeculativeContinuousEngine(
        wcfg, s_max=S_MAX, max_batch=2, mesh=mesh,
        draft_cfg=draft8, gamma=3,
    ).serve(params, dparams8, reqs)
    plain = ShardedContinuousEngine(wcfg, s_max=S_MAX, max_batch=2,
                                    mesh=mesh).serve(params, reqs)
    for i in plain:
        assert spec[i].tokens == plain[i].tokens, (
            i, spec[i].tokens, plain[i].tokens)
