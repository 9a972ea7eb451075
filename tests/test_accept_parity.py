"""Acceptance-rate parity vs the REFERENCE speculative binary.

BASELINE.md requires acceptance within ±2% of the reference on the same
model pair. This trains a tiny target+draft pair (peaked distributions so
the p_accept drafting gate passes), runs the reference's
speculative_orig binary (compiled single-rank from the read-only mount,
tests/oracle.py) and our SyncSpeculator with identical parameters, and
compares accept %."""

import numpy as np
import pytest

import jax.numpy as jnp

from pipeinfer_tpu.gguf.reader import GGUFReader
from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.runtime.context import InferenceContext
from pipeinfer_tpu.sampling.samplers import SamplingParams
from pipeinfer_tpu.spec.params import SpecParams
from pipeinfer_tpu.spec.sync_spec import SyncSpeculator
from pipeinfer_tpu.tokenizer import tokenizer_from_gguf
from pipeinfer_tpu.tools import testmodel
from pipeinfer_tpu.tools.finetune import dense_params, save_gguf, train

from . import oracle

VOCAB_FIXTURE = "/root/reference/models/ggml-vocab-llama.gguf"
CORPUS = (
    "the quick brown fox jumps over the lazy dog and then "
    "the quick brown fox jumps over the lazy dog again because "
) * 30
PROMPT = "the quick brown fox jumps over"
N_PREDICT = 48
# p_accept 0.2: tiny trained models peak around 0.3-0.8 top-prob
SPEC = dict(n_draft=5, n_parallel=1, p_accept=0.2, p_split=0.1)


def _train_model(path, *, n_layers, seed, steps, tok, n_embd=64, n_ff=128):
    stream = np.asarray(tok.encode(CORPUS, add_bos=True), np.int32)
    init = path.with_suffix(".init.gguf")
    testmodel.build_tiny_llama(
        init, seed=seed, n_layers=n_layers, n_embd=n_embd, n_heads=4,
        n_kv_heads=4, n_ff=n_ff, vocab_from=VOCAB_FIXTURE,
    )
    params, cfg = load_model(init)
    params = dense_params(params)
    params, losses = train(
        params, cfg, stream, seq_len=48, batch=4, steps=steps, lr=6e-3,
        log=lambda s: None, seed=seed,
    )
    save_gguf_with_vocab(params, cfg, path)
    return losses[-1]


def save_gguf_with_vocab(params, cfg, path):
    # save_gguf drops the vocab; rebuild with vocab_from so the reference
    # binary can tokenize
    w = {
        "tok_embd": np.asarray(params["tok_embd"], np.float32),
        "output_norm": np.asarray(params["output_norm"], np.float32),
        "output": np.asarray(params["output"], np.float32),
    }
    for i, lp in enumerate(params["layers"]):
        for slot, arr in lp.items():
            w[f"layers.{i}.{slot}"] = np.asarray(arr, np.float32)
    testmodel.build_tiny_llama(
        path, n_layers=cfg.n_layers, n_embd=cfg.n_embd, n_heads=cfg.n_heads,
        n_kv_heads=cfg.n_kv_heads, n_ff=cfg.n_ff, vocab_from=VOCAB_FIXTURE,
        weights=w,
    )


@pytest.mark.skipif(oracle.get_spec_oracle() is None, reason="no reference toolchain")
@pytest.mark.parametrize(
    "size",
    [
        # (tgt layers, dft layers, n_embd, n_ff, tgt steps, dft steps)
        pytest.param((2, 1, 64, 128, 220, 160), id="small"),
        # largest CI-feasible pair: a genuinely deeper/wider target with a
        # half-depth draft (the BASELINE ±2% bound must hold as the pair
        # scales, not only at the toy point)
        pytest.param((4, 2, 128, 256, 260, 200), id="large"),
    ],
)
def test_acceptance_within_2pct_of_reference(tmp_path, size):
    lt, ld, n_embd, n_ff, steps_t, steps_d = size
    with GGUFReader(VOCAB_FIXTURE) as r:
        tok = tokenizer_from_gguf(r)

    tgt = tmp_path / "tgt.gguf"
    dft = tmp_path / "dft.gguf"
    loss_t = _train_model(tgt, n_layers=lt, seed=1, steps=steps_t, tok=tok,
                          n_embd=n_embd, n_ff=n_ff)
    loss_d = _train_model(dft, n_layers=ld, seed=2, steps=steps_d, tok=tok,
                          n_embd=n_embd, n_ff=n_ff)
    assert loss_t < 1.5 and loss_d < 2.5, (loss_t, loss_d)

    ref = oracle.ref_speculative(
        str(tgt), str(dft), PROMPT, N_PREDICT, **SPEC
    )
    assert ref is not None, "reference speculative oracle failed to run"
    assert ref["n_drafted"] > 0, "reference drafted nothing (distribution too flat)"

    params_t, cfg_t = load_model(tgt)
    params_d, cfg_d = load_model(dft)
    ctx_t = InferenceContext(params_t, cfg_t, n_cells=256, cache_dtype=jnp.float32)
    ctx_d = InferenceContext(params_d, cfg_d, n_cells=256, cache_dtype=jnp.float32)
    engine = SyncSpeculator(
        ctx_t, ctx_d,
        SamplingParams(temp=0.0, penalty_repeat=1.0, penalty_last_n=0),
        SpecParams(**SPEC),
        eos_id=tok.vocab.eos_id,
    )
    ids = tok.encode(PROMPT, add_bos=True)
    engine.generate(ids, N_PREDICT)
    ours = engine.stats
    assert ours.n_drafted > 0

    ref_rate = ref["accept"]
    our_rate = ours.n_accept / ours.n_drafted
    print(
        f"reference: {ref['n_accept']}/{ref['n_drafted']} = {100 * ref_rate:.1f}% | "
        f"ours: {ours.n_accept}/{ours.n_drafted} = {100 * our_rate:.1f}%"
    )
    assert abs(our_rate - ref_rate) <= 0.02, (
        f"acceptance diverges: ours {100 * our_rate:.2f}% vs "
        f"reference {100 * ref_rate:.2f}% (BASELINE requires ±2%)"
    )


# ---- async controller parity (round-4 verdict item 8: the ±2% BASELINE
# bound previously covered only the sync speculator at temp=0) ----------

SPEC_NOGATE = dict(n_draft=5, n_parallel=1, p_accept=0.0, p_split=0.1)
# p_accept=0 in BOTH engines: the async controller's device-corrected
# drafting has no confidence gate (fixed-depth device chains), so parity
# must be measured without the reference's early-stop gate either —
# acceptance then compares the model pair's intrinsic agreement
# (ref: speculative.cpp:846-848 p_adjust is the gate being disabled).


@pytest.fixture(scope="module")
def trained_small(tmp_path_factory):
    d = tmp_path_factory.mktemp("parity")
    with GGUFReader(VOCAB_FIXTURE) as r:
        tok = tokenizer_from_gguf(r)
    tgt, dft = d / "tgt.gguf", d / "dft.gguf"
    loss_t = _train_model(tgt, n_layers=2, seed=1, steps=220, tok=tok)
    loss_d = _train_model(dft, n_layers=1, seed=2, steps=160, tok=tok)
    assert loss_t < 1.5 and loss_d < 2.5, (loss_t, loss_d)
    return tgt, dft, tok


def _ctxs(tgt, dft):
    params_t, cfg_t = load_model(tgt)
    params_d, cfg_d = load_model(dft)
    return (
        InferenceContext(params_t, cfg_t, n_cells=512, cache_dtype=jnp.float32),
        InferenceContext(params_d, cfg_d, n_cells=512, cache_dtype=jnp.float32),
    )


@pytest.mark.skipif(oracle.get_spec_oracle() is None, reason="no reference toolchain")
def test_async_controller_acceptance_parity(trained_small):
    """PipeInferController (not just the sync speculator) holds the ±2%
    BASELINE acceptance bound vs the reference binary at temp=0."""
    from pipeinfer_tpu.spec.controller import PipeInferController

    tgt, dft, tok = trained_small
    ref = oracle.ref_speculative(str(tgt), str(dft), PROMPT, N_PREDICT,
                                 **SPEC_NOGATE)
    assert ref is not None and ref["n_drafted"] > 0
    ctx_t, ctx_d = _ctxs(tgt, dft)
    ctrl = PipeInferController(
        ctx_t, ctx_d,
        SamplingParams(temp=0.0, penalty_repeat=1.0, penalty_last_n=0),
        SpecParams(**SPEC_NOGATE),
        eos_id=tok.vocab.eos_id,
    )
    ids = tok.encode(PROMPT, add_bos=True)
    ctrl.generate(ids, N_PREDICT)
    st = ctrl.stats
    assert st.n_drafted > st.n_drafted_unverified
    # decided acceptance: drafts that reached a verdict (the controller's
    # final run can retire with an unverified tail)
    our_rate = st.accept_rate_decided
    print(f"controller: {100 * our_rate:.1f}% vs reference "
          f"{100 * ref['accept']:.1f}% "
          f"({st.n_accept}/{st.n_drafted - st.n_drafted_unverified})")
    assert abs(our_rate - ref["accept"]) <= 0.02


@pytest.mark.skipif(oracle.get_spec_oracle() is None, reason="no reference toolchain")
def test_stochastic_acceptance_within_statistical_bound(trained_small):
    """temp>0: stochastic target sampling on both sides. Exact streams
    differ (independent rngs; the reference drafts greedily while our
    device chain samples the draft), so parity is a bound on MEAN
    acceptance across seeds — catching gross divergence (a broken
    stochastic verifier accepting everything reads ~100%)."""
    from pipeinfer_tpu.spec.controller import PipeInferController

    tgt, dft, tok = trained_small
    TEMP, SEEDS = 0.5, (3, 7, 11)
    refs = [
        oracle.ref_speculative(str(tgt), str(dft), PROMPT, N_PREDICT,
                               temp=TEMP, seed=s, **SPEC_NOGATE)
        for s in SEEDS
    ]
    refs = [r for r in refs if r is not None and r["n_drafted"] > 0]
    assert refs, "reference stochastic runs failed"
    ref_mean = sum(r["accept"] for r in refs) / len(refs)

    ids = tok.encode(PROMPT, add_bos=True)
    ours = []
    for s in SEEDS:
        ctx_t, ctx_d = _ctxs(tgt, dft)
        ctrl = PipeInferController(
            ctx_t, ctx_d,
            SamplingParams(temp=TEMP, penalty_repeat=1.0, penalty_last_n=0,
                           top_k=40, top_p=1.0, min_p=0.0, seed=s),
            SpecParams(**SPEC_NOGATE),
            eos_id=tok.vocab.eos_id,
        )
        ctrl.generate(ids, N_PREDICT)
        st = ctrl.stats
        if st.n_drafted > st.n_drafted_unverified:
            ours.append(st.accept_rate_decided)
    assert ours, "controller drafted nothing"
    our_mean = sum(ours) / len(ours)
    print(f"stochastic accept: ours {100 * our_mean:.1f}% vs reference "
          f"{100 * ref_mean:.1f}% (temp={TEMP}, {len(ours)}/{len(refs)} runs)")
    assert abs(our_mean - ref_mean) <= 0.12
    assert our_mean < 0.999, "stochastic verification must reject sometimes"
