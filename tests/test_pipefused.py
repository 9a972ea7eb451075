"""Fused pp×tp×dp pipeline on the virtual 8-device CPU mesh: the sharded
step must reproduce single-device logits."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.models import llama as mllama
from pipeinfer_tpu.parallel import pipefused as pf
from pipeinfer_tpu.runtime import kv_cache as kv
from pipeinfer_tpu.tools import testmodel

CFG = dict(n_layers=4, n_embd=64, n_heads=4, n_kv_heads=2, n_ff=128, n_vocab=96)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("pf") / "m.gguf"
    testmodel.build_tiny_llama(path, seed=5, **CFG)
    return load_model(path)


def _reference_logits(params, cfg, tokens):
    cache = kv.create(cfg.n_layers, 32, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    t = len(tokens)
    logits, _ = mllama.forward(
        params,
        cfg,
        cache,
        jnp.asarray(tokens, jnp.int32),
        jnp.arange(t, dtype=jnp.int32),
        jnp.zeros(t, jnp.int32),
        jnp.arange(t, dtype=jnp.int32),
        jnp.ones(t, bool),
    )
    return np.asarray(logits)


@pytest.mark.parametrize("pp,mb", [(4, 4), (2, 2), (4, 2)])
def test_microbatch_schedule_matches_single_device(model, pp, mb):
    """The (M + S - 1)-phase schedule: M microbatches (batch-axis split)
    flow through S stages with every stage computing a DIFFERENT microbatch
    per phase — all streams must still match the single-device forward.
    Stage compute per stage drops from M*S phases (stage-masked sweeps) to
    M+S-1 (ref: the async split decode's in-flight microbatches,
    llama.h:285-290, as a static schedule)."""
    if pp > len(jax.devices()):
        pytest.skip("not enough devices")
    params, cfg = model
    pc = pf.PipeConfig(n_stages=pp, tp=1, dp=1, n_microbatches=mb)
    mesh = pf.make_mesh(pc)
    stacked = pf.stack_params(params, cfg, pc, mesh)
    batch = mb  # one stream per microbatch
    cache = pf.init_cache(cfg, pc, mesh, batch=batch, max_len=16)
    step = pf.build_step(cfg, pc, mesh)

    rng = np.random.default_rng(3)
    toks = rng.integers(1, CFG["n_vocab"], size=(batch, 4)).astype(np.int32)
    t = toks.shape[1]
    logits, cache = step(stacked, cache, jnp.asarray(toks),
                         jnp.arange(t, dtype=jnp.int32), 0)
    got = np.asarray(logits)
    for b in range(batch):
        want = _reference_logits(params, cfg, list(toks[b]))
        err = np.abs(got[b] - want).max() / (np.abs(want).max() + 1e-6)
        assert err < 0.03, f"S={pp} M={mb} stream {b}: err {err}"

    # a decode step on top of the filled caches (streams advance together)
    logits2, cache = step(stacked, cache, jnp.asarray(toks[:, :1] + 1),
                          jnp.asarray([t], jnp.int32), t)
    assert np.isfinite(np.asarray(logits2)).all()


def test_ring_wrap_positions(model):
    """Per-slot stored positions make the ring wrap-safe: decoding past
    max_len must equal a single-device run with a sliding window (the
    cache holds only the last C positions)."""
    params, cfg = model
    pc = pf.PipeConfig(n_stages=2, tp=1, dp=1)
    mesh = pf.make_mesh(pc)
    stacked = pf.stack_params(params, cfg, pc, mesh)
    C = 8
    cache = pf.init_cache(cfg, pc, mesh, batch=1, max_len=C)
    step = pf.build_step(cfg, pc, mesh)

    rng = np.random.default_rng(4)
    seq = rng.integers(1, CFG["n_vocab"], size=14).astype(np.int32)
    logits = None
    for i, tok in enumerate(seq):
        logits, cache = step(stacked, cache, jnp.asarray([[tok]]),
                             jnp.asarray([i], jnp.int32), i)
    got = np.asarray(logits)[0, 0]

    # reference: PROGRESSIVE sliding window on the cell cache — before each
    # decode, evict positions that fell out of the C-token window (ring
    # semantics: query at pos i sees (i-C, i])
    from pipeinfer_tpu.runtime.context import Batch, InferenceContext

    ctx = InferenceContext(params, cfg, n_cells=32, cache_dtype=jnp.float32)
    want = None
    for i, tok in enumerate(seq):
        if i >= C:
            ctx.seq_rm(0, 0, i - C + 1)
        b = Batch()
        b.add(int(tok), i, 0)
        want = ctx.decode(b)[0]
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
    assert err < 0.03, f"ring wrap decode err {err}"


@pytest.mark.parametrize("pp,tp,dp", [(2, 2, 2), (4, 2, 1), (2, 1, 1), (1, 2, 1)])
def test_fused_pipeline_matches_single_device(model, pp, tp, dp):
    if pp * tp * dp > len(jax.devices()):
        pytest.skip("not enough devices")
    params, cfg = model
    pc = pf.PipeConfig(n_stages=pp, tp=tp, dp=dp)
    mesh = pf.make_mesh(pc)
    stacked = pf.stack_params(params, cfg, pc, mesh)
    cache = pf.init_cache(cfg, pc, mesh, batch=dp, max_len=16)
    step = pf.build_step(cfg, pc, mesh)

    tokens = [3, 9, 21, 40]
    t = len(tokens)
    tok_arr = jnp.tile(jnp.asarray(tokens, jnp.int32)[None, :], (dp, 1))
    logits, cache = step(stacked, cache, tok_arr, jnp.arange(t, dtype=jnp.int32), 0)
    got = np.asarray(logits)

    want = _reference_logits(params, cfg, tokens)
    for b in range(dp):
        err = np.abs(got[b] - want).max() / (np.abs(want).max() + 1e-6)
        assert err < 0.03, f"pp={pp} tp={tp} dp={dp} stream {b}: err {err}"

    # decode one more token through the pipeline
    logits2, cache = step(
        stacked, cache, jnp.full((dp, 1), 7, jnp.int32), jnp.asarray([t], jnp.int32), t
    )
    cache_ref = kv.create(cfg.n_layers, 32, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    l1, cache_ref = mllama.forward(
        params, cfg, cache_ref,
        jnp.asarray(tokens, jnp.int32), jnp.arange(t, dtype=jnp.int32),
        jnp.zeros(t, jnp.int32), jnp.arange(t, dtype=jnp.int32), jnp.ones(t, bool),
    )
    l2, _ = mllama.forward(
        params, cfg, cache_ref,
        jnp.asarray([7], jnp.int32), jnp.asarray([t], jnp.int32),
        jnp.zeros(1, jnp.int32), jnp.asarray([t], jnp.int32), jnp.ones(1, bool),
    )
    want2 = np.asarray(l2)
    err2 = np.abs(np.asarray(logits2)[0] - want2).max() / (np.abs(want2).max() + 1e-6)
    assert err2 < 0.03, f"decode step err {err2}"


# -- packed-quantized pipefused (VERDICT r3 item 1) --------------------------


QCFG = dict(n_layers=4, n_embd=256, n_heads=4, n_kv_heads=2, n_ff=512,
            n_vocab=256)


@pytest.fixture(scope="module", params=["i4g", "i8g"])
def qmodel(request, tmp_path_factory):
    import os

    from pipeinfer_tpu.gguf.constants import GGMLQuantType

    path = tmp_path_factory.mktemp("pfq") / f"m_{request.param}.gguf"
    testmodel.build_tiny_llama(path, seed=7, qtype=GGMLQuantType.Q4_K, **QCFG)
    old = os.environ.get("PIPEINFER_WEIGHT_LAYOUT")
    os.environ["PIPEINFER_WEIGHT_LAYOUT"] = request.param
    try:
        m = load_model(path)
    finally:
        if old is None:
            os.environ.pop("PIPEINFER_WEIGHT_LAYOUT", None)
        else:
            os.environ["PIPEINFER_WEIGHT_LAYOUT"] = old
    return m, request.param


def test_stack_params_keeps_quant_packed(qmodel):
    """stack_params must NOT densify uniform-format quantized slots: every
    matmul slot (head included) keeps its packed integer planes, stage-
    stacked, with the aux shape narrowed to the shard-local output width
    (ref: ggml-mpi.c:523-587 — packed slabs stream on every rank)."""
    from pipeinfer_tpu.ops.qmatmul import QuantTensor

    (params, cfg), layout = qmodel
    pc = pf.PipeConfig(n_stages=2, tp=2, dp=1)
    mesh = pf.make_mesh(pc)
    stacked = pf.stack_params(params, cfg, pc, mesh)
    for slot in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        w = stacked[slot]
        assert isinstance(w, QuantTensor), f"{slot} densified"
        assert w.layout == layout
        assert w.qs.dtype in (jnp.uint8, jnp.int8)
        assert w.qs.shape[:2] == (2, 2)  # [S, Lps, rows, N]
        full_n = params["layers"][0][slot].shape[0]
        assert w.shape[0] == full_n // pc.tp  # shard-local output width
    assert isinstance(stacked["output"], QuantTensor)


@pytest.mark.parametrize("pp,tp,dp", [(2, 2, 1), (2, 1, 1), (1, 2, 1)])
def test_packed_pipeline_matches_single_chip_quant(qmodel, pp, tp, dp):
    """The packed pp×tp step must reproduce the SINGLE-CHIP quantized
    forward (same layout, same dequant math — requant noise cancels)."""
    if pp * tp * dp > len(jax.devices()):
        pytest.skip("not enough devices")
    (params, cfg), layout = qmodel
    pc = pf.PipeConfig(n_stages=pp, tp=tp, dp=dp)
    mesh = pf.make_mesh(pc)
    stacked = pf.stack_params(params, cfg, pc, mesh)
    cache = pf.init_cache(cfg, pc, mesh, batch=dp, max_len=16)
    step = pf.build_step(cfg, pc, mesh)

    tokens = [3, 9, 21, 40]
    t = len(tokens)
    tok_arr = jnp.tile(jnp.asarray(tokens, jnp.int32)[None, :], (dp, 1))
    logits, cache = step(stacked, cache, tok_arr, jnp.arange(t, dtype=jnp.int32), 0)
    got = np.asarray(logits)

    want = _reference_logits(params, cfg, tokens)
    for b in range(dp):
        err = np.abs(got[b] - want).max() / (np.abs(want).max() + 1e-6)
        assert err < 0.03, f"pp={pp} tp={tp} stream {b}: err {err}"
