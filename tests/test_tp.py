"""Tensor parallelism (parallel.tp): sharded-weight decode must be
numerically equivalent to single-device decode — logits parity, greedy
token-exactness, on-device chain parity, and the async controller running
over a TP target (the BASELINE "weights tensor-sharded in HBM" north star
on the async topology)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pipeinfer_tpu.gguf.constants import GGMLQuantType
from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.parallel.tp import tp_mesh
from pipeinfer_tpu.runtime.context import Batch, InferenceContext
from pipeinfer_tpu.sampling.samplers import SamplerState, SamplingParams, sample
from pipeinfer_tpu.tools import testmodel

CFG = dict(n_layers=2, n_embd=128, n_heads=4, n_kv_heads=2, n_ff=256, n_vocab=160)
PROMPT = [3, 17, 42, 7]


@pytest.fixture(scope="module", params=["f32", "q4k"])
def model(request, tmp_path_factory):
    path = tmp_path_factory.mktemp("tp") / f"m_{request.param}.gguf"
    qt = GGMLQuantType.F32 if request.param == "f32" else GGMLQuantType.Q4_K
    # Q4_K needs K % 256 == 0: bump embd/ff for the quantized variant
    cfg = dict(CFG, n_embd=256, n_ff=512) if request.param == "q4k" else CFG
    testmodel.build_tiny_llama(path, seed=13, qtype=qt, **cfg)
    return load_model(path)


def _greedy(ctx, n=12):
    sampler = SamplerState(params=SamplingParams(temp=0.0))
    # seed the penalty window with the prompt, as the engines do
    # (ref: llama_sampling_accept over prompt tokens)
    for t in PROMPT:
        sampler.accept(t, apply_grammar=False)
    b = Batch()
    for i, t in enumerate(PROMPT):
        b.add(t, i, 0, want_logits=(i == len(PROMPT) - 1))
    logits = ctx.decode(b)[-1]
    out = []
    n_past = len(PROMPT)
    for _ in range(n):
        tok = sample(sampler, logits)
        sampler.accept(tok)
        out.append(tok)
        b.clear()
        b.add(tok, n_past, 0)
        logits = ctx.decode(b)[0]
        n_past += 1
    return out


def test_tp_logits_parity(model):
    params, cfg = model
    ref = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32)
    mesh = tp_mesh(jax.devices()[:2])
    tpc = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32, mesh=mesh)

    b = Batch()
    for i, t in enumerate(PROMPT):
        b.add(t, i, 0)
    want = ref.decode(b)
    got = tpc.decode(b)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_tp_greedy_token_exact(model):
    params, cfg = model
    ref = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32)
    mesh = tp_mesh(jax.devices()[:4])  # 4-way: kv_heads=2 fails -> use 2
    mesh = tp_mesh(jax.devices()[:2])
    tpc = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32, mesh=mesh)
    assert _greedy(tpc) == _greedy(ref)


def test_tp_chain_parity(model):
    params, cfg = model
    ref = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32)
    mesh = tp_mesh(jax.devices()[:2])
    tpc = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32, mesh=mesh)
    for ctx in (ref, tpc):
        b = Batch()
        for i, t in enumerate(PROMPT):
            b.add(t, i, 0)
        ctx.decode(b)
    t_ref, c_ref = ref.draft_chain(5, len(PROMPT), 0, 4)
    t_tp, c_tp = tpc.draft_chain(5, len(PROMPT), 0, 4)
    assert t_ref == t_tp
    np.testing.assert_allclose(c_tp[0].vals, c_ref[0].vals, rtol=2e-5, atol=2e-5)


def test_controller_over_tp_target(model):
    from pipeinfer_tpu.spec.controller import PipeInferController
    from pipeinfer_tpu.spec.params import SpecParams

    params, cfg = model
    ref = InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32)
    want = _greedy(ref, n=16)

    mesh = tp_mesh(jax.devices()[:2])
    sp = SpecParams(n_draft=4, n_parallel=2, p_accept=0.0, max_inflight=3)
    c = PipeInferController(
        InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32, mesh=mesh),
        InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32),
        SamplingParams(temp=0.0),
        sp,
        eos_id=-1,
    )
    got = c.generate(list(PROMPT), 16)
    assert got == want, f"TP-target async spec diverges: {got} vs {want}"
    assert c.stats.n_accept > 0


def test_device_placement():
    """Dual-pipeline placement: draft and target contexts on disjoint
    devices (ref: the two-communicator split, speculative.cpp:118-138)."""
    path = "/tmp/tp_place.gguf"
    testmodel.build_tiny_llama(path, seed=3, **CFG)
    params, cfg = load_model(path)
    devs = jax.devices()
    a = InferenceContext(params, cfg, n_cells=64, device=devs[0])
    bctx = InferenceContext(params, cfg, n_cells=64, device=devs[1])
    assert next(iter(a.cache.k.devices())) == devs[0]
    assert next(iter(bctx.cache.k.devices())) == devs[1]
    batch = Batch()
    batch.add(1, 0, 0)
    la = a.decode(batch)
    lb = bctx.decode(batch)
    np.testing.assert_allclose(la, lb, rtol=1e-5, atol=1e-5)


# -- packed-quantized TP (VERDICT r3 item 1): i4g/i8g planes shard along ----
# output columns and stay packed in HBM on every shard --------------------


@pytest.fixture(scope="module", params=["i4g", "i8g"])
def packed_model(request, tmp_path_factory, monkeypatch_module=None):
    import os

    path = tmp_path_factory.mktemp("tp_packed") / f"m_{request.param}.gguf"
    cfg = dict(CFG, n_embd=256, n_ff=512)
    testmodel.build_tiny_llama(path, seed=13, qtype=GGMLQuantType.Q4_K, **cfg)
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


def test_tp_packed_layout_stays_packed(packed_model):
    """shard_params must shard the packed nibble/int8 planes, not densify:
    every sharded matmul slot keeps its QuantTensor layout and integer
    plane dtype, with the output dim halved (ref: ggml-mpi.c:523-587 —
    quantized slabs stream packed on every rank)."""
    from pipeinfer_tpu.ops.qmatmul import QuantTensor
    from pipeinfer_tpu.parallel import tp

    (params, cfg), layout = packed_model
    mesh = tp_mesh(jax.devices()[:2])
    sharded, specs = tp.shard_params(params, cfg, mesh)
    lp = sharded["layers"][0]
    for slot in ("wq", "wo", "w_gate", "w_down"):
        w = lp[slot]
        assert isinstance(w, QuantTensor), f"{slot} densified"
        assert w.layout == layout
        assert w.qs.dtype in (jnp.uint8, jnp.int8), f"{slot} planes not packed"
        assert w.qs.shape[0] == 2  # shard-stacked [tp, rows, N/tp]
        full = params["layers"][0][slot]
        assert w.shape == (full.shape[0] // 2, full.shape[1])


def test_tp_packed_logits_parity(packed_model):
    """TP decode from packed shards must match single-chip decode with the
    SAME layout (both run the identical dequant math per column block)."""
    (params, cfg), layout = packed_model
    ref = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32)
    mesh = tp_mesh(jax.devices()[:2])
    tpc = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32, mesh=mesh)
    b = Batch()
    for i, t in enumerate(PROMPT):
        b.add(t, i, 0)
    want = ref.decode(b)
    got = tpc.decode(b)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_tp_packed_greedy_token_exact(packed_model):
    (params, cfg), layout = packed_model
    ref = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32)
    mesh = tp_mesh(jax.devices()[:2])
    tpc = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32, mesh=mesh)
    assert _greedy(tpc) == _greedy(ref)
