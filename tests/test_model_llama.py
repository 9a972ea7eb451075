"""Llama forward-pass parity vs HuggingFace transformers (float oracle),
plus incremental-decode and KV-cache semantics tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from pipeinfer_tpu.gguf.constants import GGMLQuantType
from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.models import llama as mllama
from pipeinfer_tpu.runtime import kv_cache as kv
from pipeinfer_tpu.tools import testmodel

CFG = dict(n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2, n_ff=160, n_vocab=199)


def _forward_tokens(params, cfg, cache, tokens, pos0=0, seq=0):
    t = len(tokens)
    return mllama.forward(
        params,
        cfg,
        cache,
        jnp.asarray(tokens, jnp.int32),
        jnp.arange(pos0, pos0 + t, dtype=jnp.int32),
        jnp.full((t,), seq, jnp.int32),
        jnp.arange(pos0, pos0 + t, dtype=jnp.int32),
        jnp.ones((t,), bool),
    )


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "tiny.gguf"
    testmodel.build_tiny_llama(path, seed=7, **CFG)
    params, cfg = load_model(path)
    return params, cfg


def _hf_model():
    torch = pytest.importorskip("torch")
    tf = pytest.importorskip("transformers")
    conf = tf.LlamaConfig(
        vocab_size=CFG["n_vocab"],
        hidden_size=CFG["n_embd"],
        intermediate_size=CFG["n_ff"],
        num_hidden_layers=CFG["n_layers"],
        num_attention_heads=CFG["n_heads"],
        num_key_value_heads=CFG["n_kv_heads"],
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        attention_bias=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(3)
    model = tf.LlamaForCausalLM(conf)
    model.eval()
    return torch, model


def _export_hf_to_gguf(torch, model, path):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    w = {
        "tok_embd": sd["model.embed_tokens.weight"],
        "output_norm": sd["model.norm.weight"],
        "output": sd["lm_head.weight"],
    }
    for i in range(CFG["n_layers"]):
        p = f"model.layers.{i}."
        w[f"layers.{i}.attn_norm"] = sd[p + "input_layernorm.weight"]
        w[f"layers.{i}.wq"] = testmodel.permute_for_ggml_rope(
            sd[p + "self_attn.q_proj.weight"], CFG["n_heads"]
        )
        w[f"layers.{i}.wk"] = testmodel.permute_for_ggml_rope(
            sd[p + "self_attn.k_proj.weight"], CFG["n_kv_heads"]
        )
        w[f"layers.{i}.wv"] = sd[p + "self_attn.v_proj.weight"]
        w[f"layers.{i}.wo"] = sd[p + "self_attn.o_proj.weight"]
        w[f"layers.{i}.ffn_norm"] = sd[p + "post_attention_layernorm.weight"]
        w[f"layers.{i}.w_gate"] = sd[p + "mlp.gate_proj.weight"]
        w[f"layers.{i}.w_up"] = sd[p + "mlp.up_proj.weight"]
        w[f"layers.{i}.w_down"] = sd[p + "mlp.down_proj.weight"]
    testmodel.write_llama_gguf(path, w, **CFG)


def test_logit_parity_with_transformers(tmp_path):
    torch, hf = _hf_model()
    path = tmp_path / "hf.gguf"
    _export_hf_to_gguf(torch, hf, path)
    params, cfg = load_model(path)
    assert cfg.n_heads == CFG["n_heads"] and cfg.n_vocab == CFG["n_vocab"]

    tokens = [3, 17, 42, 7, 101, 55, 9, 150]
    with torch.no_grad():
        want = hf(torch.tensor([tokens])).logits[0].numpy()

    cache = kv.create(cfg.n_layers, 64, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    logits, _ = _forward_tokens(params, cfg, cache, tokens)
    got = np.asarray(logits)
    err = np.abs(got - want).max()
    scale = np.abs(want).max()
    assert err / scale < 2e-3, f"logit mismatch: max abs {err} (scale {scale})"
    # greedy tokens must agree exactly
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_incremental_matches_oneshot(tiny_model):
    params, cfg = tiny_model
    tokens = [5, 9, 23, 41, 77, 12]
    cache = kv.create(cfg.n_layers, 32, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    full_logits, _ = _forward_tokens(params, cfg, cache, tokens)

    cache2 = kv.create(cfg.n_layers, 32, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    l1, cache2 = _forward_tokens(params, cfg, cache2, tokens[:4])
    l2, cache2 = _forward_tokens(params, cfg, cache2, tokens[4:], pos0=4)
    got = np.concatenate([np.asarray(l1), np.asarray(l2)])
    np.testing.assert_allclose(got, np.asarray(full_logits), rtol=2e-4, atol=2e-4)


def test_padding_tokens_are_inert(tiny_model):
    params, cfg = tiny_model
    tokens = [5, 9, 23]
    cache = kv.create(cfg.n_layers, 32, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    want, _ = _forward_tokens(params, cfg, cache, tokens)

    cache2 = kv.create(cfg.n_layers, 32, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    t = jnp.asarray(tokens + [0, 0], jnp.int32)
    padded, _ = mllama.forward(
        params,
        cfg,
        cache2,
        t,
        jnp.asarray([0, 1, 2, 0, 0], jnp.int32),
        jnp.zeros(5, jnp.int32),
        jnp.asarray([0, 1, 2, 31, 31], jnp.int32),  # padding -> trash cell
        jnp.asarray([True, True, True, False, False]),
    )
    np.testing.assert_allclose(np.asarray(padded)[:3], np.asarray(want), rtol=2e-4, atol=2e-4)


def test_tree_attention_branches(tiny_model):
    """Two branches sharing a prefix via seq_cp must each reproduce the
    logits of their linear-sequence equivalents."""
    params, cfg = tiny_model
    prefix = [5, 9]
    bA, bB = [23, 41], [77]

    # linear runs
    cache = kv.create(cfg.n_layers, 32, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    wantA, _ = _forward_tokens(params, cfg, cache, prefix + bA)
    cache = kv.create(cfg.n_layers, 32, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    wantB, _ = _forward_tokens(params, cfg, cache, prefix + bB)

    # tree run: prefix on seq 0, branches on seq 1 / seq 2, one batch
    cache = kv.create(cfg.n_layers, 32, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    _, cache = _forward_tokens(params, cfg, cache, prefix, seq=0)
    cache = kv.seq_cp(cache, 0, 1, 0, -1)
    cache = kv.seq_cp(cache, 0, 2, 0, -1)
    toks = jnp.asarray(bA + bB, jnp.int32)
    pos = jnp.asarray([2, 3, 2], jnp.int32)
    seq = jnp.asarray([1, 1, 2], jnp.int32)
    cells = jnp.asarray([2, 3, 4], jnp.int32)
    logits, cache = mllama.forward(
        params, cfg, cache, toks, pos, seq, cells, jnp.ones(3, bool)
    )
    got = np.asarray(logits)
    np.testing.assert_allclose(got[0], np.asarray(wantA)[2], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[1], np.asarray(wantA)[3], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[2], np.asarray(wantB)[2], rtol=2e-4, atol=2e-4)

    # rollback: branch A wins -> consolidate to seq 0 like the reference's
    # KV consolidation (speculative.cpp:585-628)
    cache = kv.seq_rm(cache, 2, 0, -1)
    cache = kv.seq_cp(cache, 1, 0, 0, -1)
    cache = kv.seq_keep(cache, 0)
    # continue on seq 0 and compare against linear run continuation
    l_cont, _ = _forward_tokens(params, cfg, cache, [12], pos0=4)
    cache_lin = kv.create(cfg.n_layers, 32, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    _, cache_lin = _forward_tokens(params, cfg, cache_lin, prefix + bA)
    l_lin, _ = _forward_tokens(params, cfg, cache_lin, [12], pos0=4)
    np.testing.assert_allclose(np.asarray(l_cont), np.asarray(l_lin), rtol=2e-4, atol=2e-4)


def test_quantized_model_close_to_float(tmp_path):
    rng = np.random.default_rng(5)
    w = testmodel.random_llama_weights(rng, n_layers=1, n_embd=256, n_heads=4,
                                      n_kv_heads=2, n_ff=256, n_vocab=128)
    common = dict(n_layers=1, n_embd=256, n_heads=4, n_kv_heads=2, n_ff=256, n_vocab=128)
    testmodel.write_llama_gguf(tmp_path / "f32.gguf", w, **common)
    testmodel.write_llama_gguf(tmp_path / "q.gguf", w, qtype=GGMLQuantType.Q8_0, **common)
    pf, cfgf = load_model(tmp_path / "f32.gguf")
    pq, cfgq = load_model(tmp_path / "q.gguf")
    tokens = [1, 2, 3, 4]
    cache = kv.create(cfgf.n_layers, 16, cfgf.n_kv_heads, cfgf.head_dim, jnp.float32)
    lf, _ = _forward_tokens(pf, cfgf, cache, tokens)
    cache = kv.create(cfgq.n_layers, 16, cfgq.n_kv_heads, cfgq.head_dim, jnp.float32)
    lq, _ = _forward_tokens(pq, cfgq, cache, tokens)
    lf, lq = np.asarray(lf), np.asarray(lq)
    assert np.abs(lf - lq).max() / (np.abs(lf).max() + 1e-6) < 0.05


def test_device_chained_draft_chain(tiny_model):
    """draft_chain(fetch=False) + a device-scalar root must produce the
    same tokens as fetched host-roundtrip chains (the bench baseline's
    zero-RTT dispatch chaining)."""
    import jax.numpy as jnp2

    from pipeinfer_tpu.runtime.context import Batch, InferenceContext

    params, cfg = tiny_model
    ref = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32)
    dev = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32)
    prompt = [3, 11, 25]
    for ctx in (ref, dev):
        b = Batch()
        for i, t in enumerate(prompt):
            b.add(t, i, 0, want_logits=(i == len(prompt) - 1))
        ctx.decode(b)

    # host-fetched chaining
    want, n_past = [], len(prompt)
    cur = 5
    for _ in range(3):
        toks, _ = ref.draft_chain(cur, n_past, 0, 4, n_cand=0)
        want.extend(toks)
        cur = toks[-1]
        n_past += 4

    # device chaining: no fetch (or any dispatch at all) between chains —
    # each chain roots at the previous program's root_next output
    outs, n_past = [], len(prompt)
    cur_dev = np.int32(5)
    for _ in range(3):
        out, cur_dev = dev.draft_chain(cur_dev, n_past, 0, 4, n_cand=0, fetch=False)
        assert cur_dev.dtype == jnp2.int32 and cur_dev.shape == ()
        outs.append(out)
        n_past += 4
    got = [int(t) for out in outs for t in np.asarray(out)[:, 0]]
    assert got == want


def test_fused_projections_exact(tmp_path):
    """Load-time wq+wk+wv -> wqkv and gate+up -> wgu fusion is EXACT: the
    fused-load forward reproduces split-load logits bit-for-bit (same
    quantized planes, lane-concatenated), on both the llama fast path and
    the generic trait path (staged stage_forward)."""
    from pipeinfer_tpu.models import generic as mgeneric

    path = tmp_path / "q.gguf"
    testmodel.build_tiny_llama(path, seed=11, qtype=GGMLQuantType.Q4_K, **CFG)
    params, cfg = load_model(path, fuse=False)
    fused, _ = load_model(path, fuse=True)
    assert "wqkv" in fused["layers"][0] and "wgu" in fused["layers"][0]
    assert "wq" not in fused["layers"][0]

    toks = [3, 17, 42, 7]
    for fwd in (mllama.forward, mgeneric.forward):
        c1 = kv.create(cfg.n_layers, 32, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
        c2 = kv.create(cfg.n_layers, 32, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
        want, _ = _forward_tokens(params, cfg, c1, toks)
        got, _ = _forward_tokens(fused, cfg, c2, toks) if fwd is mllama.forward else (None, None)
        if fwd is mgeneric.forward:
            t = len(toks)
            want, _ = fwd(params, cfg, c1, jnp.asarray(toks, jnp.int32),
                          jnp.arange(t, dtype=jnp.int32), jnp.zeros(t, jnp.int32),
                          jnp.arange(t, dtype=jnp.int32), jnp.ones(t, bool))
            got, _ = fwd(fused, cfg, c2, jnp.asarray(toks, jnp.int32),
                         jnp.arange(t, dtype=jnp.int32), jnp.zeros(t, jnp.int32),
                         jnp.arange(t, dtype=jnp.int32), jnp.ones(t, bool))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_projections_under_tp(tmp_path):
    """Fused wqkv/wgu + 2-way TP: segment sharding makes the shard-local
    fused tensors HALF width, so the forward must split them by actual
    shape, not global cfg dims (regression: gu[:, n_ff:] was empty under
    TP and the decode crashed)."""
    import jax

    from pipeinfer_tpu.parallel.tp import tp_mesh
    from pipeinfer_tpu.runtime.context import Batch, InferenceContext

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    path = tmp_path / "ftp.gguf"
    # TP shards every output dim: use tp-divisible vocab
    testmodel.build_tiny_llama(path, seed=11, **dict(CFG, n_vocab=160))
    params, cfg = load_model(path, fuse=False)
    fused, _ = load_model(path, fuse=True)
    assert "wgu" in fused["layers"][0]

    def run(p, mesh):
        ctx = InferenceContext(p, cfg, n_cells=64, cache_dtype=jnp.float32,
                               mesh=mesh)
        b = Batch()
        for i, t in enumerate([3, 17, 42]):
            b.add(t, i, 0, want_logits=True)
        return np.asarray(ctx.decode(b))

    want = run(params, None)
    got = run(fused, tp_mesh(jax.devices()[:2]))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_fused_projections_pipefused_defuse(tmp_path):
    """pipefused.stack_params de-fuses wqkv/wgu transparently."""
    import jax

    from pipeinfer_tpu.parallel import pipefused as pf

    path = tmp_path / "q2.gguf"
    cfg4 = dict(CFG, n_layers=2)
    testmodel.build_tiny_llama(path, seed=11, qtype=GGMLQuantType.Q4_K, **cfg4)
    split_params, cfg = load_model(path, fuse=False)
    fused_params, _ = load_model(path, fuse=True)
    pc = pf.PipeConfig(n_stages=2, tp=1, dp=1)
    mesh = pf.make_mesh(pc)
    a = pf.stack_params(split_params, cfg, pc, mesh)
    b = pf.stack_params(fused_params, cfg, pc, mesh)
    for k in ("wq", "wk", "wv", "w_gate", "w_up"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
