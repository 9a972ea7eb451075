"""Multi-architecture logit parity vs HuggingFace transformers (float
oracles): falcon (parallel residual + neox rope + MQA), starcoder
(gpt_bigcode: learned positions + MQA), mpt (alibi), bloom (alibi +
embedding norm + interleaved qkv), stablelm (partial neox rope)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pipeinfer_tpu.gguf.constants import Keys
from pipeinfer_tpu.gguf.writer import GGUFWriter
from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.models.loader import forward_for_arch
from pipeinfer_tpu.runtime import kv_cache as kv

torch = pytest.importorskip("torch")
tf = pytest.importorskip("transformers")

TOKENS = [3, 17, 42, 7, 101, 55]


def _common_kv(w: GGUFWriter, *, n_embd, n_layers, n_heads, n_kv, n_ff, n_vocab, eps,
               rms=False, rope_dims=None, alibi=None):
    w.add_arch_kv(Keys.EMBEDDING_LENGTH, n_embd)
    w.add_arch_kv(Keys.BLOCK_COUNT, n_layers)
    w.add_arch_kv(Keys.HEAD_COUNT, n_heads)
    w.add_arch_kv(Keys.HEAD_COUNT_KV, n_kv)
    w.add_arch_kv(Keys.FEED_FORWARD_LENGTH, n_ff)
    w.add_arch_kv(Keys.CONTEXT_LENGTH, 512)
    w.add_kv("general.vocab_size", n_vocab)
    if rms:
        w.add_arch_kv(Keys.LAYER_NORM_RMS_EPS, float(eps))
    else:
        w.add_arch_kv(Keys.LAYER_NORM_EPS, float(eps))
    if rope_dims is not None:
        w.add_arch_kv(Keys.ROPE_DIMENSION_COUNT, rope_dims)
    if alibi is not None:
        w.add_arch_kv(Keys.MAX_ALIBI_BIAS, float(alibi))


def _run_ours(path, tokens):
    params, cfg = load_model(path)
    cache = kv.create(cfg.n_layers, 32, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    fwd = forward_for_arch(cfg.arch)
    t = len(tokens)
    logits, _ = fwd(
        params, cfg, cache,
        jnp.asarray(tokens, jnp.int32),
        jnp.arange(t, dtype=jnp.int32),
        jnp.zeros(t, jnp.int32),
        jnp.arange(t, dtype=jnp.int32),
        jnp.ones(t, bool),
    )
    return np.asarray(logits)


def _check(got, want, tol=3e-3):
    scale = np.abs(want).max()
    err = np.abs(got - want).max()
    assert err / scale < tol, f"logit mismatch {err} (scale {scale})"
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def _sd(model):
    return {k: v.detach().float().numpy() for k, v in model.state_dict().items()}


def test_falcon_parity(tmp_path):
    conf = tf.FalconConfig(
        vocab_size=160, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_kv_heads=1, multi_query=True, new_decoder_architecture=False,
        parallel_attn=True, bias=False, alibi=False, layer_norm_epsilon=1e-5,
    )
    torch.manual_seed(1)
    hf = tf.FalconForCausalLM(conf).eval()
    sd = _sd(hf)
    path = tmp_path / "falcon.gguf"
    w = GGUFWriter(path, "falcon")
    _common_kv(w, n_embd=64, n_layers=2, n_heads=4, n_kv=1, n_ff=256, n_vocab=160, eps=1e-5)
    w.add_tensor("token_embd.weight", sd["transformer.word_embeddings.weight"])
    w.add_tensor("output_norm.weight", sd["transformer.ln_f.weight"])
    w.add_tensor("output_norm.bias", sd["transformer.ln_f.bias"])
    w.add_tensor("output.weight", sd["lm_head.weight"])
    for i in range(2):
        p = f"transformer.h.{i}."
        w.add_tensor(f"blk.{i}.attn_norm.weight", sd[p + "input_layernorm.weight"])
        w.add_tensor(f"blk.{i}.attn_norm.bias", sd[p + "input_layernorm.bias"])
        # falcon MQA qkv is already [Q;K;V] flat
        w.add_tensor(f"blk.{i}.attn_qkv.weight", sd[p + "self_attention.query_key_value.weight"])
        w.add_tensor(f"blk.{i}.attn_output.weight", sd[p + "self_attention.dense.weight"])
        w.add_tensor(f"blk.{i}.ffn_up.weight", sd[p + "mlp.dense_h_to_4h.weight"])
        w.add_tensor(f"blk.{i}.ffn_down.weight", sd[p + "mlp.dense_4h_to_h.weight"])
    w.write()

    with torch.no_grad():
        want = hf(torch.tensor([TOKENS])).logits[0].numpy()
    _check(_run_ours(path, TOKENS), want)


def test_starcoder_parity(tmp_path):
    conf = tf.GPTBigCodeConfig(
        vocab_size=160, n_embd=64, n_layer=2, n_head=4, n_inner=256,
        multi_query=True, n_positions=128, layer_norm_epsilon=1e-5,
        activation_function="gelu_pytorch_tanh",
    )
    torch.manual_seed(2)
    hf = tf.GPTBigCodeForCausalLM(conf).eval()
    sd = _sd(hf)
    path = tmp_path / "sc.gguf"
    w = GGUFWriter(path, "starcoder")
    _common_kv(w, n_embd=64, n_layers=2, n_heads=4, n_kv=1, n_ff=256, n_vocab=160, eps=1e-5)
    w.add_tensor("token_embd.weight", sd["transformer.wte.weight"])
    w.add_tensor("position_embd.weight", sd["transformer.wpe.weight"])
    w.add_tensor("output_norm.weight", sd["transformer.ln_f.weight"])
    w.add_tensor("output_norm.bias", sd["transformer.ln_f.bias"])
    w.add_tensor("output.weight", sd["lm_head.weight"])
    for i in range(2):
        p = f"transformer.h.{i}."
        w.add_tensor(f"blk.{i}.attn_norm.weight", sd[p + "ln_1.weight"])
        w.add_tensor(f"blk.{i}.attn_norm.bias", sd[p + "ln_1.bias"])
        w.add_tensor(f"blk.{i}.attn_qkv.weight", sd[p + "attn.c_attn.weight"])
        w.add_tensor(f"blk.{i}.attn_qkv.bias", sd[p + "attn.c_attn.bias"])
        w.add_tensor(f"blk.{i}.attn_output.weight", sd[p + "attn.c_proj.weight"])
        w.add_tensor(f"blk.{i}.attn_output.bias", sd[p + "attn.c_proj.bias"])
        w.add_tensor(f"blk.{i}.ffn_norm.weight", sd[p + "ln_2.weight"])
        w.add_tensor(f"blk.{i}.ffn_norm.bias", sd[p + "ln_2.bias"])
        w.add_tensor(f"blk.{i}.ffn_up.weight", sd[p + "mlp.c_fc.weight"])
        w.add_tensor(f"blk.{i}.ffn_up.bias", sd[p + "mlp.c_fc.bias"])
        w.add_tensor(f"blk.{i}.ffn_down.weight", sd[p + "mlp.c_proj.weight"])
        w.add_tensor(f"blk.{i}.ffn_down.bias", sd[p + "mlp.c_proj.bias"])
    w.write()

    with torch.no_grad():
        want = hf(torch.tensor([TOKENS])).logits[0].numpy()
    # gelu tanh vs exact gelu: slightly looser
    _check(_run_ours(path, TOKENS), want, tol=8e-3)


def test_mpt_parity(tmp_path):
    conf = tf.MptConfig(
        vocab_size=160, d_model=64, n_layers=2, n_heads=4, expansion_ratio=4,
        max_seq_len=128, layer_norm_epsilon=1e-5, no_bias=True,
        attn_config=tf.models.mpt.configuration_mpt.MptAttentionConfig(
            alibi=True, alibi_bias_max=8, attn_impl="torch"
        ),
    )
    torch.manual_seed(3)
    hf = tf.MptForCausalLM(conf).eval()
    sd = _sd(hf)
    path = tmp_path / "mpt.gguf"
    w = GGUFWriter(path, "mpt")
    _common_kv(w, n_embd=64, n_layers=2, n_heads=4, n_kv=4, n_ff=256, n_vocab=160,
               eps=1e-5, alibi=8.0)
    w.add_tensor("token_embd.weight", sd["transformer.wte.weight"])
    w.add_tensor("output_norm.weight", sd["transformer.norm_f.weight"])
    for i in range(2):
        p = f"transformer.blocks.{i}."
        w.add_tensor(f"blk.{i}.attn_norm.weight", sd[p + "norm_1.weight"])
        w.add_tensor(f"blk.{i}.attn_qkv.weight", sd[p + "attn.Wqkv.weight"])
        w.add_tensor(f"blk.{i}.attn_output.weight", sd[p + "attn.out_proj.weight"])
        w.add_tensor(f"blk.{i}.ffn_norm.weight", sd[p + "norm_2.weight"])
        w.add_tensor(f"blk.{i}.ffn_up.weight", sd[p + "ffn.up_proj.weight"])
        w.add_tensor(f"blk.{i}.ffn_down.weight", sd[p + "ffn.down_proj.weight"])
    w.write()

    with torch.no_grad():
        want = hf(torch.tensor([TOKENS])).logits[0].numpy()
    _check(_run_ours(path, TOKENS), want, tol=8e-3)


def _make_bloom(path):
    conf = tf.BloomConfig(
        vocab_size=160, hidden_size=64, n_layer=2, n_head=4,
        layer_norm_epsilon=1e-5,
    )
    torch.manual_seed(4)
    hf = tf.BloomForCausalLM(conf).eval()
    sd = _sd(hf)
    w = GGUFWriter(path, "bloom")
    _common_kv(w, n_embd=64, n_layers=2, n_heads=4, n_kv=4, n_ff=256, n_vocab=160,
               eps=1e-5, alibi=8.0)
    w.add_tensor("token_embd.weight", sd["transformer.word_embeddings.weight"])
    w.add_tensor("token_embd_norm.weight", sd["transformer.word_embeddings_layernorm.weight"])
    w.add_tensor("token_embd_norm.bias", sd["transformer.word_embeddings_layernorm.bias"])
    w.add_tensor("output_norm.weight", sd["transformer.ln_f.weight"])
    w.add_tensor("output_norm.bias", sd["transformer.ln_f.bias"])
    w.add_tensor("output.weight", sd["lm_head.weight"])

    def reorder_qkv(wq, n_head, d):
        # bloom fuses per-head [q,k,v]; runtime wants [Q;K;V]
        # (ref: convert-hf-to-gguf BloomModel reordering)
        x = wq.reshape(n_head, 3, d, -1) if wq.ndim == 2 else wq.reshape(n_head, 3, d)
        out = np.concatenate([x[:, 0], x[:, 1], x[:, 2]], axis=0)
        return out.reshape(3 * n_head * d, -1) if wq.ndim == 2 else out.reshape(-1)

    for i in range(2):
        p = f"transformer.h.{i}."
        w.add_tensor(f"blk.{i}.attn_norm.weight", sd[p + "input_layernorm.weight"])
        w.add_tensor(f"blk.{i}.attn_norm.bias", sd[p + "input_layernorm.bias"])
        w.add_tensor(f"blk.{i}.attn_qkv.weight",
                     reorder_qkv(sd[p + "self_attention.query_key_value.weight"], 4, 16))
        w.add_tensor(f"blk.{i}.attn_qkv.bias",
                     reorder_qkv(sd[p + "self_attention.query_key_value.bias"], 4, 16))
        w.add_tensor(f"blk.{i}.attn_output.weight", sd[p + "self_attention.dense.weight"])
        w.add_tensor(f"blk.{i}.attn_output.bias", sd[p + "self_attention.dense.bias"])
        w.add_tensor(f"blk.{i}.ffn_norm.weight", sd[p + "post_attention_layernorm.weight"])
        w.add_tensor(f"blk.{i}.ffn_norm.bias", sd[p + "post_attention_layernorm.bias"])
        w.add_tensor(f"blk.{i}.ffn_up.weight", sd[p + "mlp.dense_h_to_4h.weight"])
        w.add_tensor(f"blk.{i}.ffn_up.bias", sd[p + "mlp.dense_h_to_4h.bias"])
        w.add_tensor(f"blk.{i}.ffn_down.weight", sd[p + "mlp.dense_4h_to_h.weight"])
        w.add_tensor(f"blk.{i}.ffn_down.bias", sd[p + "mlp.dense_4h_to_h.bias"])
    w.write()
    return hf


def test_bloom_parity(tmp_path):
    path = tmp_path / "bloom.gguf"
    hf = _make_bloom(path)
    with torch.no_grad():
        want = hf(torch.tensor([TOKENS])).logits[0].numpy()
    _check(_run_ours(path, TOKENS), want, tol=8e-3)


def test_bloom_tensor_parallel(tmp_path):
    """ALiBi + fused-qkv arch under 2-way TP: global-head slope slicing
    and per-segment fused-qkv sharding must reproduce the single-device
    logits (closes the r2 'ALiBi archs can't run TP' gap)."""
    import jax

    from pipeinfer_tpu.parallel.tp import tp_mesh
    from pipeinfer_tpu.runtime.context import Batch, InferenceContext

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    path = tmp_path / "bloom.gguf"
    _make_bloom(path)
    params, cfg = load_model(path)

    def run(mesh):
        ctx = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32,
                               mesh=mesh)
        b = Batch()
        for i, t in enumerate(TOKENS):
            b.add(t, i, 0, want_logits=True)
        return np.asarray(ctx.decode(b))

    want = run(None)
    got = run(tp_mesh(jax.devices()[:2]))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_stablelm_parity(tmp_path):
    conf = tf.StableLmConfig(
        vocab_size=160, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, intermediate_size=256, rope_pct=0.25,
        partial_rotary_factor=0.25, layer_norm_eps=1e-5, use_qkv_bias=False,
        max_position_embeddings=128,
    )
    torch.manual_seed(5)
    hf = tf.StableLmForCausalLM(conf).eval()
    sd = _sd(hf)
    path = tmp_path / "sl.gguf"
    w = GGUFWriter(path, "stablelm")
    _common_kv(w, n_embd=64, n_layers=2, n_heads=4, n_kv=4, n_ff=256, n_vocab=160,
               eps=1e-5, rope_dims=4)  # 16 * 0.25
    w.add_tensor("token_embd.weight", sd["model.embed_tokens.weight"])
    w.add_tensor("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor("output_norm.bias", sd["model.norm.bias"])
    w.add_tensor("output.weight", sd["lm_head.weight"])
    for i in range(2):
        p = f"model.layers.{i}."
        w.add_tensor(f"blk.{i}.attn_norm.weight", sd[p + "input_layernorm.weight"])
        w.add_tensor(f"blk.{i}.attn_norm.bias", sd[p + "input_layernorm.bias"])
        w.add_tensor(f"blk.{i}.attn_q.weight", sd[p + "self_attn.q_proj.weight"])
        w.add_tensor(f"blk.{i}.attn_k.weight", sd[p + "self_attn.k_proj.weight"])
        w.add_tensor(f"blk.{i}.attn_v.weight", sd[p + "self_attn.v_proj.weight"])
        w.add_tensor(f"blk.{i}.attn_output.weight", sd[p + "self_attn.o_proj.weight"])
        w.add_tensor(f"blk.{i}.ffn_norm.weight", sd[p + "post_attention_layernorm.weight"])
        w.add_tensor(f"blk.{i}.ffn_norm.bias", sd[p + "post_attention_layernorm.bias"])
        w.add_tensor(f"blk.{i}.ffn_gate.weight", sd[p + "mlp.gate_proj.weight"])
        w.add_tensor(f"blk.{i}.ffn_up.weight", sd[p + "mlp.up_proj.weight"])
        w.add_tensor(f"blk.{i}.ffn_down.weight", sd[p + "mlp.down_proj.weight"])
    w.write()

    with torch.no_grad():
        want = hf(torch.tensor([TOKENS])).logits[0].numpy()
    _check(_run_ours(path, TOKENS), want)


def test_persimmon_parity(tmp_path):
    conf = tf.PersimmonConfig(
        vocab_size=160, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=256, partial_rotary_factor=0.5, layer_norm_eps=1e-5,
        qk_layernorm=True, max_position_embeddings=128, hidden_act="relu2",
    )
    torch.manual_seed(6)
    hf = tf.PersimmonForCausalLM(conf).eval()
    sd = _sd(hf)
    path = tmp_path / "per.gguf"
    w = GGUFWriter(path, "persimmon")
    _common_kv(w, n_embd=64, n_layers=2, n_heads=4, n_kv=4, n_ff=256, n_vocab=160,
               eps=1e-5, rope_dims=8)  # head_dim/2
    w.add_tensor("token_embd.weight", sd["model.embed_tokens.weight"])
    w.add_tensor("output_norm.weight", sd["model.final_layernorm.weight"])
    w.add_tensor("output_norm.bias", sd["model.final_layernorm.bias"])
    w.add_tensor("output.weight", sd["lm_head.weight"])

    def deinterleave(qkv, n_head, d):
        # HF persimmon fuses per-head [q;k;v]; runtime wants [Q;K;V]
        # (ref: convert-persimmon-to-gguf reordering)
        x = qkv.reshape(n_head, 3, d, -1) if qkv.ndim == 2 else qkv.reshape(n_head, 3, d)
        out = np.concatenate([x[:, 0], x[:, 1], x[:, 2]], axis=0)
        return out.reshape(3 * n_head * d, -1) if qkv.ndim == 2 else out.reshape(-1)

    for i in range(2):
        p = f"model.layers.{i}."
        w.add_tensor(f"blk.{i}.attn_norm.weight", sd[p + "input_layernorm.weight"])
        w.add_tensor(f"blk.{i}.attn_norm.bias", sd[p + "input_layernorm.bias"])
        w.add_tensor(f"blk.{i}.attn_qkv.weight",
                     deinterleave(sd[p + "self_attn.query_key_value.weight"], 4, 16))
        w.add_tensor(f"blk.{i}.attn_qkv.bias",
                     deinterleave(sd[p + "self_attn.query_key_value.bias"], 4, 16))
        w.add_tensor(f"blk.{i}.attn_q_norm.weight", sd[p + "self_attn.q_layernorm.weight"])
        w.add_tensor(f"blk.{i}.attn_q_norm.bias", sd[p + "self_attn.q_layernorm.bias"])
        w.add_tensor(f"blk.{i}.attn_k_norm.weight", sd[p + "self_attn.k_layernorm.weight"])
        w.add_tensor(f"blk.{i}.attn_k_norm.bias", sd[p + "self_attn.k_layernorm.bias"])
        w.add_tensor(f"blk.{i}.attn_output.weight", sd[p + "self_attn.dense.weight"])
        w.add_tensor(f"blk.{i}.attn_output.bias", sd[p + "self_attn.dense.bias"])
        w.add_tensor(f"blk.{i}.ffn_norm.weight", sd[p + "post_attention_layernorm.weight"])
        w.add_tensor(f"blk.{i}.ffn_norm.bias", sd[p + "post_attention_layernorm.bias"])
        w.add_tensor(f"blk.{i}.ffn_up.weight", sd[p + "mlp.dense_h_to_4h.weight"])
        w.add_tensor(f"blk.{i}.ffn_up.bias", sd[p + "mlp.dense_h_to_4h.bias"])
        w.add_tensor(f"blk.{i}.ffn_down.weight", sd[p + "mlp.dense_4h_to_h.weight"])
        w.add_tensor(f"blk.{i}.ffn_down.bias", sd[p + "mlp.dense_4h_to_h.bias"])
    w.write()

    with torch.no_grad():
        want = hf(torch.tensor([TOKENS])).logits[0].numpy()
    _check(_run_ours(path, TOKENS), want, tol=8e-3)
