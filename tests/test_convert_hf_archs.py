"""End-to-end converter parity: save a tiny HF checkpoint with
save_pretrained, convert it with tools.convert_hf (the user-facing
pipeline), run the converted GGUF through our runtime, and match
transformers logits (ref: convert-hf-to-gguf.py:1 — the reference's
equivalent tool for the non-llama architectures)."""

import json

import numpy as np
import pytest

from pipeinfer_tpu.gguf.constants import GGMLQuantType
from pipeinfer_tpu.tools import convert_hf

torch = pytest.importorskip("torch")
tf = pytest.importorskip("transformers")

from .test_model_archs import TOKENS, _check, _run_ours  # noqa: E402


def _save(hf, conf, tmp_path):
    d = tmp_path / "hf"
    hf.save_pretrained(d, safe_serialization=True)
    # save_pretrained writes config.json from conf already
    assert (d / "config.json").exists()
    return d


def _convert_and_check(hf, conf, tmp_path, tol=8e-3):
    d = _save(hf, conf, tmp_path)
    out = tmp_path / "m.gguf"
    convert_hf.convert(d, out, GGMLQuantType.F32, log=lambda *a: None)
    with torch.no_grad():
        want = hf(torch.tensor([TOKENS])).logits[0].numpy()
    _check(_run_ours(out, TOKENS), want, tol=tol)


def test_convert_falcon_7b_style(tmp_path):
    conf = tf.FalconConfig(
        vocab_size=160, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_kv_heads=1, multi_query=True, new_decoder_architecture=False,
        parallel_attn=True, bias=False, alibi=False, layer_norm_epsilon=1e-5,
    )
    torch.manual_seed(21)
    _convert_and_check(tf.FalconForCausalLM(conf).eval(), conf, tmp_path)


def test_convert_falcon_40b_style(tmp_path):
    """new_decoder_architecture: grouped KV + dual layer norms — exercises
    the kv-group qkv rearrangement (ref: convert-hf-to-gguf.py:631-648)."""
    conf = tf.FalconConfig(
        vocab_size=160, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_kv_heads=2, multi_query=False, new_decoder_architecture=True,
        parallel_attn=True, bias=False, alibi=False, layer_norm_epsilon=1e-5,
    )
    torch.manual_seed(22)
    _convert_and_check(tf.FalconForCausalLM(conf).eval(), conf, tmp_path)


def test_convert_starcoder(tmp_path):
    conf = tf.GPTBigCodeConfig(
        vocab_size=160, n_embd=64, n_layer=2, n_head=4, n_inner=256,
        multi_query=True, n_positions=128, layer_norm_epsilon=1e-5,
        activation_function="gelu_pytorch_tanh",
    )
    torch.manual_seed(23)
    _convert_and_check(tf.GPTBigCodeForCausalLM(conf).eval(), conf, tmp_path)


def test_convert_mpt(tmp_path):
    conf = tf.MptConfig(
        vocab_size=160, d_model=64, n_layers=2, n_heads=4, expansion_ratio=4,
        max_seq_len=128, layer_norm_epsilon=1e-5, no_bias=True,
        attn_config=tf.models.mpt.configuration_mpt.MptAttentionConfig(
            alibi=True, alibi_bias_max=8, attn_impl="torch"
        ),
    )
    torch.manual_seed(24)
    _convert_and_check(tf.MptForCausalLM(conf).eval(), conf, tmp_path)


def test_convert_bloom(tmp_path):
    conf = tf.BloomConfig(
        vocab_size=160, hidden_size=64, n_layer=2, n_head=4, layer_norm_epsilon=1e-5,
    )
    torch.manual_seed(25)
    _convert_and_check(tf.BloomForCausalLM(conf).eval(), conf, tmp_path)


def test_convert_stablelm(tmp_path):
    conf = tf.StableLmConfig(
        vocab_size=160, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, intermediate_size=256, rope_pct=0.25,
        partial_rotary_factor=0.25, layer_norm_eps=1e-5, use_qkv_bias=False,
        max_position_embeddings=128,
    )
    torch.manual_seed(26)
    _convert_and_check(tf.StableLmForCausalLM(conf).eval(), conf, tmp_path, tol=3e-3)


def test_convert_persimmon(tmp_path):
    conf = tf.PersimmonConfig(
        vocab_size=160, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=256, partial_rotary_factor=0.5, layer_norm_eps=1e-5,
        qk_layernorm=True, max_position_embeddings=128, hidden_act="relu2",
    )
    torch.manual_seed(27)
    _convert_and_check(tf.PersimmonForCausalLM(conf).eval(), conf, tmp_path)


def test_convert_baichuan_wpack(tmp_path):
    """Baichuan W_pack split + rope permute, validated against an
    equivalent hand-exported llama GGUF (no HF class without remote code:
    build a llama model, fuse its qkv into W_pack, convert, compare)."""
    conf = tf.LlamaConfig(
        vocab_size=160, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, intermediate_size=256, rms_norm_eps=1e-5,
        max_position_embeddings=128,
    )
    torch.manual_seed(28)
    hf = tf.LlamaForCausalLM(conf).eval()
    d = tmp_path / "hf"
    d.mkdir()
    # build a baichuan-style checkpoint: fuse q/k/v into W_pack
    sd = {k: v.detach().float() for k, v in hf.state_dict().items()}
    new_sd = {}
    for k, v in sd.items():
        if ".self_attn.q_proj.weight" in k:
            base = k.replace(".q_proj.weight", "")
            q = sd[base + ".q_proj.weight"]
            kk = sd[base + ".k_proj.weight"]
            vv = sd[base + ".v_proj.weight"]
            new_sd[base + ".W_pack.weight"] = torch.cat([q, kk, vv], dim=0)
        elif ".self_attn.k_proj.weight" in k or ".self_attn.v_proj.weight" in k:
            continue
        else:
            new_sd[k] = v
    from safetensors.torch import save_file

    save_file(new_sd, d / "model.safetensors")
    (d / "config.json").write_text(json.dumps({
        "model_type": "baichuan",
        "architectures": ["BaichuanForCausalLM"],
        "hidden_size": 64, "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 4, "intermediate_size": 256,
        "rms_norm_eps": 1e-5, "max_position_embeddings": 128,
        "vocab_size": 160,
    }))
    out = tmp_path / "m.gguf"
    convert_hf.convert(d, out, GGMLQuantType.F32, log=lambda *a: None)
    with torch.no_grad():
        want = hf(torch.tensor([TOKENS])).logits[0].numpy()
    _check(_run_ours(out, TOKENS), want, tol=3e-3)


def test_convert_refact(tmp_path):
    """Refact: split fused kv and gate_up tensors. No transformers class at
    the reference's era — validate the split/mapping against a hand-built
    GGUF produced from the same weights."""
    rng = np.random.default_rng(29)
    n_embd, n_head, n_vocab, n_layer = 64, 4, 160, 2
    head_dim = n_embd // n_head
    ff = 256 * ((int(2 * (4 * n_embd) / 3) + 255) // 256)

    def r(*s):
        return (rng.standard_normal(s) * 0.08).astype(np.float32)

    tensors = {
        "transformer.wte.weight": r(n_vocab, n_embd),
        "ln_f.weight": np.ones(n_embd, np.float32),
        "lm_head.weight": r(n_vocab, n_embd),
    }
    for i in range(n_layer):
        p = f"transformer.h.{i}."
        tensors[p + "ln_1.weight"] = np.ones(n_embd, np.float32)
        tensors[p + "attn.q.weight"] = r(n_embd, n_embd)
        tensors[p + "attn.kv.weight"] = r(2 * head_dim, n_embd)
        tensors[p + "attn.c_proj.weight"] = r(n_embd, n_embd)
        tensors[p + "ln_2.weight"] = np.ones(n_embd, np.float32)
        tensors[p + "mlp.gate_up_proj.weight"] = r(2 * ff, n_embd)
        tensors[p + "mlp.c_proj.weight"] = r(n_embd, ff)

    d = tmp_path / "hf"
    d.mkdir()
    from safetensors.numpy import save_file

    save_file(tensors, d / "model.safetensors")
    (d / "config.json").write_text(json.dumps({
        "model_type": "gpt_refact", "n_embd": n_embd, "n_layer": n_layer,
        "n_head": n_head, "n_positions": 128, "layer_norm_epsilon": 1e-5,
        "vocab_size": n_vocab,
    }))
    out = tmp_path / "m.gguf"
    convert_hf.convert(d, out, GGMLQuantType.F32, log=lambda *a: None)

    # ground truth: identical weights through the fixture-style direct GGUF
    from pipeinfer_tpu.gguf.writer import GGUFWriter
    from .test_model_archs import _common_kv

    ref = tmp_path / "ref.gguf"
    w = GGUFWriter(ref, "refact")
    _common_kv(w, n_embd=n_embd, n_layers=n_layer, n_heads=n_head, n_kv=1,
               n_ff=ff, n_vocab=n_vocab, eps=1e-5, rms=True, alibi=8.0)
    w.add_tensor("token_embd.weight", tensors["transformer.wte.weight"])
    w.add_tensor("output_norm.weight", tensors["ln_f.weight"])
    w.add_tensor("output.weight", tensors["lm_head.weight"])
    for i in range(n_layer):
        p = f"transformer.h.{i}."
        w.add_tensor(f"blk.{i}.attn_norm.weight", tensors[p + "ln_1.weight"])
        w.add_tensor(f"blk.{i}.attn_q.weight", tensors[p + "attn.q.weight"])
        w.add_tensor(f"blk.{i}.attn_k.weight", tensors[p + "attn.kv.weight"][:head_dim])
        w.add_tensor(f"blk.{i}.attn_v.weight", tensors[p + "attn.kv.weight"][head_dim:])
        w.add_tensor(f"blk.{i}.attn_output.weight", tensors[p + "attn.c_proj.weight"])
        w.add_tensor(f"blk.{i}.ffn_norm.weight", tensors[p + "ln_2.weight"])
        w.add_tensor(f"blk.{i}.ffn_gate.weight", tensors[p + "mlp.gate_up_proj.weight"][:ff])
        w.add_tensor(f"blk.{i}.ffn_up.weight", tensors[p + "mlp.gate_up_proj.weight"][ff:])
        w.add_tensor(f"blk.{i}.ffn_down.weight", tensors[p + "mlp.c_proj.weight"])
    w.write()

    got = _run_ours(out, TOKENS)
    want = _run_ours(ref, TOKENS)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
