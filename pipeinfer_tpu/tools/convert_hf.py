"""`pipeinfer-convert` — HuggingFace checkpoint → GGUF
(ref: convert.py / convert-hf-to-gguf.py): reads config.json +
safetensors/pytorch weights from a local model directory, permutes q/k
projections into the ggml adjacent-pair rope layout, maps tensor names, and
writes GGUF (optionally quantized). Currently the llama family; other
architectures register mappings as their runtimes land."""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

from ..gguf.constants import GGMLQuantType, Keys
from ..gguf.writer import GGUFWriter
from .quantize import FTYPES
from .testmodel import permute_for_ggml_rope

# HF name -> (gguf name template, needs_permute: "q"|"k"|None)
LLAMA_TENSOR_MAP = {
    "model.embed_tokens.weight": ("token_embd.weight", None),
    "model.norm.weight": ("output_norm.weight", None),
    "lm_head.weight": ("output.weight", None),
    "model.layers.{i}.input_layernorm.weight": ("blk.{i}.attn_norm.weight", None),
    "model.layers.{i}.self_attn.q_proj.weight": ("blk.{i}.attn_q.weight", "q"),
    "model.layers.{i}.self_attn.k_proj.weight": ("blk.{i}.attn_k.weight", "k"),
    "model.layers.{i}.self_attn.v_proj.weight": ("blk.{i}.attn_v.weight", None),
    "model.layers.{i}.self_attn.o_proj.weight": ("blk.{i}.attn_output.weight", None),
    "model.layers.{i}.post_attention_layernorm.weight": ("blk.{i}.ffn_norm.weight", None),
    "model.layers.{i}.mlp.gate_proj.weight": ("blk.{i}.ffn_gate.weight", None),
    "model.layers.{i}.mlp.up_proj.weight": ("blk.{i}.ffn_up.weight", None),
    "model.layers.{i}.mlp.down_proj.weight": ("blk.{i}.ffn_down.weight", None),
}


def _iter_weights(model_dir: Path):
    """Yield (name, numpy array) from safetensors or torch .bin shards."""
    st_files = sorted(model_dir.glob("*.safetensors"))
    if st_files:
        from safetensors import safe_open  # available via transformers deps

        for f in st_files:
            with safe_open(f, framework="np") as sf:
                for name in sf.keys():
                    yield name, sf.get_tensor(name)
        return
    bin_files = sorted(model_dir.glob("pytorch_model*.bin"))
    if not bin_files:
        raise SystemExit(f"{model_dir}: no safetensors or pytorch_model*.bin found")
    import torch

    for f in bin_files:
        sd = torch.load(f, map_location="cpu", weights_only=True)
        for name, t in sd.items():
            yield name, t.to(torch.float32).numpy()


def _add_tokenizer(w: GGUFWriter, model_dir: Path):
    """Embed an SPM vocab from tokenizer.model (sentencepiece proto) or
    tokenizer.json."""
    tj = model_dir / "tokenizer.json"
    if not tj.exists():
        print("warning: no tokenizer.json; GGUF will have no vocab", file=sys.stderr)
        return
    data = json.loads(tj.read_text())
    model = data.get("model", {})
    if model.get("type") == "BPE" and "vocab" in model:
        vocab = model["vocab"]
        tokens = [None] * len(vocab)
        for tok, idx in vocab.items():
            if idx < len(tokens):
                tokens[idx] = tok
        tokens = [t if t is not None else f"<unused{i}>" for i, t in enumerate(tokens)]
        w.add_kv(Keys.TOKENIZER_MODEL, "gpt2")
        w.add_kv(Keys.TOKENIZER_LIST, tokens)
        w.add_kv(Keys.TOKENIZER_MERGES, [" ".join(m) if isinstance(m, list) else m for m in model.get("merges", [])])
        w.add_kv(Keys.TOKENIZER_TOKEN_TYPE, np.ones(len(tokens), np.int32))
        w.add_kv(Keys.TOKENIZER_SCORES, np.zeros(len(tokens), np.float32))
    else:
        # sentencepiece-style vocab embedded in tokenizer.json
        vocab = model.get("vocab", [])
        if vocab and isinstance(vocab[0], list):
            tokens = [v[0] for v in vocab]
            scores = np.asarray([float(v[1]) for v in vocab], np.float32)
            w.add_kv(Keys.TOKENIZER_MODEL, "llama")
            w.add_kv(Keys.TOKENIZER_LIST, tokens)
            w.add_kv(Keys.TOKENIZER_SCORES, scores)
            ttypes = np.ones(len(tokens), np.int32)
            for i, t in enumerate(tokens):
                if t.startswith("<0x") and t.endswith(">") and len(t) == 6:
                    ttypes[i] = 6  # BYTE
                elif t in ("<s>", "</s>", "<unk>"):
                    ttypes[i] = 3 if t != "<unk>" else 2
            w.add_kv(Keys.TOKENIZER_TOKEN_TYPE, ttypes)


def convert(model_dir: str | Path, out_path: str | Path, qtype: GGMLQuantType, log=print):
    model_dir = Path(model_dir)
    cfg = json.loads((model_dir / "config.json").read_text())
    if cfg.get("model_type") not in ("llama", "mistral"):
        raise SystemExit(f"unsupported model_type {cfg.get('model_type')!r} (llama family only)")

    n_layers = cfg["num_hidden_layers"]
    n_heads = cfg["num_attention_heads"]
    n_kv = cfg.get("num_key_value_heads", n_heads)
    n_embd = cfg["hidden_size"]

    w = GGUFWriter(out_path, "llama")
    w.add_arch_kv(Keys.CONTEXT_LENGTH, cfg.get("max_position_embeddings", 2048))
    w.add_arch_kv(Keys.EMBEDDING_LENGTH, n_embd)
    w.add_arch_kv(Keys.BLOCK_COUNT, n_layers)
    w.add_arch_kv(Keys.FEED_FORWARD_LENGTH, cfg["intermediate_size"])
    w.add_arch_kv(Keys.HEAD_COUNT, n_heads)
    w.add_arch_kv(Keys.HEAD_COUNT_KV, n_kv)
    w.add_arch_kv(Keys.ROPE_DIMENSION_COUNT, n_embd // n_heads)
    w.add_arch_kv(Keys.ROPE_FREQ_BASE, float(cfg.get("rope_theta", 10000.0)))
    w.add_arch_kv(Keys.LAYER_NORM_RMS_EPS, float(cfg.get("rms_norm_eps", 1e-5)))
    _add_tokenizer(w, model_dir)

    # reverse map with layer-index wildcards
    def map_name(hf_name: str):
        import re

        for pat, (tmpl, perm) in LLAMA_TENSOR_MAP.items():
            rex = "^" + pat.replace(".", r"\.").replace(r"\.{i}\.", r"\.(\d+)\.") + "$"
            m = re.match(rex, hf_name)
            if m:
                gname = tmpl.replace("{i}", m.group(1)) if m.groups() else tmpl
                return gname, perm
        return None, None

    seen_output = False
    for name, arr in _iter_weights(model_dir):
        gname, perm = map_name(name)
        if gname is None:
            log(f"  skip {name}")
            continue
        arr = np.asarray(arr, np.float32)
        if perm == "q":
            arr = permute_for_ggml_rope(arr, n_heads)
        elif perm == "k":
            arr = permute_for_ggml_rope(arr, n_kv)
        tq = qtype
        if arr.ndim != 2 or arr.shape[-1] % 256 != 0:
            tq = GGMLQuantType.F32
        w.add_tensor(gname, arr, qtype=tq)
        seen_output = seen_output or gname == "output.weight"
        log(f"  {name} -> {gname} {tuple(arr.shape)} {tq.name}")
    if not seen_output:
        log("  (tied embeddings: no output.weight)")
    w.write()


def main(argv=None):
    p = argparse.ArgumentParser("pipeinfer-convert", description=__doc__)
    p.add_argument("model_dir", help="local HF model directory")
    p.add_argument("out", help="output GGUF path")
    p.add_argument("--ftype", choices=sorted(FTYPES), default="f16")
    p.add_argument("-q", "--quiet", action="store_true")
    args = p.parse_args(argv)
    log = (lambda *a: None) if args.quiet else (lambda *a: print(*a, file=sys.stderr))
    convert(args.model_dir, args.out, FTYPES[args.ftype], log=log)
    return 0


if __name__ == "__main__":
    sys.exit(main())
