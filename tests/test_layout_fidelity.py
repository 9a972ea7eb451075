"""Model-level fidelity of the lossy device layouts (ADVICE r3 medium #2).

The i4g layout re-quantizes per-32-group Q4 weights onto a 128-row affine
grid (ops/qmatmul._i4g_planes_jit) — per-tensor rms budgets are enforced in
test_qmatmul, but the DEFAULT-layout decision needs end-to-end evidence:
on a trained model (peaked, realistic distributions) the perplexity ratio
vs the exact-dequant k_major layout and the greedy top-1 agreement must
stay within budget. (On random-weight models the logits are nearly flat
and argmax flips on noise — that case bounds nothing; the reference's
perplexity tooling likewise measures trained checkpoints.)"""

import numpy as np
import pytest

import jax.numpy as jnp

from pipeinfer_tpu.gguf.constants import GGMLQuantType
from pipeinfer_tpu.gguf.reader import GGUFReader
from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.runtime.context import Batch, InferenceContext
from pipeinfer_tpu.tokenizer import tokenizer_from_gguf
from pipeinfer_tpu.tools import testmodel
from pipeinfer_tpu.tools.finetune import dense_params, train

VOCAB_FIXTURE = "/root/reference/models/ggml-vocab-llama.gguf"
CORPUS = (
    "the quick brown fox jumps over the lazy dog and then "
    "the quick brown fox jumps over the lazy dog again because "
) * 30


@pytest.fixture(scope="module")
def trained_q4k(tmp_path_factory):
    d = tmp_path_factory.mktemp("fidelity")
    with GGUFReader(VOCAB_FIXTURE) as r:
        tok = tokenizer_from_gguf(r)
    stream = np.asarray(tok.encode(CORPUS, add_bos=True), np.int32)
    init = d / "init.gguf"
    testmodel.build_tiny_llama(
        init, seed=1, n_layers=2, n_embd=128, n_heads=4, n_kv_heads=4,
        n_ff=256, vocab_from=VOCAB_FIXTURE,
    )
    params, cfg = load_model(init)
    params = dense_params(params)
    params, losses = train(
        params, cfg, stream, seq_len=48, batch=4, steps=220, lr=6e-3,
        log=lambda s: None, seed=1,
    )
    assert losses[-1] < 1.0, losses[-1]
    w = {
        "tok_embd": np.asarray(params["tok_embd"], np.float32),
        "output_norm": np.asarray(params["output_norm"], np.float32),
        "output": np.asarray(params["output"], np.float32),
    }
    for i, lp in enumerate(params["layers"]):
        for slot, arr in lp.items():
            w[f"layers.{i}.{slot}"] = np.asarray(arr, np.float32)
    q = d / "q.gguf"
    testmodel.build_tiny_llama(
        q, n_layers=cfg.n_layers, n_embd=cfg.n_embd, n_heads=cfg.n_heads,
        n_kv_heads=cfg.n_kv_heads, n_ff=cfg.n_ff, vocab_from=VOCAB_FIXTURE,
        weights=w, qtype=GGMLQuantType.Q4_K,
    )
    return q, stream[:96]


def _logits(path, layout, toks, monkeypatch):
    monkeypatch.setenv("PIPEINFER_WEIGHT_LAYOUT", layout)
    params, cfg = load_model(path)
    monkeypatch.delenv("PIPEINFER_WEIGHT_LAYOUT")
    ctx = InferenceContext(params, cfg, n_cells=128, cache_dtype=jnp.float32)
    b = Batch()
    for i, t in enumerate(toks):
        b.add(int(t), i, 0)
    return np.asarray(ctx.decode(b))


def _ce(logits, nxt):
    z = logits - logits.max(-1, keepdims=True)
    lp = z - np.log(np.exp(z).sum(-1, keepdims=True))
    return float(-lp[np.arange(len(nxt)), nxt].mean())


@pytest.mark.parametrize("layout,ppl_budget", [("i8g", 1.005), ("i4g", 1.02)])
def test_layout_perplexity_parity(trained_q4k, layout, ppl_budget, monkeypatch):
    path, toks = trained_q4k
    exact = _logits(path, "k_major", toks, monkeypatch)
    got = _logits(path, layout, toks, monkeypatch)
    nxt = toks[1:]
    ce_exact = _ce(exact[:-1], nxt)
    ce_got = _ce(got[:-1], nxt)
    ppl_ratio = float(np.exp(ce_got - ce_exact))
    top1 = float((exact.argmax(-1) == got.argmax(-1)).mean())
    print(f"{layout}: ppl ratio {ppl_ratio:.4f} (budget {ppl_budget}), "
          f"top-1 agreement {top1:.4f}")
    assert ppl_ratio <= ppl_budget, (layout, ppl_ratio)
    assert top1 >= 0.99, (layout, top1)
