"""`python -m pipeinfer_tpu.tools.embedding` — sentence embeddings
(ref: examples/embedding): mean-pooled, L2-normalized final hidden states
(post output-norm, pre-head)."""

from __future__ import annotations

import argparse
import sys

import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..models import load_model
from ..models.loader import forward_for_arch
from ..runtime import kv_cache as kv
from ..tokenizer import tokenizer_from_gguf


def embed_text(params, cfg, text_ids: list[int]) -> np.ndarray:
    cache = kv.create(cfg.n_layers, len(text_ids) + 8, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    t = len(text_ids)
    fwd = forward_for_arch(cfg.arch)
    hidden, _ = fwd(
        params,
        cfg,
        cache,
        jnp.asarray(text_ids, jnp.int32),
        jnp.arange(t, dtype=jnp.int32),
        jnp.zeros(t, jnp.int32),
        jnp.arange(t, dtype=jnp.int32),
        jnp.ones(t, bool),
        output_hidden=True,
    )
    emb = np.asarray(hidden).mean(axis=0)
    return emb / (np.linalg.norm(emb) + 1e-8)


def main(argv=None):
    p = argparse.ArgumentParser("pipeinfer-embedding", description=__doc__)
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-p", "--prompt", default="")
    args = p.parse_args(argv)
    params, cfg = load_model(args.model)
    with GGUFReader(args.model) as r:
        tok = tokenizer_from_gguf(r)
    ids = tok.encode(args.prompt, add_bos=True)
    emb = embed_text(params, cfg, ids)
    print(" ".join(f"{x:.6f}" for x in emb))
    return 0


if __name__ == "__main__":
    sys.exit(main())
