"""Context state serialization + session files.

Counterpart of the reference's state save/load
(ref: llama.cpp llama_get_state_size :9362-9400, llama_copy_state_data
:9445-9568, llama_set_state_data :9570+, session files :9700-9783 used by
--prompt-cache; exercised by examples/save-load-state).

State = the full KV cache (cells + per-cell pos/seq bitmask) plus the host
allocation mirror; sessions add the token history so prompts can be
resumed without re-prefilling. Format: npz (numpy), magic/versioned.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from . import kv_cache as kv
from .context import InferenceContext

SESSION_MAGIC = "pipeinfer-session"
SESSION_VERSION = 1


def state_arrays(ctx: InferenceContext) -> dict[str, np.ndarray]:
    c = ctx.cache
    k = np.asarray(c.k)
    v = np.asarray(c.v)
    if k.dtype not in (np.float32, np.float16):
        # bf16 (ml_dtypes) has no npz cast; store raw 16-bit payloads
        k = k.view(np.uint16)
        v = v.view(np.uint16)
    return {
        "k": k,
        "v": v,
        "pos": np.asarray(c.pos),
        "seq": np.asarray(c.seq),
        "h_pos": ctx.h_pos,
        "h_seq": ctx.h_seq,  # [C, SEQ_WORDS] uint32
    }


def save_state(ctx: InferenceContext, path: str | Path, tokens: list[int] | None = None):
    """Serialize KV cache + metadata (+ optional token history = session)."""
    meta = {
        "magic": SESSION_MAGIC,
        "version": SESSION_VERSION,
        "n_cells": ctx.n_cells,
        "n_layers": ctx.cfg.n_layers,
        "cache_dtype": str(ctx.cache.k.dtype),
    }
    arrays = state_arrays(ctx)
    if tokens is not None:
        arrays["tokens"] = np.asarray(tokens, np.int32)
    np.savez_compressed(path, meta=json.dumps(meta), **arrays)


def load_state(ctx: InferenceContext, path: str | Path) -> list[int] | None:
    """Restore KV cache + metadata. Returns the token history if present."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        if meta.get("magic") != SESSION_MAGIC:
            raise ValueError(f"{path}: not a pipeinfer session/state file")
        if meta["version"] > SESSION_VERSION:
            raise ValueError(f"{path}: unsupported session version {meta['version']}")
        if meta["n_cells"] != ctx.n_cells or meta["n_layers"] != ctx.cfg.n_layers:
            raise ValueError(
                f"{path}: shape mismatch (cells {meta['n_cells']} vs {ctx.n_cells}, "
                f"layers {meta['n_layers']} vs {ctx.cfg.n_layers})"
            )
        dtype = ctx.cache.k.dtype
        k_host, v_host = z["k"], z["v"]
        if k_host.dtype == np.uint16:  # stored bf16 payloads
            import ml_dtypes

            k_host = k_host.view(ml_dtypes.bfloat16)
            v_host = v_host.view(ml_dtypes.bfloat16)
        ctx.cache = kv.KVCache(
            k=jnp.asarray(k_host, dtype),
            v=jnp.asarray(v_host, dtype),
            pos=jnp.asarray(z["pos"], jnp.int32),
            seq=jnp.asarray(z["seq"], jnp.uint32),
        )
        ctx.h_pos = z["h_pos"].copy()
        h_seq = z["h_seq"]
        if h_seq.ndim == 1:  # legacy uint64-scalar mirror (SEQ_WORDS == 2)
            h_seq = h_seq.view(np.uint64)
            words = np.zeros((h_seq.shape[0], kv.SEQ_WORDS), np.uint32)
            words[:, 0] = (h_seq & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            if kv.SEQ_WORDS > 1:
                words[:, 1] = (h_seq >> np.uint64(32)).astype(np.uint32)
            ctx.h_seq = words
        else:
            if h_seq.shape[1] != kv.SEQ_WORDS:
                raise ValueError(
                    f"{path}: session saved with SEQ_WORDS={h_seq.shape[1]}, "
                    f"runtime has {kv.SEQ_WORDS}"
                )
            ctx.h_seq = h_seq.astype(np.uint32).copy()
        return z["tokens"].tolist() if "tokens" in z else None
