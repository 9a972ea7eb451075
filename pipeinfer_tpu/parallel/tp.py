"""Tensor parallelism for quantized weights: shard-stacked params + the
shard_map step builders used by InferenceContext(mesh=...) and the staged
pipeline's per-stage sub-meshes.

The BASELINE north star — "weights live tensor-sharded in HBM" — for the
ASYNC topology (ref: SURVEY §2.3 TP row). Scheme: every 2-D weight is
sharded along its OUTPUT dimension (whole quantized rows), so packed Q*_K
planes split without requantization and stay block-aligned for the fused
Pallas kernel; activations are reassembled with tiled all-gathers (a few
KB at decode batch sizes — negligible next to weight streaming). KV cache
K/V shard over heads; cell metadata (pos/seq bitmask) is replicated so all
sequence ops stay identical to the single-chip path.

Params are stored SHARD-STACKED: each sharded leaf gains a leading [tp]
axis placed on the mesh 'model' axis; inside shard_map each device squeezes
its [1, ...] slice. This keeps each shard's QuantTensor self-consistent
(its static shape IS the local shape) — no kernel changes needed.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig
from ..models import staged
from ..ops.qmatmul import QuantTensor
from ..runtime import kv_cache as kv

# slots sharded along their output dim (plus their biases)
_SHARD_W = {"wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down", "output"}
_SHARD_B = {"bq", "bk", "bv", "bo", "b_gate", "b_up", "b_down"}
# fused qkv: GGUF normalizes to block order [Q-rows; K-rows; V-rows] with
# head-ordered rows per segment (ref: convert-hf-to-gguf BloomModel
# reordering), so each segment splits on head boundaries and the shard
# keeps its own fused [q_i; k_i; v_i] layout (generic.layer_step slices it
# with the shard-local dims)
_FUSED_QKV = {"wqkv", "bqkv"}


def tp_mesh(devices: Sequence) -> Mesh:
    return Mesh(np.asarray(list(devices)), axis_names=("model",))


# matmul layouts whose every device plane keeps N (the output dim) as the
# LAST axis — k_major packed planes, the int8-widened "i8", the MXU-resident
# "i8g"/"i4g" requant layouts, and the planar "k4": all of them shard along
# output columns without touching a single packed byte's K structure
# (ref: ggml-mpi.c:523-587 splits quantized slabs the same way — whole
# quantized rows per rank)
_N_LAST_LAYOUTS = ("k_major", "i8", "i8g", "i4g", "k4")


def _stack_qt(qt: QuantTensor, tp: int) -> QuantTensor:
    """[rows, N] planes -> [tp, rows, N/tp] (whole-output-column shards)."""
    n, k = qt.shape
    assert n % tp == 0, f"output dim {n} not divisible by tp={tp}"
    if qt.layout not in _N_LAST_LAYOUTS:
        raise NotImplementedError(
            f"TP sharding needs an N-last matmul layout, got {qt.layout!r}"
        )

    def stk(plane):
        if plane is None:
            return None
        return jnp.stack(jnp.split(plane, tp, axis=1))

    return QuantTensor(
        qs=stk(qt.qs), qh=stk(qt.qh), scales=stk(qt.scales), bias=stk(qt.bias),
        qtype=qt.qtype, shape=(n // tp, k), layout=qt.layout,
        scales2=stk(qt.scales2), bias2=stk(qt.bias2),
    )


def _stack_dense(w: jax.Array, tp: int) -> jax.Array:
    """[N, K] dense or [N] bias -> [tp, N/tp, ...]."""
    return jnp.stack(jnp.split(w, tp, axis=0))


def _qkv_segs(cfg: ModelConfig) -> tuple[int, int, int]:
    kv_dim = cfg.n_kv_heads * cfg.head_dim
    return (cfg.n_heads * cfg.head_dim, kv_dim, kv_dim)


def _stack_dense_segs(w: jax.Array, tp: int, segs) -> jax.Array:
    """Fused [Q;K;V] rows -> [tp, (q+k+v)/tp, ...]: split each segment by
    tp, re-fuse per shard."""
    bounds = np.cumsum([0, *segs])
    parts = [jnp.split(w[bounds[i]: bounds[i + 1]], tp, axis=0) for i in range(len(segs))]
    return jnp.stack([
        jnp.concatenate([parts[s][i] for s in range(len(segs))], axis=0)
        for i in range(tp)
    ])


def _stack_qt_segs(qt: QuantTensor, tp: int, segs) -> QuantTensor:
    """Fused-qkv QuantTensor: every supported plane is [rows_k, N] — the N
    (output) axis splits per segment, scales/bias planes alongside."""
    n, k = qt.shape
    bounds = np.cumsum([0, *segs])
    assert bounds[-1] == n and all(s % tp == 0 for s in segs), (segs, n, tp)
    if qt.layout not in _N_LAST_LAYOUTS:
        raise NotImplementedError(
            f"TP sharding needs an N-last matmul layout, got {qt.layout!r}"
        )

    def stk(plane):
        if plane is None:
            return None
        parts = [
            jnp.split(plane[:, bounds[i]: bounds[i + 1]], tp, axis=1)
            for i in range(len(segs))
        ]
        return jnp.stack([
            jnp.concatenate([parts[s][i] for s in range(len(segs))], axis=1)
            for i in range(tp)
        ])

    return QuantTensor(
        qs=stk(qt.qs), qh=stk(qt.qh), scales=stk(qt.scales), bias=stk(qt.bias),
        qtype=qt.qtype, shape=(n // tp, k), layout=qt.layout,
        scales2=stk(qt.scales2), bias2=stk(qt.bias2),
    )


def _shard_leaf(slot: str, w, tp: int, cfg: ModelConfig | None = None):
    """Returns (stacked_value, is_sharded)."""
    if slot in _FUSED_QKV or slot == "wgu":
        assert cfg is not None
        segs = (cfg.n_ff, cfg.n_ff) if slot == "wgu" else _qkv_segs(cfg)
        if isinstance(w, QuantTensor):
            return _stack_qt_segs(w, tp, segs), True
        return _stack_dense_segs(w, tp, segs), True
    if slot in _SHARD_W:
        if isinstance(w, QuantTensor):
            return _stack_qt(w, tp), True
        return _stack_dense(w, tp), True
    if slot in _SHARD_B:
        return _stack_dense(w, tp), True
    return w, False


def shard_params(params, cfg: ModelConfig, mesh: Mesh):
    """Shard a loaded params pytree over mesh axis 'model'.

    Returns (stacked_params, specs) where specs is a matching pytree of
    PartitionSpecs (the shard_map in_specs / the squeeze guide)."""
    tp = mesh.shape["model"]

    def handle(slot, w):
        sv, sharded = _shard_leaf(slot, w, tp, cfg)
        spec = _lead_spec(sv) if sharded else _rep_spec(sv)
        placed = jax.device_put(
            sv, jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), spec)
        )
        return placed, spec

    out, specs = {}, {}
    for key, v in params.items():
        if key == "layers":
            out["layers"], specs["layers"] = [], []
            for lp in v:
                olp, slp = {}, {}
                for slot, w in lp.items():
                    olp[slot], slp[slot] = handle(slot, w)
                out["layers"].append(olp)
                specs["layers"].append(slp)
        else:
            out[key], specs[key] = handle(key, v)
    return out, specs


def _lead_spec(v):
    """Spec tree: leading axis on 'model' for every leaf."""
    return jax.tree_util.tree_map(
        lambda leaf: P("model", *([None] * (leaf.ndim - 1))), v
    )


def _rep_spec(v):
    return jax.tree_util.tree_map(lambda leaf: P(*([None] * leaf.ndim)), v)


def unstack_local(params, specs):
    """Inside shard_map: drop the local [1, ...] shard axis of sharded
    leaves (spec leads with 'model')."""
    return jax.tree_util.tree_map(
        lambda v, s: v[0] if (len(s) > 0 and s[0] == "model") else v,
        params,
        specs,
    )


# -- sharded KV cache --------------------------------------------------------


def cache_spec(hot: int = 0) -> kv.KVCache:
    """PartitionSpec tree for a KVCache: K/V head-sharded, metadata
    replicated. `hot` must match the runtime cache's static aux (the
    pytree structures have to agree for shard_map in_specs), so TP caches
    get the same hot-cell bounding as single-chip ones."""
    return kv.KVCache(
        k=P(None, "model", None, None),
        v=P(None, "model", None, None),
        pos=P(None),
        seq=P(None, None),
        hot=hot,
    )


def shard_cache(cache: kv.KVCache, mesh: Mesh) -> kv.KVCache:
    sh = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), cache_spec(cache.hot)
    )
    return jax.device_put(cache, sh)


# -- step builders -----------------------------------------------------------


def _freeze(specs):
    """Specs tree -> hashable key for the jit caches."""
    return jax.tree_util.tree_structure(specs), tuple(
        jax.tree_util.tree_leaves(specs)
    )


@functools.lru_cache(maxsize=None)
def _cached_tp_step(cfg: ModelConfig, topk, mesh: Mesh, specs_key, t_pad, hot):
    del t_pad  # shapes key the inner jit cache; kept for clarity
    specs_struct, specs_leaves = specs_key
    specs = jax.tree_util.tree_unflatten(specs_struct, list(specs_leaves))
    tp = mesh.shape["model"]
    lcfg = staged.local_cfg(cfg, tp)

    def inner(params, cache, tokens, pos, seq, cell_idx, valid, seq_bits):
        p = unstack_local(params, specs)
        return staged.stage_forward(
            p, lcfg, cache, tokens, pos, seq, cell_idx, valid, seq_bits,
            first=True, last=True, topk=topk, tp_axis="model",
        )

    rep = P(None)
    fn = shard_map(
        inner,
        mesh=mesh,
        in_specs=(specs, cache_spec(hot), rep, rep, rep, rep, rep, P(None, None)),
        out_specs=(P(None, None), cache_spec(hot)),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(1,))


def build_tp_step(cfg: ModelConfig, topk, mesh: Mesh, specs, t_pad: int, hot: int = 0):
    return _cached_tp_step(cfg, topk, mesh, _freeze(specs), t_pad, hot)


@functools.lru_cache(maxsize=None)
def _cached_tp_chain(cfg: ModelConfig, depth, n_cand, mesh: Mesh, specs_key, hot,
                     samp=None):
    from ..runtime.context import _device_draft_sample

    specs_struct, specs_leaves = specs_key
    specs = jax.tree_util.tree_unflatten(specs_struct, list(specs_leaves))
    tp = mesh.shape["model"]
    lcfg = staged.local_cfg(cfg, tp)

    def inner(params, cache, root_token, pos0, seq_id, cell_idx, *key):
        p = unstack_local(params, specs)

        def body(carry, i):
            cache, tok, pos = carry
            logits, cache = staged.stage_forward(
                p, lcfg, cache,
                tok[None], pos[None], seq_id[None], cell_idx[i][None],
                jnp.ones(1, bool), None,
                first=True, last=True, topk=None, tp_axis="model",
            )
            row = logits[0]
            if n_cand == 0:
                nxt = jnp.argmax(row).astype(jnp.int32)
                return (cache, nxt, pos + 1), (nxt, nxt[None].astype(jnp.float32))
            if samp is not None:
                nxt = _device_draft_sample(row, samp, jax.random.fold_in(key[0], i))
            lse = jax.scipy.special.logsumexp(row)
            vals, ids = jax.lax.top_k(row, n_cand)
            packed = jnp.concatenate([vals, ids.astype(jnp.float32), lse[None]])
            if samp is None:
                nxt = ids[0]
            return (cache, nxt, pos + 1), (nxt, packed)

        (cache, _, _), (toks, packs) = jax.lax.scan(
            body, (cache, root_token, pos0), jnp.arange(depth)
        )
        root_next = toks[-1].astype(jnp.int32)
        if n_cand == 0:
            return toks.astype(jnp.float32)[:, None], root_next, cache
        out = jnp.concatenate([toks.astype(jnp.float32)[:, None], packs], axis=1)
        return out, root_next, cache

    rep = P()
    key_spec = () if samp is None else (P(None),)
    fn = shard_map(
        inner,
        mesh=mesh,
        in_specs=(specs, cache_spec(hot), rep, rep, rep, P(None), *key_spec),
        out_specs=(P(None, None), P(), cache_spec(hot)),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(1,))


def build_tp_chain(cfg: ModelConfig, depth, n_cand, mesh: Mesh, specs, hot: int = 0,
                   samp=None):
    return _cached_tp_chain(cfg, depth, n_cand, mesh, _freeze(specs), hot, samp)
