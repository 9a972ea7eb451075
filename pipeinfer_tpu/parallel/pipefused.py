"""Fused multi-chip pipeline: pp × tp × dp decode inside one jit.

The TPU-native counterpart of the reference's weighted layer-range pipeline
split (ref: ggml-mpi.c:523-587 `ggml_mpi_split_range`/scatter,
:591-681 graph slicing, :710-721 stage activation relay), re-imagined for
XLA instead of graph surgery:

- the transformer's layers are **stacked** with a leading stage axis and
  sharded over the mesh's 'stage' axis — each stage device-group holds its
  layer slab (the analogue of --mpi-layer-split);
- one jitted step runs the classic **(M + S - 1)-phase microbatch
  schedule** inside `shard_map`: per-dp-shard streams are split into M
  microbatches along the batch axis; at phase t, stage s computes
  microbatch t - s while the activation of the previous phase hops
  stage→stage over ICI with `jax.lax.ppermute` (the analogue of the MPI
  activation send :710-721). After the S-phase warmup every stage is busy
  on a DIFFERENT microbatch — utilization M/(M+S-1) instead of the 1/S of
  a stage-masked single-batch sweep (this is the in-flight-microbatch
  semantics of the reference's async split decode, llama.h:285-290,
  expressed as a static schedule);
- the ring KV cache carries **per-slot stored positions**, so attention
  masking is wrap-safe (a slot is visible iff it holds a position in
  (q_pos - C, q_pos]) and every stream has its own position column;
- within a stage, attention heads and FFN columns are sharded over the
  'model' axis with explicit `psum` reductions after the output/down
  projections (Megatron-style TP);
- independent request streams are sharded over the 'data' axis (DP).

This path serves throughput decode/prefill and the multi-chip dry run; the
asynchronous PipeInfer controller drives per-stage sub-mesh contexts (see
parallel.stages / parallel.dcn) for the dynamic in-flight-run topology.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig
from ..ops import layers as L


@dataclasses.dataclass(frozen=True)
class PipeConfig:
    n_stages: int
    tp: int
    dp: int
    n_microbatches: int = 1

    @property
    def n_devices(self) -> int:
        return self.n_stages * self.tp * self.dp


def make_mesh(pc: PipeConfig, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()[: pc.n_devices]
    arr = np.asarray(devices).reshape(pc.dp, pc.n_stages, pc.tp)
    return Mesh(arr, axis_names=("data", "stage", "model"))


# ---------------------------------------------------------------------------
# Parameter stacking: per-layer dicts -> stage-stacked dense arrays
# ---------------------------------------------------------------------------


def stack_params(params: dict[str, Any], cfg: ModelConfig, pc: PipeConfig, mesh: Mesh):
    """Stack per-layer weights along a leading stage axis [S, Lps, ...] and
    shard: stage axis over 'stage', head/ffn dims over 'model'.

    Quantized matmul slots whose per-layer QuantTensors agree on
    (qtype, layout, shape) for an N-last layout (i4g/i8g/i8/k4/k_major)
    stay PACKED: their planes stack to [S, Lps, rows, N] and shard along
    output columns over 'model', so every device streams packed bytes —
    the 70B-class configs this path exists for keep the single-chip HBM
    economics (ref: ggml-quants.c dot kernels run packed on every rank;
    ggml-mpi.c:523-587 splits quantized slabs). Slots that can't stack
    (mixed per-layer ftypes, e.g. Q4_K_M's per-layer Q6_K upgrades, or
    dense checkpoints) densify to bf16 as before."""
    from ..ops.qmatmul import QuantTensor, dequant

    s, lps = pc.n_stages, cfg.n_layers // pc.n_stages
    assert lps * s == cfg.n_layers, (
        f"n_stages ({s}) must divide n_layers ({cfg.n_layers})"
    )
    assert cfg.n_heads % pc.tp == 0 and cfg.n_kv_heads % pc.tp == 0 and cfg.n_ff % pc.tp == 0

    # this fused path implements the llama-family layer body only; refuse
    # models whose features it would silently drop (the staged/dcn paths
    # run every architecture through models.generic)
    unsupported = {"bq", "bk", "bv", "bo", "b_gate", "b_up", "b_down",
                   "bqkv", "attn_norm_2", "attn_norm_b", "q_norm"}
    present = unsupported & set(params["layers"][0])
    if present or cfg.max_alibi_bias > 0 or cfg.tok_norm or cfg.pos_embd \
            or cfg.yarn_ext_factor != 0.0:
        raise NotImplementedError(
            f"pipefused supports the llama-family body only (found "
            f"{sorted(present) or 'non-llama config features'}); use "
            "parallel.stages / parallel.dcn for this architecture"
        )

    def dense(w, dtype=jnp.bfloat16):
        if isinstance(w, QuantTensor):
            return dequant(w, dtype)
        return jnp.asarray(w, dtype)

    def dense32(w):  # norm weights keep load precision (like output_norm)
        return jnp.asarray(w, jnp.float32)

    kv_dim = cfg.n_kv_heads * cfg.head_dim
    n_q = cfg.n_heads * cfg.head_dim
    # fused-load slots de-fuse here (this path re-stacks dense anyway)
    _SEGS = {
        "wq": ("wqkv", 0, n_q), "wk": ("wqkv", n_q, n_q + kv_dim),
        "wv": ("wqkv", n_q + kv_dim, n_q + 2 * kv_dim),
        "w_gate": ("wgu", 0, cfg.n_ff), "w_up": ("wgu", cfg.n_ff, 2 * cfg.n_ff),
    }

    def per_layer(slot):
        """The slot's weight for every layer (de-fusing wqkv/wgu loads)."""
        out = []
        for lp in params["layers"]:
            if slot in lp:
                out.append(lp[slot])
            else:
                fused, lo, hi = _SEGS[slot]
                w = lp[fused]
                if isinstance(w, QuantTensor):
                    out.append(_qt_rows(w, lo, hi))
                else:
                    out.append(w[lo:hi])
        return out

    def stack(slot, norm=False):
        conv = dense32 if norm else dense
        ws = per_layer(slot) if not norm else [lp[slot] for lp in params["layers"]]
        return jnp.stack(
            [
                jnp.stack([conv(ws[st * lps + i]) for i in range(lps)])
                for st in range(s)
            ]
        )  # [S, Lps, N, K]

    def stack_packed(slot) -> QuantTensor | None:
        """Stage-stack a quantized slot's packed planes to [S, Lps, rows, N]
        with the aux shape set to the SHARD-LOCAL (N/tp, K); None when the
        per-layer tensors can't stack or the output dim doesn't split."""
        ws = per_layer(slot)
        first = ws[0]
        if not all(
            isinstance(w, QuantTensor)
            and w.qtype == first.qtype
            and w.layout == first.layout
            and w.shape == first.shape
            for w in ws
        ):
            return None
        if first.layout not in ("i4g", "i8g", "i8", "k4", "k_major"):
            return None  # N-last matmul layouts only
        n, k = first.shape
        if n % pc.tp:
            return None  # output columns split bytes-exactly at any divisor;
            # per-shard kernel tileability is qmatmul's own fallback decision
        def stk(attr):
            planes = [getattr(w, attr) for w in ws]
            if any(pl is None for pl in planes):
                return None
            return jnp.stack([
                jnp.stack([planes[st * lps + i] for i in range(lps)])
                for st in range(s)
            ])
        return QuantTensor(
            qs=stk("qs"), qh=stk("qh"), scales=stk("scales"), bias=stk("bias"),
            qtype=first.qtype, shape=(n // pc.tp, k), layout=first.layout,
            scales2=stk("scales2"), bias2=stk("bias2"),
        )

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    def put_qt(qt: QuantTensor, spec) -> QuantTensor:
        sh = NamedSharding(mesh, spec)
        return jax.tree_util.tree_map(lambda leaf: jax.device_put(leaf, sh), qt)

    # packed planes are [S, Lps, rows, N]: output columns (N, the LAST plane
    # axis) shard over 'model' for EVERY matmul slot — wo/w_down included
    # (their inputs are all-gathered in the layer body; see _stage_layers)
    qspec = P("stage", None, None, "model")

    def matmul_slot(slot):
        qt = stack_packed(slot)
        if qt is not None:
            return put_qt(qt, qspec)
        if slot in ("wq", "wk", "wv", "w_gate", "w_up"):
            return put(stack(slot), P("stage", None, "model", None))
        return put(stack(slot), P("stage", None, None, "model"))

    out_w = params["output"]
    if (
        isinstance(out_w, QuantTensor)
        and out_w.layout in ("i4g", "i8g", "i8", "k4", "k_major")
        and out_w.shape[0] % pc.tp == 0
    ):
        head = jax.tree_util.tree_map(
            lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P(None, "model"))),
            dataclasses.replace(
                out_w, shape=(out_w.shape[0] // pc.tp, out_w.shape[1])
            ),
        )
    else:
        head = put(dense(out_w), P("model", None))

    stacked = {
        "wq": matmul_slot("wq"),
        "wk": matmul_slot("wk"),
        "wv": matmul_slot("wv"),
        "w_gate": matmul_slot("w_gate"),
        "w_up": matmul_slot("w_up"),
        "wo": matmul_slot("wo"),
        "w_down": matmul_slot("w_down"),
        "attn_norm": put(stack("attn_norm", norm=True), P("stage", None, None)),
        "ffn_norm": put(stack("ffn_norm", norm=True), P("stage", None, None)),
        # embedding on stage 0 — replicated (row gathers want the n_major
        # dense table; its bytes are read per-token, not streamed per step)
        "tok_embd": put(dense(params["tok_embd"]), P(None, None)),
        "output_norm": put(jnp.asarray(params["output_norm"], jnp.float32), P(None)),
        "output": head,
    }
    return stacked


def _qt_rows(qt, lo: int, hi: int):
    """Output-row slice [lo, hi) of an N-last QuantTensor (de-fuses wqkv/wgu
    loads: every plane's last axis is indexed by output column)."""
    import dataclasses as _dc

    return _dc.replace(
        qt,
        qs=qt.qs[:, lo:hi],
        qh=qt.qh[:, lo:hi] if qt.qh is not None else None,
        scales=qt.scales[:, lo:hi],
        bias=qt.bias[:, lo:hi],
        scales2=qt.scales2[:, lo:hi] if qt.scales2 is not None else None,
        bias2=qt.bias2[:, lo:hi] if qt.bias2 is not None else None,
        shape=(hi - lo, qt.shape[1]),
    )


def init_cache(cfg: ModelConfig, pc: PipeConfig, mesh: Mesh, batch: int, max_len: int):
    """Ring KV cache [S, Lps, B, C, KVH, D] sharded (stage, -, data, -, model, -)
    plus per-slot stored positions [S, B, C] (wrap-safe masking; -1 = empty)."""
    lps = cfg.n_layers // pc.n_stages
    shape = (pc.n_stages, lps, batch, max_len, cfg.n_kv_heads, cfg.head_dim)
    sharding = NamedSharding(mesh, P("stage", None, "data", None, "model", None))
    z = jnp.zeros(shape, jnp.bfloat16)
    pos_sh = NamedSharding(mesh, P("stage", "data", None))
    return {
        "k": jax.device_put(z, sharding),
        "v": jax.device_put(z, sharding),
        "pos": jax.device_put(
            jnp.full((pc.n_stages, batch, max_len), -1, jnp.int32), pos_sh
        ),
    }


# ---------------------------------------------------------------------------
# The fused step
# ---------------------------------------------------------------------------


def _mm(x, w):
    """x [M, K] @ W[N, K]^T for a dense bf16 [N, K] weight or a packed
    QuantTensor shard (the single-chip fused kernels run per shard)."""
    from ..ops.qmatmul import QuantTensor, qmatmul

    if isinstance(w, QuantTensor):
        return qmatmul(x, w)
    return jnp.dot(x.astype(jnp.bfloat16), w.T, preferred_element_type=jnp.float32)


def _is_qt(w) -> bool:
    from ..ops.qmatmul import QuantTensor

    return isinstance(w, QuantTensor)


def _stage_layers(cfg: ModelConfig, p, k_cache, v_cache, pos_slab, h, pos, tp: int):
    """Run this stage's layer slab on h [B, T, E] with per-stream positions.

    k_cache/v_cache: [Lps, B, C, KVH/tp, D]; pos_slab [B, C] stored slot
    positions (-1 empty); pos [B, T] query positions. Returns
    (h, k_cache, v_cache, pos_slab).

    Weight comms: dense wo/w_down are row-parallel (input sharded, psum
    after); packed QuantTensor wo/w_down are OUTPUT-sharded (packed planes
    only split along output columns), so their inputs all-gather over
    'model' first and their outputs all-gather back — a few KB at decode
    batch sizes, while the weights stream packed."""
    b, t, e = h.shape
    heads = cfg.n_heads // tp
    kvh = cfg.n_kv_heads // tp
    d = cfg.head_dim
    scale = cfg.attn_scale
    c = k_cache.shape[2]  # ring length

    rope_kw = dict(mode=cfg.rope_mode, freq_base=cfg.rope_base, freq_scale=cfg.rope_scale)
    slots = pos % c  # [B, T]
    b_iota = jnp.arange(b)
    # wrap-safe visibility AFTER this step's writes: slot stores pos_slab'
    pos_slab = pos_slab.at[b_iota[:, None], slots].set(pos)
    stored = pos_slab  # [B, C]
    visible = (
        (stored[:, None, :] >= 0)
        & (stored[:, None, :] <= pos[:, :, None])
        & (stored[:, None, :] > pos[:, :, None] - c)
    )  # [B, T, C]
    mask = jnp.where(visible, 0.0, -1e9)
    pos_flat = pos.reshape(b * t)

    def one_layer(carry, lp):
        h, kc, vc = carry
        wq, wk, wv, wo, wg, wu, wd, anorm, fnorm = lp
        a = L.rms_norm(h, anorm, cfg.norm_eps)
        af = a.reshape(b * t, e)
        q = _mm(af, wq)
        k = _mm(af, wk)
        v = _mm(af, wv)
        q = q.reshape(b * t, heads, d)
        k = k.reshape(b * t, kvh, d)
        if cfg.rope_mode != "none":
            q = L.apply_rope(q, pos_flat, cfg.rope_dims, **rope_kw)
            k = L.apply_rope(k, pos_flat, cfg.rope_dims, **rope_kw)
        q = q.reshape(b, t, heads, d)
        k = k.reshape(b, t, kvh, d)
        v = v.reshape(b, t, kvh, d)
        # per-stream ring write at slots [B, T]
        kc = kc.at[b_iota[:, None], slots].set(k.astype(kc.dtype))
        vc = vc.at[b_iota[:, None], slots].set(v.astype(vc.dtype))
        qf = q.astype(jnp.float32).reshape(b, t, kvh, heads // kvh, d)
        scores = jnp.einsum("btkgd,bckd->btkgc", qf, kc.astype(jnp.float32)) * scale
        scores = scores + mask[:, :, None, None, :]
        pr = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("btkgc,bckd->btkgd", pr, vc.astype(jnp.float32))
        attn = attn.reshape(b * t, heads * d)
        if _is_qt(wo):
            # packed shard is output-sharded: gather the head-sharded input,
            # run the packed kernel locally, gather the output columns
            attn = jax.lax.all_gather(attn, "model", axis=1, tiled=True)
            o = jax.lax.all_gather(_mm(attn, wo), "model", axis=1, tiled=True)
        else:
            o = jax.lax.psum(_mm(attn, wo), "model")  # row-parallel reduction
        h = h + o.reshape(b, t, e)

        f = L.rms_norm(h, fnorm, cfg.norm_eps).reshape(b * t, e)
        gate = L.silu(_mm(f, wg))
        up = _mm(f, wu)
        mid = gate * up
        if _is_qt(wd):
            mid = jax.lax.all_gather(mid, "model", axis=1, tiled=True)
            dn = jax.lax.all_gather(_mm(mid, wd), "model", axis=1, tiled=True)
        else:
            dn = jax.lax.psum(_mm(mid, wd), "model")
        h = h + dn.reshape(b, t, e)
        return (h, kc, vc), None

    layer_params = (
        p["wq"], p["wk"], p["wv"], p["wo"], p["w_gate"], p["w_up"], p["w_down"],
        p["attn_norm"], p["ffn_norm"],
    )

    def scan_body(carry, xs):
        h, kc_all, vc_all = carry
        lp, li = xs
        (h, kci, vci), _ = one_layer((h, kc_all[li], vc_all[li]), lp)
        return (h, kc_all.at[li].set(kci), vc_all.at[li].set(vci)), None

    lps = p["attn_norm"].shape[0]  # wq may be a QuantTensor (aux shape)
    (h, k2, v2), _ = jax.lax.scan(
        scan_body, (h, k_cache, v_cache), (layer_params, jnp.arange(lps))
    )
    return h, k2, v2, pos_slab


def build_step(cfg: ModelConfig, pc: PipeConfig, mesh: Mesh):
    """Jitted fused pipeline step: (params, cache, tokens[B,T], pos, n_past)
    -> (logits [B, T, V], cache).

    pos may be [T] (shared positions, legacy) or [B, T] (per-stream);
    n_past is accepted for API compatibility and ignored (per-slot stored
    positions make the mask self-describing)."""
    M = max(1, pc.n_microbatches)

    def step(params, cache, tokens, pos, n_past=0):
        if pos.ndim == 1:
            pos2 = jnp.broadcast_to(pos[None, :], tokens.shape)
        else:
            pos2 = pos
        pos2 = pos2.astype(jnp.int32)

        def inner(p, k_cache, v_cache, pos_cache, tokens, pos):
            # per-shard shapes: k_cache [1, Lps, B_l, C, KVH/tp, D];
            # tokens/pos [B_l, T]; pos_cache [1, B_l, C]
            stage = jax.lax.axis_index("stage")
            n_stages = jax.lax.axis_size("stage")
            b_l, t = tokens.shape
            assert b_l % M == 0, (
                f"n_microbatches={M} must divide the per-dp-shard batch {b_l}"
            )
            bm = b_l // M

            # strip the (sharded, now size-1) stage axis off layer weights
            # (tree_map handles packed QuantTensor slots leaf-by-leaf)
            p = dict(p)
            for key in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
                        "attn_norm", "ffn_norm"):
                p[key] = jax.tree_util.tree_map(lambda a: a[0], p[key])

            kc = k_cache[0]
            vc = v_cache[0]
            psl = pos_cache[0]
            out_h = jnp.zeros((b_l, t, cfg.n_embd), jnp.float32)
            h_cur = jnp.zeros((bm, t, cfg.n_embd), jnp.float32)

            n_phases = M + n_stages - 1

            def phase(carry, ph):
                h_cur, kc, vc, psl, out_h = carry
                # stage 0 injects microbatch `ph`'s embedding (overwrites the
                # relayed garbage from the stage ring closure)
                m_in = jnp.clip(ph, 0, M - 1)
                tok_mb = jax.lax.dynamic_slice_in_dim(tokens, m_in * bm, bm, axis=0)
                emb = p["tok_embd"][tok_mb].astype(jnp.float32)
                inject = (stage == 0) & (ph < M)
                h_cur = jnp.where(inject, emb, h_cur)

                # this stage computes microbatch ph - stage
                m = ph - stage
                active = (m >= 0) & (m < M)
                mc = jnp.clip(m, 0, M - 1)
                kcs = jax.lax.dynamic_slice_in_dim(kc, mc * bm, bm, axis=1)
                vcs = jax.lax.dynamic_slice_in_dim(vc, mc * bm, bm, axis=1)
                pss = jax.lax.dynamic_slice_in_dim(psl, mc * bm, bm, axis=0)
                pos_mb = jax.lax.dynamic_slice_in_dim(pos, mc * bm, bm, axis=0)
                h2, kcs2, vcs2, pss2 = _stage_layers(
                    cfg, p, kcs, vcs, pss, h_cur, pos_mb, pc.tp
                )
                # masked write-back (inactive phases rewrite the old slab)
                kc = jax.lax.dynamic_update_slice_in_dim(
                    kc, jnp.where(active, kcs2, kcs), mc * bm, axis=1)
                vc = jax.lax.dynamic_update_slice_in_dim(
                    vc, jnp.where(active, vcs2, vcs), mc * bm, axis=1)
                psl = jax.lax.dynamic_update_slice_in_dim(
                    psl, jnp.where(active, pss2, pss), mc * bm, axis=0)
                h_cur = jnp.where(active, h2, h_cur)
                # last stage banks its finished microbatch's activations
                done = active & (stage == n_stages - 1)
                old = jax.lax.dynamic_slice_in_dim(out_h, mc * bm, bm, axis=0)
                out_h = jax.lax.dynamic_update_slice_in_dim(
                    out_h, jnp.where(done, h_cur, old), mc * bm, axis=0)
                # relay activations to the next stage over ICI
                h_cur = jax.lax.ppermute(
                    h_cur, "stage", [(i, (i + 1) % n_stages) for i in range(n_stages)]
                )
                return (h_cur, kc, vc, psl, out_h), None

            (h_cur, kc, vc, psl, out_h), _ = jax.lax.scan(
                phase, (h_cur, kc, vc, psl, out_h), jnp.arange(n_phases)
            )
            # finished activations live on the LAST stage; broadcast so every
            # stage computes the (model-sharded) head
            h = jax.lax.psum(
                jnp.where(stage == n_stages - 1, out_h, jnp.zeros_like(out_h)),
                "stage",
            )
            out = L.rms_norm(h, p["output_norm"], cfg.norm_eps)
            local_logits = _mm(
                out.reshape(b_l * t, -1), p["output"]
            ).reshape(b_l, t, -1)
            # 'output' is vocab-sharded over 'model' (dense rows or packed
            # output columns) -> gather the vocab axis
            logits = jax.lax.all_gather(local_logits, "model", axis=2, tiled=True)
            return logits, k_cache.at[0].set(kc), v_cache.at[0].set(vc), \
                pos_cache.at[0].set(psl)

        dense_specs = {
            "wq": P("stage", None, "model", None),
            "wk": P("stage", None, "model", None),
            "wv": P("stage", None, "model", None),
            "w_gate": P("stage", None, "model", None),
            "w_up": P("stage", None, "model", None),
            "wo": P("stage", None, None, "model"),
            "w_down": P("stage", None, None, "model"),
            "attn_norm": P("stage", None, None),
            "ffn_norm": P("stage", None, None),
            "tok_embd": P(None, None),
            "output_norm": P(None),
            "output": P("model", None),
        }
        # packed QuantTensor slots shard their planes' LAST axis (output
        # columns) over 'model'; the head has no stage/layer axes
        specs = {
            key: (
                jax.tree_util.tree_map(
                    lambda _: P(None, "model") if key == "output"
                    else P("stage", None, None, "model"),
                    w,
                )
                if _is_qt(w)
                else dense_specs[key]
            )
            for key, w in params.items()
        }
        cache_spec = P("stage", None, "data", None, "model", None)
        pos_spec = P("stage", "data", None)
        fn = shard_map(
            inner,
            mesh=mesh,
            in_specs=(specs, cache_spec, cache_spec, pos_spec,
                      P("data", None), P("data", None)),
            out_specs=(P("data", None, None), cache_spec, cache_spec, pos_spec),
            check_vma=False,
        )
        logits, k2, v2, p2 = fn(params, cache["k"], cache["v"], cache["pos"],
                                tokens, pos2)
        return logits, {"k": k2, "v": v2, "pos": p2}

    return jax.jit(step, donate_argnums=(1,))
