"""Fused multi-chip pipeline: pp × tp × dp decode inside one jit.

The TPU-native counterpart of the reference's weighted layer-range pipeline
split (ref: ggml-mpi.c:523-587 `ggml_mpi_split_range`/scatter,
:591-681 graph slicing, :710-721 stage activation relay), re-imagined for
XLA instead of graph surgery:

- the transformer's layers are **stacked** with a leading stage axis and
  sharded over the mesh's 'stage' axis — each stage device-group holds its
  layer slab (the analogue of --mpi-layer-split);
- one jitted step runs S pipeline phases inside `shard_map`; activations
  hop stage→stage over ICI with `jax.lax.ppermute` (the analogue of the
  MPI activation send :710-721), overlapping with compute across
  microbatches via the classic (M + S - 1)-phase schedule;
- within a stage, attention heads and FFN columns are sharded over the
  'model' axis with explicit `psum` reductions after the output/down
  projections (Megatron-style TP);
- independent request streams are sharded over the 'data' axis (DP).

This path serves throughput decode/prefill and the multi-chip dry run; the
asynchronous PipeInfer controller drives per-stage sub-mesh contexts (see
parallel.stages) for the in-flight-microbatch topology.
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

    Weights are densified to bf16 here (quantized planes stay packed only on
    the single-chip fast path for now)."""
    from ..ops.qmatmul import QuantTensor, dequant

    s, lps = pc.n_stages, cfg.n_layers // pc.n_stages
    assert lps * s == cfg.n_layers, "n_layers must divide n_stages"
    assert cfg.n_heads % pc.tp == 0 and cfg.n_kv_heads % pc.tp == 0 and cfg.n_ff % pc.tp == 0

    def dense(w, dtype=jnp.bfloat16):
        if isinstance(w, QuantTensor):
            return dequant(w, dtype)
        return jnp.asarray(w, dtype)

    def stack(slot):
        return jnp.stack(
            [
                jnp.stack([dense(params["layers"][st * lps + i][slot]) for i in range(lps)])
                for st in range(s)
            ]
        )  # [S, Lps, N, K]

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    head_dim = cfg.head_dim
    stacked = {
        # column-parallel: output dim sharded over 'model'
        "wq": put(stack("wq"), P("stage", None, "model", None)),
        "wk": put(stack("wk"), P("stage", None, "model", None)),
        "wv": put(stack("wv"), P("stage", None, "model", None)),
        "w_gate": put(stack("w_gate"), P("stage", None, "model", None)),
        "w_up": put(stack("w_up"), P("stage", None, "model", None)),
        # row-parallel: input dim sharded over 'model' (psum after)
        "wo": put(stack("wo"), P("stage", None, None, "model")),
        "w_down": put(stack("w_down"), P("stage", None, None, "model")),
        "attn_norm": put(stack("attn_norm"), P("stage", None, None)),
        "ffn_norm": put(stack("ffn_norm"), P("stage", None, None)),
        # embedding on stage 0, head on last stage — replicated for simplicity
        "tok_embd": put(dense(params["tok_embd"]), P(None, None)),
        "output_norm": put(jnp.asarray(params["output_norm"], jnp.float32), P(None)),
        "output": put(dense(params["output"]), P("model", None)),
    }
    del head_dim
    return stacked


def init_cache(cfg: ModelConfig, pc: PipeConfig, mesh: Mesh, batch: int, max_len: int):
    """Ring KV cache [S, Lps, B, C, KVH, D] sharded (stage, -, data, -, model, -)."""
    lps = cfg.n_layers // pc.n_stages
    shape = (pc.n_stages, lps, batch, max_len, cfg.n_kv_heads, cfg.head_dim)
    sharding = NamedSharding(mesh, P("stage", None, "data", None, "model", None))
    z = jnp.zeros(shape, jnp.bfloat16)
    return {
        "k": jax.device_put(z, sharding),
        "v": jax.device_put(z, sharding),
    }


# ---------------------------------------------------------------------------
# The fused step
# ---------------------------------------------------------------------------


def _stage_layers(cfg: ModelConfig, p, k_cache, v_cache, h, pos, n_past, tp: int):
    """Run this stage's layer slab on h [B, T, E]; per-shard views.

    k_cache/v_cache: [Lps, B, C, KVH/tp, D]. Returns (h, k_cache, v_cache).
    """
    lps = p["wq"].shape[0]
    b, t, e = h.shape
    heads = cfg.n_heads // tp
    kvh = cfg.n_kv_heads // tp
    d = cfg.head_dim
    scale = cfg.attn_scale
    c = k_cache.shape[2]  # ring length of [Lps, B, C, KVH, D]

    rope_kw = dict(mode=cfg.rope_mode, freq_base=cfg.rope_base, freq_scale=cfg.rope_scale)

    def one_layer(carry, lp):
        h, kc, vc = carry
        wq, wk, wv, wo, wg, wu, wd, anorm, fnorm = lp
        a = L.rms_norm(h, anorm, cfg.norm_eps)
        af = a.reshape(b * t, e)
        q = jnp.dot(af.astype(jnp.bfloat16), wq.T, preferred_element_type=jnp.float32)
        k = jnp.dot(af.astype(jnp.bfloat16), wk.T, preferred_element_type=jnp.float32)
        v = jnp.dot(af.astype(jnp.bfloat16), wv.T, preferred_element_type=jnp.float32)
        q = q.reshape(b, t, heads, d)
        k = k.reshape(b, t, kvh, d)
        v = v.reshape(b, t, kvh, d)
        if cfg.rope_mode != "none":
            q = L.apply_rope(q.reshape(b * t, heads, d), jnp.tile(pos, (b,)), cfg.rope_dims, **rope_kw).reshape(b, t, heads, d)
            k = L.apply_rope(k.reshape(b * t, kvh, d), jnp.tile(pos, (b,)), cfg.rope_dims, **rope_kw).reshape(b, t, kvh, d)
        # ring write at positions pos (same for every stream)
        slots = pos % c
        kc = kc.at[:, slots].set(k.astype(kc.dtype))
        vc = vc.at[:, slots].set(v.astype(vc.dtype))
        # causal mask over ring positions
        cache_pos = jax.lax.broadcasted_iota(jnp.int32, (c,), 0)
        # valid if cache_pos slot holds a position <= query pos and written
        written = cache_pos[None, :] <= (n_past + t - 1) % c  # simple ring (no wrap support at tiny scale)
        visible = (cache_pos[None, :] <= pos[:, None]) & written
        mask = jnp.where(visible, 0.0, -1e9)  # [T, C]
        qf = q.astype(jnp.float32).reshape(b, t, kvh, heads // kvh, d)
        scores = jnp.einsum("btkgd,bckd->btkgc", qf, kc.astype(jnp.float32)) * scale
        scores = scores + mask[None, :, None, None, :]
        pr = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("btkgc,bckd->btkgd", pr, vc.astype(jnp.float32))
        attn = attn.reshape(b * t, heads * d)
        o = jnp.dot(attn.astype(jnp.bfloat16), wo.T, preferred_element_type=jnp.float32)
        o = jax.lax.psum(o, "model")  # row-parallel reduction
        h = h + o.reshape(b, t, e)

        f = L.rms_norm(h, fnorm, cfg.norm_eps).reshape(b * t, e)
        gate = L.silu(jnp.dot(f.astype(jnp.bfloat16), wg.T, preferred_element_type=jnp.float32))
        up = jnp.dot(f.astype(jnp.bfloat16), wu.T, preferred_element_type=jnp.float32)
        dn = jnp.dot((gate * up).astype(jnp.bfloat16), wd.T, preferred_element_type=jnp.float32)
        dn = jax.lax.psum(dn, "model")
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

    (h, k2, v2), _ = jax.lax.scan(
        scan_body, (h, k_cache, v_cache), (layer_params, jnp.arange(lps))
    )
    return h, k2, v2


def build_step(cfg: ModelConfig, pc: PipeConfig, mesh: Mesh):
    """Jitted fused pipeline step: (params, cache, tokens[B,T], pos[T],
    n_past) -> (logits [B, T, V], cache)."""

    def step(params, cache, tokens, pos, n_past):
        def inner(p, k_cache, v_cache, tokens, pos, n_past):
            # shapes inside shard_map (per shard):
            # k_cache [1, Lps, B/dp, C, KVH/tp, D]; tokens [B/dp, T]
            stage = jax.lax.axis_index("stage")
            n_stages = jax.lax.axis_size("stage")
            b, t = tokens.shape

            # strip the (sharded, now size-1) stage axis off layer weights
            p = dict(p)
            for key in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
                        "attn_norm", "ffn_norm"):
                p[key] = p[key][0]

            h = jnp.where(
                stage == 0,
                p["tok_embd"][tokens].astype(jnp.float32),
                jnp.zeros((b, t, cfg.n_embd), jnp.float32),
            )

            kc = k_cache[0]
            vc = v_cache[0]

            def phase(carry, s):
                h, kc, vc = carry
                active = stage == s
                h2, kc2, vc2 = _stage_layers(cfg, p, kc, vc, h, pos, n_past, pc.tp)
                h = jnp.where(active, h2, h)
                kc = jnp.where(active, kc2, kc)
                vc = jnp.where(active, vc2, vc)
                # relay activations to the next stage over ICI
                h = jax.lax.ppermute(
                    h, "stage", [(i, (i + 1) % n_stages) for i in range(n_stages)]
                )
                return (h, kc, vc), None

            (h, kc, vc), _ = jax.lax.scan(phase, (h, kc, vc), jnp.arange(n_stages))
            # after S phases the final activations sit on stage 0 (they were
            # produced by stage S-1 and relayed once more); broadcast them so
            # every stage computes the head (redundant but simple)
            h = jax.lax.psum(jnp.where(stage == 0, h, jnp.zeros_like(h)), "stage")
            out = L.rms_norm(h, p["output_norm"], cfg.norm_eps)
            local_logits = jnp.dot(
                out.reshape(b * t, -1).astype(jnp.bfloat16),
                p["output"].T,
                preferred_element_type=jnp.float32,
            ).reshape(b, t, -1)
            # 'output' is sharded over 'model' rows -> gather columns
            logits = jax.lax.all_gather(local_logits, "model", axis=2, tiled=True)
            return logits, k_cache.at[0].set(kc), v_cache.at[0].set(vc)

        pspec_params = {
            k: P("stage", *([None] * 3)) if k in ("wq", "wk", "wv", "w_gate", "w_up") else None
            for k in params
        }
        # explicit in_specs matching stack_params shardings
        specs = {
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
        del pspec_params
        cache_spec = P("stage", None, "data", None, "model", None)
        fn = shard_map(
            inner,
            mesh=mesh,
            in_specs=(
                specs,
                cache_spec,
                cache_spec,
                P("data", None),
                P(None),
                P(),
            ),
            out_specs=(P("data", None, None), cache_spec, cache_spec),
            check_vma=False,
        )
        logits, k2, v2 = fn(params, cache["k"], cache["v"], tokens, pos, n_past)
        return logits, {"k": k2, "v": v2}

    return jax.jit(step, donate_argnums=(1,))
