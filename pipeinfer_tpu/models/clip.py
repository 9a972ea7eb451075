"""CLIP ViT vision encoder + LLaVA multimodal projector
(ref: examples/llava/clip.cpp). Reads the reference's mmproj GGUF layout —
`clip.vision.*` hparams, `v.patch_embd/class_embd/position_embd`,
`v.blk.{i}.{attn_q,attn_k,attn_v,attn_out,ln1,ln2,ffn_down,ffn_up}`,
`v.pre_ln`, and the `mm.0`/`mm.2` projector — and runs the LLaVA path as
one jitted program: patch conv (unfold + matmul on the MXU), class token +
learned positions, pre-LN, n_layer-1 pre-LN transformer blocks (the
reference skips the final block for LLaVA, clip.cpp:343), then drops the
class row and projects to the language model's embedding width
(mm.0 → GELU → mm.2, clip.cpp:420-442)."""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path

import numpy as np


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    image_size: int
    patch_size: int
    hidden: int
    n_heads: int
    n_ff: int
    n_layers: int
    proj_dim: int
    eps: float
    use_gelu: bool  # exact gelu vs gelu_quick (clip.cpp use_gelu key)
    image_mean: tuple
    image_std: tuple

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def load_mmproj(path: str | Path):
    """mmproj GGUF → (params dict of f32 arrays, ClipConfig)."""
    from ..gguf.reader import GGUFReader

    with GGUFReader(path) as r:
        md = r.metadata
        if not md.get("clip.has_vision_encoder", True):
            raise ValueError(f"{path}: no vision encoder")

        def t(name):
            return np.asarray(r.tensor(name), np.float32)

        cfg = ClipConfig(
            image_size=int(md["clip.vision.image_size"]),
            patch_size=int(md["clip.vision.patch_size"]),
            hidden=int(md["clip.vision.embedding_length"]),
            n_heads=int(md["clip.vision.attention.head_count"]),
            n_ff=int(md["clip.vision.feed_forward_length"]),
            n_layers=int(md["clip.vision.block_count"]),
            proj_dim=int(md["clip.vision.projection_dim"]),
            eps=float(md["clip.vision.attention.layer_norm_epsilon"]),
            use_gelu=bool(md.get("clip.use_gelu", False)),
            image_mean=tuple(md.get("clip.vision.image_mean", (0.48145466, 0.4578275, 0.40821073))),
            image_std=tuple(md.get("clip.vision.image_std", (0.26862954, 0.26130258, 0.27577711))),
        )
        p = {
            "patch_embd": t("v.patch_embd.weight"),  # [hidden, 3, ps, ps]
            "class_embd": t("v.class_embd"),
            "pos_embd": t("v.position_embd.weight"),  # [n_patches+1, hidden]
            "pre_ln_w": t("v.pre_ln.weight"),
            "pre_ln_b": t("v.pre_ln.bias"),
            "mm0_w": t("mm.0.weight"),
            "mm0_b": t("mm.0.bias"),
            "mm2_w": t("mm.2.weight"),
            "mm2_b": t("mm.2.bias"),
            "layers": [],
        }
        for i in range(cfg.n_layers):
            pre = f"v.blk.{i}."
            p["layers"].append(
                {
                    k: t(pre + n)
                    for k, n in [
                        ("q_w", "attn_q.weight"), ("q_b", "attn_q.bias"),
                        ("k_w", "attn_k.weight"), ("k_b", "attn_k.bias"),
                        ("v_w", "attn_v.weight"), ("v_b", "attn_v.bias"),
                        ("o_w", "attn_out.weight"), ("o_b", "attn_out.bias"),
                        ("ln1_w", "ln1.weight"), ("ln1_b", "ln1.bias"),
                        ("ln2_w", "ln2.weight"), ("ln2_b", "ln2.bias"),
                        ("ff_i_w", "ffn_down.weight"), ("ff_i_b", "ffn_down.bias"),
                        ("ff_o_w", "ffn_up.weight"), ("ff_o_b", "ffn_up.bias"),
                    ]
                }
            )
    return p, cfg


def preprocess_image(img, cfg: ClipConfig) -> np.ndarray:
    """PIL image / HWC uint8 array → normalized f32 [S, S, 3]
    (ref: clip_image_preprocess clip.cpp:726-800 — pad to square with the
    LLaVA background color, bilinear resize, mean/std normalize)."""
    from PIL import Image

    if not isinstance(img, Image.Image):
        img = Image.fromarray(np.asarray(img, np.uint8))
    img = img.convert("RGB")
    nx, ny = img.size
    if nx != ny:
        side = max(nx, ny)
        canvas = Image.new("RGB", (side, side), (122, 116, 104))
        canvas.paste(img, (0, 0))
        img = canvas
    img = img.resize((cfg.image_size, cfg.image_size), Image.BILINEAR)
    x = np.asarray(img, np.float32) / 255.0
    mean = np.asarray(cfg.image_mean, np.float32)
    std = np.asarray(cfg.image_std, np.float32)
    return (x - mean) / std


@functools.lru_cache(maxsize=None)
def _encode_fn(cfg: ClipConfig):
    import jax
    import jax.numpy as jnp

    def ln(x, w, b):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + cfg.eps) * w + b

    def gelu(x):
        if cfg.use_gelu:
            return jax.nn.gelu(x, approximate=True)  # ggml_gelu (tanh approx)
        return x * jax.nn.sigmoid(1.702 * x)  # ggml gelu_quick == HF quick_gelu

    @jax.jit
    def encode(p, pixels):  # pixels [S, S, 3] normalized
        ps, hid, nh = cfg.patch_size, cfg.hidden, cfg.n_heads
        dh = hid // nh
        g = cfg.image_size // ps
        # unfold into patches [g*g, 3*ps*ps] matching conv2d stride=ps:
        # channel-major like the ggml conv (weight [hid, 3, ps, ps])
        x = pixels.transpose(2, 0, 1)  # [3, S, S]
        x = x.reshape(3, g, ps, g, ps).transpose(1, 3, 0, 2, 4).reshape(g * g, 3 * ps * ps)
        w = p["patch_embd"].reshape(hid, 3 * ps * ps)
        x = x @ w.T  # [n_patches, hid]
        x = jnp.concatenate([p["class_embd"][None, :], x], axis=0)
        x = x + p["pos_embd"]
        x = ln(x, p["pre_ln_w"], p["pre_ln_b"])

        # n_layers - 1 blocks (LLaVA skips the last, clip.cpp:343)
        for lp in p["layers"][: cfg.n_layers - 1]:
            h = ln(x, lp["ln1_w"], lp["ln1_b"])
            q = (h @ lp["q_w"].T + lp["q_b"]) * (dh ** -0.5)
            k = h @ lp["k_w"].T + lp["k_b"]
            v = h @ lp["v_w"].T + lp["v_b"]
            T = q.shape[0]
            q = q.reshape(T, nh, dh).transpose(1, 0, 2)
            k = k.reshape(T, nh, dh).transpose(1, 0, 2)
            v = v.reshape(T, nh, dh).transpose(1, 0, 2)
            att = jax.nn.softmax(q @ k.transpose(0, 2, 1), axis=-1)
            h = (att @ v).transpose(1, 0, 2).reshape(T, hid)
            h = h @ lp["o_w"].T + lp["o_b"]
            x = x + h
            h = ln(x, lp["ln2_w"], lp["ln2_b"])
            h = gelu(h @ lp["ff_i_w"].T + lp["ff_i_b"])
            h = h @ lp["ff_o_w"].T + lp["ff_o_b"]
            x = x + h

        # llava projector: drop the class row, mm.0 → GELU(exact) → mm.2
        x = x[1:]
        x = x @ p["mm0_w"].T + p["mm0_b"]
        x = jax.nn.gelu(x, approximate=False)
        x = x @ p["mm2_w"].T + p["mm2_b"]
        return x  # [n_patches, n_embd_llm]

    return encode


def encode_image(params, cfg: ClipConfig, pixels: np.ndarray) -> np.ndarray:
    """Normalized pixels [S, S, 3] → image embeddings [n_patches, n_embd]."""
    return np.asarray(_encode_fn(cfg)(params, pixels))
