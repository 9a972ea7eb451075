"""Model hyperparameters, populated from GGUF metadata
(ref: llama.cpp:2203-2386 `llm_load_hparams`)."""

from __future__ import annotations

import dataclasses

from ..gguf.constants import Keys
from ..gguf.reader import GGUFReader


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    arch: str
    n_vocab: int
    n_embd: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    n_ff: int
    head_dim: int
    rope_dims: int
    rope_mode: str  # "norm" | "neox" | "none"
    rope_base: float = 10000.0
    rope_scale: float = 1.0  # linear scaling (1/factor applied to angles)
    norm_eps: float = 1e-5
    norm_rms: bool = True
    n_ctx_train: int = 2048
    max_alibi_bias: float = 0.0
    clamp_kqv: float = 0.0
    parallel_residual: bool = False
    # YaRN (ref: llama.h:186-196)
    yarn_ext_factor: float = 0.0
    yarn_attn_factor: float = 1.0
    yarn_beta_fast: float = 32.0
    yarn_beta_slow: float = 1.0

    @property
    def attn_scale(self) -> float:
        return self.head_dim ** -0.5


# rope convention per architecture (ref: llama.cpp build_* rope calls)
_ROPE_MODE = {
    "llama": "norm",
    "baichuan": "norm",
    "falcon": "neox",
    "starcoder": "none",
    "persimmon": "neox",
    "refact": "neox",
    "bloom": "none",
    "mpt": "none",
    "stablelm": "neox",
    "gptneox": "neox",
}


def config_from_gguf(r: GGUFReader) -> ModelConfig:
    arch = r.architecture
    n_embd = int(r.field(Keys.EMBEDDING_LENGTH))
    n_heads = int(r.field(Keys.HEAD_COUNT))
    n_kv = int(r.field(Keys.HEAD_COUNT_KV, n_heads))
    head_dim = n_embd // n_heads
    rope_dims = int(r.field(Keys.ROPE_DIMENSION_COUNT, head_dim) or head_dim)
    scale = r.field(Keys.ROPE_SCALING_FACTOR)
    if scale is None:
        scale = r.field(Keys.ROPE_SCALE_LINEAR)
    rope_scale = 1.0 / float(scale) if scale else 1.0
    eps = r.field(Keys.LAYER_NORM_RMS_EPS)
    rms = eps is not None
    if eps is None:
        eps = r.field(Keys.LAYER_NORM_EPS, 1e-5)
    n_vocab = len(r.metadata.get(Keys.TOKENIZER_LIST, [])) or int(
        r.metadata.get("general.vocab_size", 0)
    )
    if not n_vocab and "token_embd.weight" in r.tensors:
        n_vocab = r.tensors["token_embd.weight"].shape[0]
    return ModelConfig(
        arch=arch,
        n_vocab=n_vocab,
        n_embd=n_embd,
        n_layers=int(r.field(Keys.BLOCK_COUNT)),
        n_heads=n_heads,
        n_kv_heads=n_kv,
        n_ff=int(r.field(Keys.FEED_FORWARD_LENGTH, 4 * n_embd)),
        head_dim=head_dim,
        rope_dims=rope_dims,
        rope_mode=_ROPE_MODE.get(arch, "norm"),
        rope_base=float(r.field(Keys.ROPE_FREQ_BASE, 10000.0) or 10000.0),
        rope_scale=rope_scale,
        norm_eps=float(eps),
        norm_rms=rms,
        n_ctx_train=int(r.field(Keys.CONTEXT_LENGTH, 2048) or 2048),
        max_alibi_bias=float(r.field(Keys.MAX_ALIBI_BIAS, 0.0) or 0.0),
        clamp_kqv=float(r.field(Keys.CLAMP_KQV, 0.0) or 0.0),
    )
