"""Model architectures + GGUF loader
(ref: llama.cpp llm_build_* graph builders :3872-4900, loader :1805-3426)."""

from .config import ModelConfig  # noqa: F401
from .loader import load_model  # noqa: F401
