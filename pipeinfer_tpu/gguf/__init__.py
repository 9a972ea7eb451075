"""GGUF file format I/O (ref: ggml.c GGUF API, ggml.h:2006-2120)."""

from .constants import GGMLQuantType, GGUFValueType, Keys, QK_K, type_size  # noqa: F401
from .reader import GGUFReader, GGUFTensorInfo  # noqa: F401
from .writer import GGUFWriter  # noqa: F401
