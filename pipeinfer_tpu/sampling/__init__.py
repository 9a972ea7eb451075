"""Sampling chain + grammar constraints
(ref: common/sampling.cpp, llama.cpp sampler primitives, grammar-parser.cpp)."""

from .samplers import SamplingParams, SamplerState, sample, sample_with_candidates  # noqa: F401
