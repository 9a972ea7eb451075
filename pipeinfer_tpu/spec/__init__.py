"""Speculative decoding engines.

- ``drafting``: shared draft-tree generation (p_accept/p_split branching)
- ``sync_spec``: lock-step draft→verify baseline (ref: examples/speculative_orig)
- ``controller``: the asynchronous PipeInfer state machine
  (ref: examples/speculative/speculative.cpp)
"""

from .params import SpecParams  # noqa: F401
