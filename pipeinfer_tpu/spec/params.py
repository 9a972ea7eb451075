"""Speculation parameters (ref: common/common.h:54-65 PipeInfer knobs +
README.md:191-220 tuning semantics)."""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class SpecParams:
    n_draft: int = 5  # tree depth (--draft; keep <= 8 per ref tuning guide)
    n_parallel: int = 3  # max branches (-np)
    p_accept: float = 0.3  # stop drafting below this top-prob (-pa)
    p_split: float = 0.75  # split branch above this runner-up prob (-ps)
    p_recovery: float = 0.0  # threshold recovery per idle iteration (-pr)
    p_decay: float = 0.0  # threshold decay per rejection (-pd)
    max_inflight: int = 4  # concurrent speculative runs in the pipeline
    # keep at least this many runs queued even when logits are ready —
    # hides host round-trips on fast devices (the reference only speculates
    # while the MPI pipeline is busy; a TPU step queue benefits from
    # eager chaining)
    min_inflight: int = 2

    def p_adjust(self, iter_: int, n_rejected: int) -> float:
        """Adaptive speculation throttle (ref: speculative.cpp:846-848)."""
        return iter_ * self.p_recovery - max(n_rejected * self.p_decay, 0.0)
