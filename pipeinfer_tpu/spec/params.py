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

    # -- acceptance-adaptive depth (fused runs) ----------------------------
    # The reference trims drafting per token with a p_accept gate on the
    # draft's top-prob (README.md:191-220 tuning envelope); a fused TPU run
    # is a fixed-depth compiled program, so the equivalent control is to
    # pick each run's depth from a small compiled ladder using the observed
    # per-token acceptance rate (EMA), maximizing expected committed tokens
    # per unit run cost: E[d] = 1 + a(1-a^d)/(1-a) over cost fixed + d.
    adapt_depth: bool = True
    # per-run fixed cost (dispatch + target verify + the run's amortized
    # share of the host fetch RTT) in draft-step units. Measured on the
    # 7B+TinyLlama-ratio bench pair: verify ~6 ms (one weight-streaming
    # pass, nearly depth-independent) + ~RTT/inflight over ~1.4 ms per
    # draft chain step. Keep this HONESTLY high: undervaluing the fixed
    # cost makes the policy downshift on transient EMA dips, and every
    # depth switch alternates compiled executables (measured ~30-60 ms per
    # swap on the tunneled runtime).
    fixed_cost_steps: float = 10.0
    # per-judged-token EMA decay for the acceptance estimate. Keep the
    # memory at ~25 judged tokens (≈3 full-depth runs): at 0.9 a single
    # partially-matched verify (w = 0.9^5) dropped the estimate from 1.0
    # to 0.76 and the depth policy panicked down the ladder for one run
    ema_decay: float = 0.96
    # only switch rungs when the predicted value improves by this factor —
    # hysteresis against executable flapping at rung boundaries
    depth_hysteresis: float = 0.15
    # a rung change additionally needs this many consecutive FRESH-EMA
    # launches (launches after distinct EMA updates) that prefer the same
    # new rung. The EMA swings on every mismatch/recovery cycle; several
    # launches can read one stale dipped estimate before the next verify
    # lands, so votes against the same EMA value count once — measured:
    # 17 rung swaps in a 256-token degraded run cost ~45 ms each and
    # halved throughput (204.8 -> 113.9 tok/s) before this guard
    depth_debounce: int = 3
    # minimum probability that a chained run's assumed prefix survives
    # verification (accept_ema ** assumed_len) for the pump to launch it —
    # the chain-level counterpart of the reference's p_accept draft gate.
    # 0 = off, the MEASURED single-chip default (r5 sweep on the degraded
    # 7B pair: p_chain 0 / 0.3 / 0.6 -> 204.7 / 203.3 / 194.6 tok/s at
    # 36.6 / 35.5 / 30.8% dead work — the gate trades dead device time
    # for pipeline bubbles, and on one chip the RTT serialization costs
    # more than the dead work it saves). Raise for device-bound
    # multi-chip topologies where speculative device time is the scarce
    # resource; `bench.py` captures the sweep per machine.
    p_chain: float = 0.0
    # device-corrected chaining (spec/corrected.py): when the sampler chain
    # fits the device verifier, fused runs verify ON DEVICE and chain from
    # the corrected frontier, so chained runs are never launched on a
    # diverged assumption (cross-run dead work -> 0). False forces the
    # host-verified fused/tree path everywhere (its cancellation machinery
    # is still always used for grammar/penalties/mirostat/trees/staged)
    device_verify: bool = True
    # speculative ROUNDS per corrected dispatch: each corrected run chains
    # R draft+verify rounds inside one program (lax.scan) — the device
    # loop's cadence with the controller's bookkeeping (sparse heads,
    # per-round EMA updates, adaptive depth, EOS authority). MEASURED
    # default 1 on this machine: max_inflight chained dispatches already
    # hide the ~30 ms dispatch RTT, so R>1 only coarsens the end-of-
    # generation tail (R=4 at depth 32 regressed the perfect-draft row
    # 494->440 tok/s — 132-token dispatch granularity vs a 256-token
    # budget — and moved the degraded row 356->358, i.e. noise). Raise it
    # for higher-RTT device-bound topologies where dispatch cadence, not
    # tail waste, is the binding cost.
    corr_rounds: int = 1

    def ladder(self) -> tuple[int, ...]:
        """Compiled fused-run depths (halving from n_draft, max 4 rungs).
        Each rung is a separate XLA executable — warmed at startup like the
        KV hot-bucket ladder."""
        if not self.adapt_depth:
            return (self.n_draft,)
        out, d = [], self.n_draft
        while d >= 2 and len(out) < 4:
            out.append(d)
            d //= 2
        return tuple(sorted(set(out))) or (self.n_draft,)

    def depth_value_corrected(self, d: int, accept_ema: float) -> float:
        """Expected committed tokens per unit run cost at depth d for
        DEVICE-CORRECTED runs (spec/corrected.py). Corrected chains carry
        no cross-run kill risk — a mismatch costs only the run's own tail
        (the drafts past the first reject), so the value is just expected
        commits over the run's cost: E[d] = 1 + a(1-a^d)/(1-a) committed
        tokens for fixed_cost + d draft-step units. Monotone pressure:
        high acceptance pushes deep (tail waste is rare), low acceptance
        pushes shallow (the fixed cost stops the descent)."""
        a = min(max(accept_ema, 0.05), 0.999)
        exp_tokens = 1.0 + a * (1.0 - a**d) / (1.0 - a)
        return exp_tokens / (self.fixed_cost_steps + d)

    def depth_value(self, d: int, accept_ema: float) -> float:
        """Expected committed tokens per unit run cost at depth d.

        Cost model for the CHAINED async pipeline: a run whose own segment
        fully matches (prob a^d) hands downstream runs a true frontier; any
        within-run mismatch invalidates every chained run in flight behind
        it (~max_inflight-1 runs of the same cost — pure dead device time,
        see metrics.dead_work_frac). Deep chains therefore pay a survival-
        weighted kill multiplier on top of their own cost; at high
        acceptance the multiplier is mild and depth wins, at low acceptance
        it pushes the policy down the ladder (the fused-run counterpart of
        the reference's p_accept draft trimming, README.md:191-220)."""
        a = min(max(accept_ema, 0.05), 0.999)
        exp_tokens = 1.0 + a * (1.0 - a**d) / (1.0 - a)
        kill = 1.0 + (1.0 - a**d) * max(self.max_inflight - 1, 0)
        return exp_tokens / ((self.fixed_cost_steps + d) * kill)

    def pick_depth(
        self, accept_ema: float, current: int | None = None,
        corrected: bool = False,
    ) -> int:
        """Throughput-maximizing rung for the current acceptance estimate.
        With `current` set, sticks to the current rung unless the best
        rung's predicted value clears the hysteresis margin (rung changes
        alternate compiled executables — flapping costs real wall time).
        corrected=True uses the tail-waste-only value model (device-
        corrected runs carry no cross-run kill risk)."""
        value = self.depth_value_corrected if corrected else self.depth_value
        rungs = self.ladder()
        if len(rungs) == 1:
            return rungs[0]
        best, best_v = rungs[-1], -1.0
        for d in rungs:
            v = value(d, accept_ema)
            if v > best_v:
                best, best_v = d, v
        if current in rungs and best != current:
            if best_v < value(current, accept_ema) * (1.0 + self.depth_hysteresis):
                return current
        return best

    def p_adjust(self, iter_: int, n_rejected: int) -> float:
        """Adaptive speculation throttle (ref: speculative.cpp:846-848)."""
        return iter_ * self.p_recovery - max(n_rejected * self.p_decay, 0.0)


def entropy_seed(seed: int | None) -> int:
    """Device-PRNG base: the user's seed, or REAL entropy when unseeded —
    `(seed or 0)` would alias seed=0 with unseeded AND make unseeded
    stochastic runs replay the same Gumbel draws every call. Shared by
    every device-sampling engine (device_loop, device_multi)."""
    if seed is not None:
        return seed
    import os

    return int.from_bytes(os.urandom(4), "little")
