"""The asynchronous PipeInfer controller.

Re-design of the reference's async speculation state machine
(ref: examples/speculative/speculative.cpp — main loop :316-679,
run_speculation_loop :765-844, start_async_spec_run :881-1180,
begin_async_run :1182-1275, check_for_cancel :1277-1359) as an explicit,
testable run-state machine on top of JAX async dispatch:

- a deque of in-flight AsyncRuns (microbatches dispatched to the target
  mesh); `AsyncHandle.ready()` replaces the head's MPI iprobe;
- while the oldest run's logits are not ready, the controller keeps
  drafting and launching *chained* speculative runs from the assumed
  frontier (branch 0 of the newest tree), throttled by
  p_accept + p_adjust(iter, n_rejected);
- each speculative run owns a block of sequence slots from a free pool
  (ref :140-145 seq-offset pool) and copies its prefix cells zero-copy;
- verification walks the winning branch, samples the target chain only for
  undecided positions, consolidates accepted tree cells to sequence 0 and
  rolls the rest back;
- cancellation marks in-flight runs whose assumed prefix diverged from the
  actual generation (queued work is dropped at retirement — XLA steps are
  not abortable mid-flight, so cancellation granularity is the microbatch,
  mirroring the reference's small-draft tuning guidance README.md:199-201);
- a non-speculative "safety" run of the newest accepted token always
  follows a verification, guaranteeing forward progress
  (ref begin_non_spec_run).

Position invariants:
- positions [0, n_committed) hold decided tokens (prompt + generated);
  the cell for position n_committed-1 may still be in flight (safety run);
- a spec run's tree tokens occupy positions [run.base, run.base+depth);
  branch b's token i sits at position run.base+i, and the logits at
  branch.i_batch_tgt[i] decide position run.base+i+1;
- the controller chains speculation down branch 0: `assumed` holds tokens
  taken on faith beyond n_committed, `spec_base` is the next tree base.
"""

from __future__ import annotations

import dataclasses
import time
from collections import deque

import numpy as np

from ..runtime.context import AsyncHandle, Batch, CacheFull, InferenceContext
from ..sampling.samplers import SamplerState, SamplingParams, sample, top_probs
from . import corrected, drafting, fused
from .params import SpecParams
from .sync_spec import SpecStats, draft_sampler_proto


@dataclasses.dataclass
class AsyncRun:
    """ref: seq_async_run (speculative.cpp:30-43)."""

    handle: AsyncHandle
    batch: Batch
    branches: list[drafting.DraftBranch]  # spec only; tokens exclude root
    base: int  # first tree position (spec) / first batch position (non-spec)
    prefix_base: int  # committed frontier when this chain started
    assumed_prefix: list[int]  # tokens assumed beyond prefix_base at launch
    max_decide: int  # highest position this run's logits can decide
    dft_base: int
    seq_offset: int  # 0 for non-spec
    speculative: bool
    canceled: bool = False
    # the draft re-decoded the chain root on its branch seq (fresh chain):
    # its cell at base-1 must be consolidated with the tree
    dft_root_redecoded: bool = False
    n_drafted: int = 0  # drafted tokens this run carries (spec only)
    # fused run (spec/fused.py): branches[0].tokens is None until the eager
    # fetch lands; handle.fetch() returns (logits, tokens)
    fused: bool = False
    # device-corrected run (spec/corrected.py): verification happened on
    # device; handle.fetch() returns a list of per-round
    # (m, committed tokens, sparse rows) tuples. Never canceled (its
    # context is the true frontier by construction).
    corrected: bool = False
    corr_cells: tuple | None = None  # (dcells, tcells) for mirror reconcile
    corr_rounds: int = 1  # speculative rounds chained inside this run
    corr_depth: int = 0  # draft depth per round


@dataclasses.dataclass
class PipeInferMetrics:
    """Run metrics, results.csv schema (ref: speculative.cpp:693-730).

    TTFT is PREFILL-INCLUSIVE (time from generation start — prompt decode
    included — to the first committed token), matching the reference's
    measurement window (speculative.cpp:305-309). `ttft_decode_s` is the
    decode-only latency (first token after prefill finished)."""

    ttft_s: float = 0.0
    ttft_decode_s: float = 0.0
    inter_token_s: list[float] = dataclasses.field(default_factory=list)
    t_encode_s: float = 0.0
    t_decode_s: float = 0.0
    n_encoded: int = 0
    n_decoded: int = 0
    n_canceled_runs: int = 0
    n_runs: int = 0
    # dead-work meter: device tokens dispatched for runs later canceled or
    # discarded — misprediction cost made visible (ref: the canceled-batch
    # compute the reference aborts mid-graph, llama.cpp:5665-5691; XLA steps
    # are not abortable, so this is pure waste on TPU)
    n_dispatched_tokens: int = 0
    n_dead_tokens: int = 0

    @property
    def dead_work_frac(self) -> float:
        return self.n_dead_tokens / max(self.n_dispatched_tokens, 1)

    @property
    def avg_itl(self) -> float:
        return float(np.mean(self.inter_token_s)) if self.inter_token_s else 0.0

    @property
    def decode_tps(self) -> float:
        return self.n_decoded / self.t_decode_s if self.t_decode_s > 0 else 0.0

    @property
    def encode_tps(self) -> float:
        return self.n_encoded / self.t_encode_s if self.t_encode_s > 0 else 0.0

    def csv_row(self, label: str) -> str:
        """One labeled results.csv row — the SINGLE schema every writer
        uses (5 fields: encode t/s, decode t/s, avg ITL s, TTFT s, label);
        tools/results.py rejects mixed-schema files."""
        return (
            f"{self.encode_tps},{self.decode_tps},{self.avg_itl},"
            f"{self.ttft_s},{label}"
        )


class PipeInferController:
    def __init__(
        self,
        ctx_tgt: InferenceContext,
        ctx_dft: InferenceContext,
        sampling: SamplingParams,
        sp: SpecParams,
        *,
        eos_id: int = 2,
        seq_base: int = 0,
        offsets: "deque[int] | None" = None,
        grammar=None,
    ):
        """seq_base: the committed sequence slot for this stream (multi-
        request engines give each request a disjoint slot namespace and a
        shared branch-offset pool via `offsets`).

        grammar: optional GrammarState constraining the target sampler;
        draft trees are launched with a per-run snapshot advanced through
        the assumed chain (ref: speculative.cpp:1234-1245 sampler-state
        snapshot per async run)."""
        self.tgt = ctx_tgt
        self.dft = ctx_dft
        self.sampling = sampling
        self.sp = sp
        self.eos_id = eos_id
        self.seq_base = seq_base
        self.stats = SpecStats()
        self.metrics = PipeInferMetrics()
        # sparse logits head: ship top-K + normalizer instead of the vocab
        # row (host fetch bandwidth bounds decode); full logits only when a
        # chain feature needs them (grammar masking walks the full vocab)
        self.topk: int | None = None
        if sampling.mirostat == 0 and not sampling.logit_bias and grammar is None:
            self.topk = min(128, ctx_tgt.cfg.n_vocab)

        self.runs: deque[AsyncRun] = deque()  # newest appended right
        n_par = sp.n_parallel
        self.free_offsets: deque[int] = (
            offsets
            if offsets is not None
            else deque(seq_base + 1 + i * n_par for i in range(sp.max_inflight))
        )
        self.n_rejected = 0

        # generation state
        self.prompt: list[int] = []
        self.generated: list[int] = []
        self._n_probs = 0
        self.probs: list = []
        self.sampler = SamplerState(params=sampling, grammar=grammar)

        # speculation frontier: the chain of assumed (drafted-but-unverified)
        # branch-0 tokens at positions [chain_base, spec_base). The chain
        # SURVIVES verifications while the accepted tokens keep matching it —
        # this is what keeps the pipeline full (the reference pays a
        # begin_non_spec_run + chain restart every verify; see its FIXME at
        # speculative.cpp:366).
        self.chain_tokens = fused.ChainBuf()
        self.chain_base = 0
        self.spec_base = 0  # next tree base position (target & draft symmetric)
        self.chain_root = None  # int | device int32 scalar (fused chaining)
        self.chain_root_dft_logits: np.ndarray | None = None
        self.chain_prev_offset: int | None = None
        # positions [0, seq0_frontier) have cells on sequence 0
        self.seq0_frontier = 0
        # fused dispatch (one program per run, device-chained roots): see
        # spec/fused.py for eligibility; falls back to host drafting
        self.use_fused = fused.supported(self)
        # device-corrected chaining supersedes the assume-chained fused
        # path when the sampler fits the device verifier (spec/corrected.py
        # — chained runs launch from the TRUE frontier, so cross-run dead
        # work and cancellation vanish in this regime)
        self.use_corrected = corrected.supported(self)
        if self.use_corrected:
            self.use_fused = False
        # corrected-chain state: (root, base) device scalars from the
        # newest launched run; host_base = the OLDEST unretired run's true
        # root position; hint = host upper bound for the next run's base
        self._corr_root = None
        self._corr_base = None
        self._corr_host_base = 0
        # per-run draft-sampler seeds (stochastic fused runs); derived from
        # the sampling seed so seeded generations are reproducible. seed < 0
        # means "random": draw a real entropy base so distinct engines do
        # not replay identical Gumbel draft sequences (identical acceptance
        # patterns would bias stochastic benchmarks)
        if sampling.seed >= 0:
            base_seed = sampling.seed
        else:
            import os

            base_seed = int.from_bytes(os.urandom(4), "little")
        self._fused_seed = base_seed * 1000003
        # acceptance EMA drives the fused depth ladder (SpecParams.pick_depth)
        # and the chain-survival launch gate; optimistic start = first runs
        # use full depth, exactly the pre-adaptive behavior
        self.accept_ema = 1.0
        self.depth_counts: dict[int, int] = {}  # fused depth -> runs launched
        self._cur_depth: int | None = None  # current rung (hysteresis state)
        self._depth_votes: tuple[int, int] | None = None  # (rung, streak)
        self._ema_version = 0  # bumped per EMA update; votes need fresh EMAs
        self._voted_version = -1

    def _next_fused_seed(self) -> int:
        self._fused_seed += 1
        return self._fused_seed & 0x7FFFFFFF

    def _update_accept_ema(self, n_matched: int, n_judged: int):
        """Fold one verified run's judged tokens into the per-token
        acceptance EMA as PER-TOKEN folds (closed form of folding each
        judged token individually, matches first, the mismatch last):

            ema' = d^n * ema + d^(n-m) * (1 - d^m)

        The earlier per-run fold (w = d^n toward the run ratio m/n) gave a
        full-depth match (n ~ 9, weight 1-d^9) several times the pull of an
        early mismatch (n = 1, weight 1-d), so runs that survived deep
        dragged the estimate above the true rate (measured 0.60 at a true
        50%-acceptance draft). Per-token folds weight every judged token
        equally in steady state, so the EMA converges to the true
        per-token acceptance (see test_async_spec EMA-convergence test).

        Canceled runs are deliberately NOT folded: their drafted tokens
        were produced from an assumed context that later diverged, so
        comparing them against committed tokens measures draft-vs-target
        under *mismatched* contexts — contaminated evidence that would
        bias the estimate toward 0. Their cost (chain kill + dead device
        work) is what SpecParams.depth_value's kill multiplier models,
        driven by this (accurate) per-token estimate."""
        if n_judged <= 0:
            return
        d = self.sp.ema_decay
        self.accept_ema = (
            d**n_judged * self.accept_ema
            + d ** (n_judged - n_matched) * (1.0 - d**n_matched)
        )
        self._ema_version += 1

    # -- helpers ------------------------------------------------------------

    @property
    def n_committed(self) -> int:
        return len(self.prompt) + len(self.generated)

    def _token_at(self, pos: int) -> int:
        if pos < len(self.prompt):
            return self.prompt[pos]
        return self.generated[pos - len(self.prompt)]

    def _oldest_ready(self) -> bool:
        return bool(self.runs) and self.runs[0].handle.ready()

    # -- launches -----------------------------------------------------------

    def _launch_nonspec(self, tokens: list[int], base: int):
        """Safety/prefill run on sequence 0 (ref: begin_non_spec_run)."""
        b = Batch()
        for i, t in enumerate(tokens):
            b.add(t, base + i, self.seq_base, want_logits=(i == len(tokens) - 1))
        handle = self.tgt.decode_async(b, self.topk)
        self.seq0_frontier = max(self.seq0_frontier, base + len(tokens))
        self.runs.append(
            AsyncRun(
                handle=handle,
                batch=b,
                branches=[],
                base=base,
                prefix_base=self.n_committed,
                assumed_prefix=[],
                max_decide=base + len(tokens),
                dft_base=base,
                seq_offset=self.seq_base,
                speculative=False,
            )
        )
        self.metrics.n_runs += 1
        self.metrics.n_dispatched_tokens += len(b)

    def _launch_spec(self, p_adjust: float) -> bool:
        """Draft a tree at the assumed frontier and dispatch it to the
        target (ref: start_async_spec_run). Returns False if nothing was
        drafted (threshold) or the KV pool is exhausted (backpressure) —
        the offset is recycled either way."""
        sp = self.sp
        offset = self.free_offsets.popleft()
        try:
            return self._launch_spec_inner(offset, p_adjust)
        except CacheFull:
            # backpressure: roll back this run's partial allocations and
            # stop pumping until retirements free cells (the reference
            # asserts in find_slot instead; SURVEY §7 hard part (c))
            for s in range(sp.n_parallel):
                self.tgt.seq_rm(s + offset, 0, -1)
                self.dft.seq_rm(s + offset, 0, -1)
            self.free_offsets.append(offset)
            self.n_rejected += 1
            return False

    def _launch_spec_inner(self, offset: int, p_adjust: float) -> bool:
        sp = self.sp
        first = not self.chain_tokens
        src_seq = self.seq_base if first else self.chain_prev_offset  # branch 0 of prev run

        if self.use_fused:
            return self._launch_spec_fused(offset, src_seq)

        root_redecode = self.chain_root_dft_logits is None
        dft_hi = self.spec_base - 1 if root_redecode else self.spec_base
        branch_seqs = [s + offset for s in range(sp.n_parallel)]
        self.tgt.prepare_branch_seqs(branch_seqs, src_seq, self.spec_base)
        self.dft.prepare_branch_seqs(branch_seqs, src_seq, dft_hi)

        proto = draft_sampler_proto(self.sampling)
        proto.prev = list(self.sampler.prev) + list(self.chain_tokens)
        if self.sampler.grammar is not None:
            # snapshot the grammar at the committed frontier and replay the
            # assumed chain — drafted tokens stay grammar-legal, so the
            # verifier's masked samples can actually match them
            g = self.sampler.grammar.copy()
            for t in self.chain_tokens:
                g.accept_token(t)
            proto.grammar = g
        branches = drafting.new_branches(sp.n_parallel, proto)

        batch_tgt = Batch()
        n_drafted, last_dft_logits = drafting.draft_tree(
            self.dft,
            sp,
            branches,
            self.chain_root,
            self.chain_root_dft_logits,
            seq_offset=offset,
            dft_base=self.spec_base - 1,
            tgt_base=self.spec_base,
            batch_tgt=batch_tgt,
            p_adjust=p_adjust,
            topk=self.topk,
            seed=self._next_fused_seed(),
        )
        for br in branches:
            if br.tokens:
                br.tokens.pop(0)  # strip chained root
            br.prefix_tokens = list(self.chain_tokens)

        if len(batch_tgt) == 0:
            # nothing cleared the threshold: un-share the prepared branch
            # seqs (prefix bits + any root-redecode draft cells) before
            # recycling the offset, or they linger until offset reuse
            for s in range(sp.n_parallel):
                self.tgt.seq_rm(s + offset, 0, -1)
                self.dft.seq_rm(s + offset, 0, -1)
            self.free_offsets.append(offset)
            self.n_rejected += 1
            return False

        handle = self.tgt.decode_async(batch_tgt, self.topk)  # may CacheFull
        self.stats.n_drafted += n_drafted
        depth0 = len(branches[0].tokens)
        max_depth = max(len(b.tokens) for b in branches if b.active)
        self.runs.append(
            AsyncRun(
                handle=handle,
                batch=batch_tgt.copy(),
                branches=[b.copy() for b in branches],
                base=self.spec_base,
                prefix_base=self.chain_base,
                assumed_prefix=list(self.chain_tokens),
                max_decide=self.spec_base + max_depth,
                dft_base=self.spec_base,
                seq_offset=offset,
                speculative=True,
                dft_root_redecoded=root_redecode,
                n_drafted=n_drafted,
            )
        )
        self.metrics.n_runs += 1
        self.metrics.n_dispatched_tokens += len(batch_tgt)

        # chain down branch 0 (ref: id = drafts[0].tokens.back())
        if depth0 > 0:
            self.chain_tokens.extend_host(branches[0].tokens)
            self.chain_root = branches[0].tokens[-1]
            self.chain_root_dft_logits = last_dft_logits
            self.chain_prev_offset = offset
            self.spec_base += depth0
        return True

    def _choose_depth(self, corrected_mode: bool = False) -> int:
        """Acceptance-adaptive fused depth with debounce: a new rung must
        win sp.depth_debounce consecutive FRESH-EMA launches before we pay
        the executable swap — transient dips after a single mismatch
        otherwise flap the rung, and several launches can read one stale
        estimate before the next verify lands (votes per EMA value count
        once). The reference trims drafting per token with its p_accept
        gate (README.md:191-220); a compiled run picks its rung instead."""
        sp = self.sp
        depth = sp.pick_depth(self.accept_ema, self._cur_depth,
                              corrected=corrected_mode)
        if self._cur_depth is not None and depth != self._cur_depth:
            if self._ema_version == self._voted_version:
                depth = self._cur_depth
            else:
                self._voted_version = self._ema_version
                rung, streak = self._depth_votes or (depth, 0)
                streak = streak + 1 if rung == depth else 1
                if streak < sp.depth_debounce:
                    self._depth_votes = (depth, streak)
                    depth = self._cur_depth
                else:
                    self._depth_votes = None
        else:
            self._depth_votes = None
        self._cur_depth = depth
        return depth

    def _launch_corrected(self) -> bool:
        """Dispatch one device-corrected run chained from the corrected
        frontier scalars (spec/corrected.py). Returns False on cache
        backpressure (nothing was allocated)."""
        depth = self._choose_depth(corrected_mode=True)
        rounds = max(1, self.sp.corr_rounds)
        # mirror-position hint: the true retired frontier plus the in-flight
        # runs' worst-case advance — re-anchors as fetches reconcile, so the
        # hot bucket tracks real occupancy, not accumulated overestimates
        hint = self._corr_host_base + sum(
            r.n_drafted + r.corr_rounds for r in self.runs if r.corrected
        )
        try:
            handle, root2, base2, dcells, tcells = corrected.launch(
                self.dft, self.tgt,
                root=self._corr_root, base=self._corr_base,
                seq_id=self.seq_base, depth=depth, topk=self.topk,
                hint=hint,
                samp=fused.draft_samp(self.sampling),
                tsample=self.sampling.temp > 0,
                seed=self._next_fused_seed(),
                rounds=rounds,
            )
        except CacheFull:
            self.n_rejected += 1
            return False
        self.depth_counts[depth] = self.depth_counts.get(depth, 0) + 1
        run = AsyncRun(
            handle=handle,
            batch=Batch(),
            branches=[],
            base=hint + 1,
            prefix_base=self.n_committed,
            assumed_prefix=[],
            max_decide=1 << 60,  # never stale: device context is the truth
            dft_base=hint,
            seq_offset=self.seq_base,
            speculative=True,
            n_drafted=rounds * depth,
            corrected=True,
            corr_cells=(dcells, tcells),
            corr_rounds=rounds,
            corr_depth=depth,
        )
        self.runs.append(run)
        self.metrics.n_runs += 1
        self.metrics.n_dispatched_tokens += rounds * depth
        self.stats.n_drafted += rounds * depth
        self._corr_root, self._corr_base = root2, base2
        return True

    def _launch_spec_fused(self, offset: int, src_seq: int) -> bool:
        """One-dispatch speculative run (spec/fused.py): the draft chain and
        the target verify execute in the same program; the next run chains
        from a device scalar, so launches never wait on a host fetch."""
        sp = self.sp
        # depth adapts to observed acceptance: fixed-depth fused chains at
        # low acceptance burn most of their depth
        depth = self._choose_depth()
        self.depth_counts[depth] = self.depth_counts.get(depth, 0) + 1
        # device-side seq prep happens INSIDE the fused program; only the
        # host mirrors update here
        self.tgt.prepare_branch_seqs([offset], src_seq, self.spec_base, device=False)
        self.dft.prepare_branch_seqs([offset], src_seq, self.spec_base - 1, device=False)

        handle, next_root = fused.launch(
            self.dft, self.tgt,
            root=self.chain_root, spec_base=self.spec_base,
            offset=offset, depth=depth, topk=self.topk, src_seq=src_seq,
            samp=fused.draft_samp(self.sampling),
            seed=self._next_fused_seed(),
        )
        br = drafting.DraftBranch(active=True)
        br.tokens = None  # pending until the eager fetch lands
        self.stats.n_drafted += depth
        run = AsyncRun(
            handle=handle,
            batch=Batch(),
            branches=[br],
            base=self.spec_base,
            prefix_base=self.chain_base,
            assumed_prefix=self.chain_tokens.view(),
            max_decide=self.spec_base + depth,
            dft_base=self.spec_base,
            seq_offset=offset,
            speculative=True,
            dft_root_redecoded=True,
            n_drafted=depth,
            fused=True,
        )
        self.runs.append(run)
        self.metrics.n_runs += 1
        self.metrics.n_dispatched_tokens += depth
        self.chain_tokens.extend_run(run, depth)
        self.chain_root = next_root
        self.chain_root_dft_logits = None
        self.chain_prev_offset = offset
        self.spec_base += depth
        return True

    # -- cancellation -------------------------------------------------------

    def check_for_cancel(self):
        """Mark in-flight runs whose assumptions diverged
        (ref: check_for_cancel :1277-1359)."""
        cancel_hook = getattr(self.tgt, "cancel_run", None)
        for run in self.runs:
            if run.canceled or run.corrected:
                # corrected runs carry no assumptions — their context IS
                # the frontier the device resolved (spec/corrected.py)
                continue
            if run.max_decide < self.n_committed:
                run.canceled = True
            else:
                # compare only committed positions whose assumed values
                # have RESOLVED: a committed bonus token can land at the
                # first position of a still-in-flight chained run's
                # segment, and materializing it here would block on that
                # run's fetch (stalling every fully-accepted verify).
                # Unresolved positions defer — each retire re-checks, and
                # verification never commits unvetted tokens.
                ap = run.assumed_prefix
                n = min(len(ap), max(0, self.n_committed - run.prefix_base))
                get = ap.maybe if isinstance(ap, fused.ChainView) else ap.__getitem__
                for i in range(n):
                    v = get(i)
                    if v is None:
                        break  # still in flight: defer the decision
                    if self._token_at(run.prefix_base + i) != v:
                        run.canceled = True
                        break
            if run.canceled and cancel_hook is not None:
                # propagate backwards through the pipeline so stages that
                # have not reached this microbatch skip its compute
                # (ref: llama_cancel_run back-ring, llama.cpp:9981-9993)
                cancel_hook(run.handle)

    def _discard(self, run: AsyncRun):
        self.metrics.n_canceled_runs += 1
        self.metrics.n_dead_tokens += len(run.batch) or run.n_drafted
        if run.speculative:
            # free the dead tree's cells NOW (async seq_rm dispatches):
            # under a tight pool, canceled runs holding cells would starve
            # the launches meant to replace them (shared prefix cells keep
            # their other runs' bits — seq_rm only clears this run's)
            self._discard_cells(run)
            self.free_offsets.append(run.seq_offset)
            if self.chain_prev_offset == run.seq_offset:
                self.chain_prev_offset = None

    # -- verification -------------------------------------------------------

    def _verify(self, run: AsyncRun, logits: np.ndarray, n_predict: int, stream=None) -> bool:
        """Consume a finished run. Returns True if generation should stop."""
        sp = self.sp
        v0 = self.n_committed  # next undecided position

        if not run.speculative:
            if run.max_decide != v0:
                self._discard(run)  # stale (cancel check normally catches this)
                return False
            if self._n_probs:
                self.probs.append(
                    top_probs(self.sampler, logits[-1], self._n_probs))
            t = sample(self.sampler, logits[-1])
            self.sampler.accept(t)
            self._accept_token(t, stream)
            self.n_rejected = 0
            stop = self._stopped(n_predict)
            self._after_verify([t], 0, run, v0, stop=stop)
            return stop

        # fast-forward branches through already-decided positions; count the
        # comparisons as acceptance evidence for the depth-adaptation EMA
        # (a divergent draft's runs mostly die HERE, not in the verify loop)
        alive = [s for s in range(sp.n_parallel) if run.branches[s].active]
        n_ff_judged = n_ff_matched = 0
        for i in range(v0 - run.base):
            gt = self._token_at(run.base + i)
            if any(i < len(run.branches[s].tokens) for s in alive):
                n_ff_judged += 1
            alive = [
                s for s in alive if i < len(run.branches[s].tokens) and run.branches[s].tokens[i] == gt
            ]
            if alive:
                n_ff_matched += 1
        j = v0 - run.base - 1  # tree index whose logits decide v0
        if not alive or j < 0 or j >= len(run.branches[alive[0]].i_batch_tgt):
            self._update_accept_ema(n_ff_matched, n_ff_judged)
            self._discard(run)
            return False
        # the fast-forwarded positions were this run's own drafted tokens,
        # decided (and matched) by earlier runs in the chain — they count as
        # accepted drafts
        self.stats.n_accept += v0 - run.base

        new_tokens: list[int] = []
        m = 0
        n_judged = 0  # sampled positions where a drafted token existed
        s_keep = alive[0]
        while True:
            idx = run.branches[alive[0]].i_batch_tgt[j]
            if self._n_probs:
                self.probs.append(
                    top_probs(self.sampler, logits[idx], self._n_probs))
            t = sample(self.sampler, logits[idx])
            self.sampler.accept(t)
            new_tokens.append(t)
            self._accept_token(t, stream)
            j += 1
            if any(j < len(run.branches[s].tokens) for s in alive):
                n_judged += 1
            matches = [
                s for s in alive if j < len(run.branches[s].tokens) and run.branches[s].tokens[j] == t
            ]
            if matches:
                alive = matches
                s_keep = matches[0]
                m += 1
                self.stats.n_accept += 1
            if self._stopped(n_predict):
                # drafts beyond the stop point were never judged — count
                # them as unverified tail, not as rejections
                if matches:
                    self.stats.n_drafted_unverified += max(
                        len(run.branches[s].tokens) for s in alive
                    ) - j - 1
                break
            if not matches:
                break
            if j >= len(run.branches[s_keep].i_batch_tgt):
                break  # ran out of drafted logits

        self.n_rejected = 0
        # fast-forwarded positions were judged too (they matched earlier
        # runs' committed tokens — acceptance evidence either way)
        self._update_accept_ema(m + n_ff_matched, n_judged + n_ff_judged)
        stop = self._stopped(n_predict)
        self._after_verify(new_tokens, m, run, v0, s_keep=s_keep, stop=stop)
        return stop

    def _verify_corrected(self, run: AsyncRun, packs, n_predict: int, stream) -> bool:
        """Consume a finished device-corrected run of R rounds: the device
        already decided each round (m accepted drafts + the bonus target
        token); the host commits them in order, reconciles its cell
        mirrors with the device truth per round, and keeps the
        sampler/metrics bookkeeping authoritative for everything
        downstream (EOS, n_predict, streaming, stats). Rounds after the
        host stop point are tail waste — their cells are reconciled (the
        device committed them; finish_generation's trim frees the
        overshoot) but their drafts count as unverified."""
        depth = run.corr_depth
        dcells, tcells = run.corr_cells  # [R, depth], [R, depth+1]
        stopped = self._stopped(n_predict)
        for r, (m, toks, rows) in enumerate(packs):
            if (not stopped and self.sampling.temp <= 0 and toks
                    and int(rows[0].ids[0]) != int(toks[0])):
                raise RuntimeError(
                    "device verification disagrees with the sparse logits head"
                )
            base = self._corr_host_base  # this round's true root position
            corrected.reclaim(self.dft, dcells[r], min(m + 1, depth),
                              base, self.seq_base)
            corrected.reclaim(self.tgt, tcells[r], m + 1, base, self.seq_base)
            self._corr_host_base = base + m + 1
            self.seq0_frontier = max(self.seq0_frontier, base + m + 1)
            if stopped:
                self.stats.n_drafted_unverified += depth
                continue
            self.stats.n_accept += m
            # per-token acceptance evidence: m matches (+ the mismatch)
            self._update_accept_ema(m, m + (1 if m < depth else 0))
            for i, t in enumerate(toks):
                if self._n_probs:
                    # row i is the target distribution deciding token i
                    self.probs.append(
                        top_probs(self.sampler, rows[i], self._n_probs))
                self.sampler.accept(int(t))
                self._accept_token(int(t), stream)
                if self._stopped(n_predict):
                    stopped = True
                    break
        self.n_rejected = 0
        return self._stopped(n_predict)

    def _accept_token(self, t: int, stream):
        now = time.perf_counter()
        if not self.generated:
            self.metrics.ttft_s = now - self._t_gen0  # prefill-inclusive
            self.metrics.ttft_decode_s = now - self._t_start
        else:
            self.metrics.inter_token_s.append(now - self._t_last)
        self._t_last = now
        self.generated.append(t)
        self.stats.n_predict += 1
        if stream:
            stream(t)

    def _stopped(self, n_predict: int) -> bool:
        if len(self.generated) >= n_predict:
            return True
        return (not self._ignore_eos) and bool(self.generated) and self.generated[-1] == self.eos_id

    def _after_verify(self, new_tokens, m, run: AsyncRun, v0: int, s_keep: int = 0, stop=False):
        """KV consolidation + chain maintenance
        (ref: speculative.cpp:585-634 — redesigned: the chain persists
        across verifications while the accepted tokens match it, so the
        safety run + chain restart only happen on divergence)."""
        if self.use_corrected:
            # only the prefill/safety non-spec run reaches here in
            # corrected mode (spec runs retire via _verify_corrected);
            # (re)seed the corrected chain from the newest committed token
            if stop:
                return
            self._corr_root = self.generated[-1]
            self._corr_base = self.n_committed - 1
            self._corr_host_base = self.n_committed - 1
            return
        if run.speculative:
            # consolidate the winning path to seq 0, including fast-forward
            # positions not yet covered there (chained runs own those cells)
            lo = max(run.base, self.seq0_frontier)
            hi = v0 + m
            dft_lo = run.base - 1 if run.dft_root_redecoded else lo
            branch_seqs = [s + run.seq_offset for s in range(self.sp.n_parallel)]
            win = s_keep + run.seq_offset
            self.tgt.consolidate(win, branch_seqs, lo, max(hi, lo), dst=self.seq_base)
            self.dft.consolidate(win, branch_seqs, dft_lo, max(hi, dft_lo), dst=self.seq_base)
            if hi > lo:
                self.seq0_frontier = max(self.seq0_frontier, hi)
            self.free_offsets.append(run.seq_offset)
            if self.chain_prev_offset == run.seq_offset:
                self.chain_prev_offset = None
        self.check_for_cancel()

        if stop:
            return

        # consume the committed prefix of the chain; intact = every newly
        # committed token matched the assumed continuation. A fused chain
        # token still in flight DEFERS the decision: in-flight runs carry
        # lazily-checked assumptions (check_for_cancel), verification never
        # commits unvetted tokens, and the reseed happens at the retire
        # that resolves the value (or via the dead-pipeline reseed).
        intact = True
        while self.chain_tokens and self.chain_base < self.n_committed:
            head = self.chain_tokens.head_if_resolved()
            if head is None:
                return  # decision deferred
            if head != self._token_at(self.chain_base):
                intact = False
                break
            self.chain_tokens.pop_front()
            self.chain_base += 1
        if self.n_committed > self.spec_base:
            intact = False  # generation moved past everything drafted
        if intact and self.chain_base < self.n_committed:
            intact = False

        if intact and (self.chain_tokens or self.chain_root is not None):
            return  # pipeline stays full; in-flight chained runs remain valid

        self._reseed_frontier()

    def _reseed_frontier(self):
        """Divergence (or no chain yet): reset the speculation frontier.
        The safety run guarantees forward progress and a seq-0 cell for the
        bonus token."""
        bonus = self.generated[-1]
        bonus_pos = self.n_committed - 1
        if self.seq0_frontier < self.n_committed:
            self._launch_nonspec([bonus], bonus_pos)
        else:
            # bonus cell already on seq 0 but we still need fresh logits to
            # decide the next position if no surviving run covers it
            if not any(
                (not r.canceled) and r.max_decide >= self.n_committed for r in self.runs
            ):
                self._launch_nonspec([bonus], bonus_pos)
        # the next draft tree re-decodes the root on its branch seqs (no
        # synchronous draft safety decode — saves a host round trip)
        self.chain_root_dft_logits = None
        self.chain_root = bonus
        self.chain_prev_offset = None
        self.chain_tokens.clear()
        self.chain_base = self.n_committed
        self.spec_base = self.n_committed

    def _discard_cells(self, run: AsyncRun):
        for s in range(self.sp.n_parallel):
            self.tgt.seq_rm(s + run.seq_offset, 0, -1)
            self.dft.seq_rm(s + run.seq_offset, 0, -1)

    # -- main loop ----------------------------------------------------------

    def generate(
        self,
        prompt_ids: list[int],
        n_predict: int,
        *,
        ignore_eos: bool = False,
        stream=None,
    ) -> list[int]:
        """ref: main loop speculative.cpp:316-679."""
        self.start_generation(prompt_ids, n_predict, ignore_eos=ignore_eos, stream=stream)
        while self.runs:
            self.tick(block=True)
            if self._stopped_flag:
                break
        return self.finish_generation()

    # -- cooperative interface (multi-stream engines drive these directly) --

    def start_generation(self, prompt_ids, n_predict, *, ignore_eos=False,
                         stream=None, n_probs=0):
        """Prefill + state reset; the decode loop is driven by tick().

        n_probs > 0 records the top-n (token_id, prob) of the target
        distribution per committed token into `self.probs` — on the
        host-verified paths from the sampled row, on the device-corrected
        path from the sparse logits head that shipped with each run
        (server n_probs parity, ref: server.cpp:722,1106-1123)."""
        self.prompt = list(prompt_ids)
        self._ignore_eos = ignore_eos
        self._stopped_flag = False
        self._n_predict = n_predict
        self._stream_cb = stream
        self._n_probs = n_probs
        self.probs: list = []
        for t in prompt_ids:
            self.sampler.accept(t, apply_grammar=False)

        t_enc0 = time.perf_counter()
        self._t_gen0 = t_enc0  # TTFT window opens at prefill start
        # prefill: target async (the first non-spec run), draft sync.
        # The draft logits are discarded (cells only) — ship the sparse
        # top-k pack instead of the full [bucket, n_vocab] f32 matrix
        # (65 MB at 512 tokens x 32k vocab over a ~44 MB/s tunnel)
        self._launch_nonspec(list(prompt_ids), 0)
        b = Batch()
        for i, t in enumerate(prompt_ids):
            b.add(t, i, self.seq_base, want_logits=(i == len(prompt_ids) - 1))
        self.dft.decode(b, self.topk)  # draft prefill (cells only)
        self.metrics.t_encode_s = time.perf_counter() - t_enc0
        self.metrics.n_encoded = len(prompt_ids)
        self.chain_root = None  # no token to chain from yet
        self.chain_root_dft_logits = None
        self.chain_base = self.n_committed
        self.spec_base = self.n_committed
        self._corr_root = None  # corrected chain seeds at prefill retire
        self._corr_base = None
        self._corr_host_base = 0
        self._t_start = time.perf_counter()
        self._t_last = self._t_start
        self._t_dec0 = time.perf_counter()

    @property
    def done(self) -> bool:
        return self._stopped_flag or not self.runs

    def tick(self, block: bool = False) -> bool:
        """One scheduling step: pump speculation, retire the oldest run if
        ready (or unconditionally when `block`). Returns True if progress
        was made; cooperative engines interleave ticks across streams."""
        if self._stopped_flag or not self.runs:
            return False
        # speculate ahead while the pipeline is busy (and keep a minimum
        # queue depth even when it isn't)
        launched = self._speculation_pump()
        if not block and not self._oldest_ready():
            return launched
        # retire the oldest run (blocks if still in flight — the head's
        # hot wait at llama_finish_async_decode, ref :389)
        if self._retire_oldest(self._n_predict, self._stream_cb):
            self._stopped_flag = True
        if not self._stopped_flag and not self.runs:
            # nothing in flight and not done (e.g. the pump is blocked at
            # the generation limit): guarantee progress — corrected mode
            # launches from its frontier scalars, the host-verified modes
            # reseed with a safety run
            if self.use_corrected and self._corr_root is not None:
                if not self._corrected_pump():
                    # with runs empty the pump can only fail on cell
                    # exhaustion (_launch_corrected swallows CacheFull to
                    # report backpressure); an empty pipeline that cannot
                    # relaunch would read as done and silently truncate
                    # the generation — surface it like the host-verified
                    # path's _launch_nonspec does
                    raise CacheFull(
                        "corrected chain stalled: KV cell pool exhausted "
                        "with no runs in flight (shared-pool backpressure)"
                    )
            else:
                self._reseed_frontier()
        return True

    def finish_generation(self) -> list[int]:
        self.metrics.t_decode_s = time.perf_counter() - self._t_dec0
        self.metrics.n_decoded = len(self.generated)
        # drain any remaining runs: their drafts never reached verification
        # (tail waste) — drop the device buffers without a host transfer
        while self.runs:
            r = self.runs.popleft()
            self.stats.n_drafted_unverified += r.n_drafted
            self.metrics.n_dead_tokens += len(r.batch) or r.n_drafted
            if r.corrected:
                # the device committed this run's rounds; reconcile the
                # mirrors with its truth (eager fetch is already in
                # flight), then the tail trim below frees the overshoot
                dc, tc = r.corr_cells
                for rr, (m, _toks, _rows) in enumerate(r.handle.fetch()):
                    corrected.reclaim(self.dft, dc[rr],
                                      min(m + 1, r.corr_depth),
                                      self._corr_host_base, self.seq_base)
                    corrected.reclaim(self.tgt, tc[rr], m + 1,
                                      self._corr_host_base, self.seq_base)
                    self._corr_host_base += m + 1
            elif r.speculative:
                self._discard_cells(r)
                self.free_offsets.append(r.seq_offset)
        if self.use_corrected:
            # drop device-committed tokens past the host stop point (the
            # device does not know about EOS/n_predict) — per-seq, so
            # co-resident streams' cells are untouched
            final = self.n_committed
            self.tgt.seq_rm(self.seq_base, final, -1)
            self.dft.seq_rm(self.seq_base, final, -1)
        # free this stream's committed cells (multi-stream reuse)
        return list(self.generated)

    def _retire_oldest(self, n_predict: int, stream) -> bool:
        """Finish (blocking) the oldest in-flight run. Returns stop flag."""
        self.check_for_cancel()
        run = self.runs.popleft()
        if run.canceled:
            # drop without fetching: no host transfer for dead work (the
            # device compute itself is unabortable; see dead_work_frac)
            self._discard(run)
            if not any(not r.canceled for r in self.runs):
                # whole pipeline died (deferred divergence): reseed so
                # generation keeps making progress
                self._reseed_frontier()
            return False
        if run.corrected:
            packs = run.handle.fetch()
            self.stats.n_rounds += run.corr_rounds
            return self._verify_corrected(run, packs, n_predict, stream)
        if run.fused:
            logits, _ = run.handle.fetch()
            fused.run_tokens(run)  # fill branches from the cached fetch
        else:
            logits = run.handle.fetch()
        self.stats.n_rounds += 1
        return self._verify(run, logits, n_predict, stream)

    def _corrected_pump(self) -> bool:
        """Keep the corrected-chain pipeline full: launch up to max_inflight
        device-corrected runs. No survival gating — chained runs launch
        from the true frontier, so the only launch limits are the cell
        pool, the in-flight cap, and the n_predict tail-waste bound
        (device_loop.py's over-dispatch guard)."""
        sp = self.sp
        launched = False
        limit = getattr(self, "_n_predict", 1 << 30)
        while (
            self._corr_root is not None
            and not self._stopped_flag
            and len(self.runs) < sp.max_inflight
        ):
            bound = sum(
                r.n_drafted + r.corr_rounds for r in self.runs if r.corrected
            )
            if self.runs and len(self.generated) + bound >= limit:
                break  # in-flight commits can already cover the budget
            if not self._launch_corrected():
                break
            launched = True
        return launched

    def _speculation_pump(self) -> bool:
        """Launch chained speculative runs while waiting
        (ref: run_speculation_loop :765-844)."""
        if self.use_corrected:
            return self._corrected_pump()
        sp = self.sp
        launched_any = False
        it = 0
        # never draft past the generation limit: positions beyond
        # prompt + n_predict can't commit, so such runs are pure tail waste
        limit = len(self.prompt) + getattr(self, "_n_predict", 1 << 30)
        while (
            (not self._oldest_ready() or len(self.runs) < sp.min_inflight)
            and self.free_offsets
            and self.chain_root is not None
            and not (self.chain_tokens and self.chain_prev_offset is None)
            and self.spec_base < limit
            and sp.p_accept + sp.p_adjust(it, self.n_rejected) < 1.0
            # chain-survival gate: a chained run only commits if every token
            # assumed beyond the frontier verifies; don't queue device work
            # whose expected survival is below p_chain (at low acceptance a
            # deep assumed prefix makes downstream runs near-certain waste).
            # NEVER cut below min_inflight: an empty pipeline serializes the
            # host fetch RTT (~30 ms on this tunnel) into every verify, which
            # costs far more than the speculative device time it saves
            and (
                len(self.runs) < sp.min_inflight
                or self.accept_ema ** max(self.spec_base - self.n_committed, 0)
                >= sp.p_chain
            )
        ):
            if not self._launch_spec(sp.p_adjust(it, self.n_rejected)):
                break
            launched_any = True
            it += 1
        return launched_any
