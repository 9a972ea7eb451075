"""Batched device-resident speculation: S concurrent streams, R full
speculative rounds each, in ONE XLA program.

`spec/multi.py` multiplexes async controllers over shared contexts — the
right shape when requests hot-join/leave and need the full host sampler
chain. But every stream's verification round-trips to the host there, and
each draft/verify step feeds the MXU one row at a time. On a single chip
the serving-throughput endgame is to batch the streams INSIDE the
device-resident loop (spec/device_loop.py):

    per round (lax.scan), for all S streams AT ONCE:
      1. draft-chain `depth` tokens per stream — each chain step is one
         [S]-row decode (S rows through every weight tile instead of 1:
         the weight-streaming cost is shared S ways);
      2. one target pass over all S*(depth+1) rows;
      3. verify each stream on device (greedy match or full-vocab
         Gumbel-max target sampling), commit per-stream prefixes + bonus,
         roll back each stream's rejected cells (vectorized per-sequence
         rm_tail over the cell pool);
      4. continue every stream from its own bonus token.

Decode cost per round is ~max(weight-stream time, S * flops time) + the
per-stream KV attention — at 7B shapes the weight stream dominates until
S is large, so aggregate tokens/s scales nearly linearly with S. Streams
that finish early are masked inactive at the next dispatch boundary
(their rows become padding; the device state freezes).

The reference keeps speculation and continuous batching in separate
drivers (examples/speculative vs examples/parallel — see
examples/parallel/parallel.cpp:190-260 for its scheduler); this engine is
the TPU-native composition of both, one dispatch per S*R speculative
rounds. Fixed stream-set semantics: one `generate_many` call serves one
batch of requests; `spec/multi.py` remains the hot-join scheduler.
"""

from __future__ import annotations

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime import kv_cache as kv
from ..runtime.context import Batch, CacheFull, InferenceContext, _device_draft_sample
from .device_loop import supported
from .params import SpecParams, entropy_seed
from .sync_spec import SpecStats


def _rm_stream_tails(cache: kv.KVCache, bases: jax.Array, n_streams: int,
                     seq_base: int = 0) -> kv.KVCache:
    """Vectorized per-stream tail rollback: free every cell that belongs to
    stream s (sequence slot seq_base+s) at pos >= bases[s], for all s at
    once. Loop-written cells are single-membership (each belongs to exactly
    its stream), so clearing the whole seq row of a hit cell is exact;
    committed prompt cells sit at pos < bases[s] and are never hit.
    (Per-seq counterpart of kv.rm_tail — ref: llama_kv_cache_seq_rm per
    seq, llama.cpp:9245-9268.)"""
    hit = jnp.zeros(cache.pos.shape, bool)
    for s in range(n_streams):  # static unroll: S small, one mask op each
        hit |= kv._member(cache.seq, jnp.int32(seq_base + s)) & (cache.pos >= bases[s])
    new_seq = jnp.where(hit[:, None], jnp.uint32(0), cache.seq)
    new_pos = jnp.where(hit, -1, cache.pos)
    return dataclasses.replace(cache, pos=new_pos, seq=new_seq)


@functools.lru_cache(maxsize=None)
def _shared_batched_loop(fwd_d, cfg_d, fwd_t, cfg_t, depth, rounds, n_streams,
                         dsamp=None, tsample=False, seq_base=0):
    """S-stream R-round speculative loop program (device_loop's
    _shared_device_loop with a stream axis). Stream s uses sequence slot
    seq_base+s (seq_base>0 lets the loop share contexts with other engines
    whose streams own the lower slots — the serving scheduler's windowed
    path, serving/batching.py).

    active [S] bool: padding mask for streams retired at dispatch time —
    their rows decode as invalid (no KV writes), their m is forced 0 and
    their (root, base) state is frozen.
    """
    S = n_streams

    @functools.partial(jax.jit, donate_argnums=(1, 3))
    def loop(dparams, dcache, tparams, tcache, roots, bases, active,
             dcells, tcells, *key):
        # roots/bases i32 [S]; active bool [S];
        # dcells [R, S, depth]; tcells [R, S, depth+1]
        seqs = seq_base + jnp.arange(S, dtype=jnp.int32)

        def round_body(carry, xs):
            dcache, tcache, roots, bases = carry
            dcell_row, tcell_row, r = xs  # [S, depth], [S, depth+1]

            # 1) draft chains: one [S]-row decode per chain step
            def draft_step(c, i):
                dcache, toks, poss = c
                logits, dcache = fwd_d(
                    dparams, cfg_d, dcache,
                    toks, poss, seqs, dcell_row[:, i], active, None,
                )
                if dsamp is None:
                    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                else:
                    ks = jax.random.fold_in(key[0], r * (depth + 1) + i)
                    nxt = jax.vmap(
                        lambda row_l, s: _device_draft_sample(
                            row_l, dsamp, jax.random.fold_in(ks, s)
                        )
                    )(logits, seqs)
                return (dcache, nxt, poss + 1), nxt

            (dcache, _, _), toks = jax.lax.scan(
                draft_step, (dcache, roots, bases), jnp.arange(depth)
            )  # toks [depth, S]
            toks = toks.T  # [S, depth]

            # 2) one target pass over [root_s ++ drafted_s] for all s,
            # stream-major rows
            ttoks = jnp.concatenate([roots[:, None], toks], axis=1).reshape(-1)
            tpos = (bases[:, None] + jnp.arange(depth + 1, dtype=jnp.int32)).reshape(-1)
            tseqs = jnp.repeat(seqs, depth + 1)
            tvalid = jnp.repeat(active, depth + 1)
            tlogits, tcache = fwd_t(
                tparams, cfg_t, tcache, ttoks, tpos, tseqs,
                tcell_row.reshape(-1), tvalid, None,
            )

            # 3) per-stream on-device verification (see device_loop.py:
            # greedy argmax match, or full-vocab Gumbel-max target sampling
            # so each committed token is a true target sample)
            if tsample:
                gk = jax.random.fold_in(key[0], rounds * (depth + 1) + r)
                g = jax.vmap(
                    lambda row_l, i: _device_draft_sample(
                        row_l, dsamp, jax.random.fold_in(gk, i)
                    )
                )(tlogits, jnp.arange(S * (depth + 1)))
            else:
                g = jnp.argmax(tlogits, axis=-1).astype(jnp.int32)
            g = g.reshape(S, depth + 1)
            matches = toks == g[:, :depth]
            m = jnp.sum(jnp.cumprod(matches.astype(jnp.int32), axis=1), axis=1)
            m = jnp.where(active, m, 0).astype(jnp.int32)
            bonus = jnp.where(active, g[jnp.arange(S), m], roots)
            new_bases = bases + jnp.where(active, m + 1, 0)

            # 4) roll back every stream's rejected cells (both caches)
            dcache = _rm_stream_tails(dcache, new_bases, S, seq_base)
            tcache = _rm_stream_tails(tcache, new_bases, S, seq_base)

            # pack row [S, depth+2]: per stream, m accepted tokens ++ bonus
            # at slot m ++ zeros, then m
            idx = jnp.arange(depth + 1)[None, :]
            vals = jnp.where(idx < m[:, None],
                             jnp.concatenate([toks, toks[:, -1:]], axis=1), 0)
            vals = jnp.where(idx == m[:, None], bonus[:, None], vals)
            row = jnp.concatenate([vals, m[:, None]], axis=1)
            return (dcache, tcache, bonus, new_bases), row

        (dcache, tcache, roots, bases), pack = jax.lax.scan(
            round_body, (dcache, tcache, roots, bases),
            (dcells, tcells, jnp.arange(rounds)),
        )
        return pack, roots, bases, dcache, tcache

    return loop


@dataclasses.dataclass
class _Stream:
    prompt_len: int
    n_predict: int
    tokens: list = dataclasses.field(default_factory=list)
    host_base: int = 0  # true committed frontier (host view)
    done: bool = False
    stats: SpecStats = dataclasses.field(default_factory=SpecStats)


class BatchedDeviceLoop:
    """S-stream device-resident speculative serving engine.

    Same support envelope as DeviceLoopEngine (single-device contexts;
    greedy or a pure (temp, top_k, top_p, min_p) chain shared by all
    streams); greedy outputs are bit-identical to decoding each request
    alone. The program is compiled per (S, depth, rounds) triple — serve
    with a fixed stream count (pad the request list to S; extra slots
    finish instantly) the way batch buckets are padded elsewhere.
    """

    def __init__(
        self,
        ctx_tgt: InferenceContext,
        ctx_dft: InferenceContext,
        sampling,
        sp: SpecParams,
        *,
        n_streams: int,
        eos_id: int = 2,
        rounds: int = 4,
    ):
        if getattr(ctx_tgt, "mesh", object()) is not None or \
                getattr(ctx_dft, "mesh", object()) is not None:
            raise ValueError("BatchedDeviceLoop needs single-device contexts")
        if not supported(sampling):
            raise ValueError("sampler chain needs host verification; use spec.multi")
        if n_streams < 1 or n_streams > 32 * kv.SEQ_WORDS:
            raise ValueError(f"n_streams must be in [1, {32 * kv.SEQ_WORDS}]")
        self.tgt = ctx_tgt
        self.dft = ctx_dft
        self.sampling = sampling
        self.sp = sp
        self.S = n_streams
        self.eos_id = eos_id
        self.rounds = rounds
        self._seed = sampling.seed if sampling.seed >= 0 else None
        self._seed_base = entropy_seed(self._seed)

    def _loop_fn(self, depth: int):
        from . import fused

        dsamp = fused.draft_samp(self.sampling)
        tsample = self.sampling.temp > 0
        return _shared_batched_loop(
            self.dft._forward, self.dft.cfg, self.tgt._forward, self.tgt.cfg,
            depth, self.rounds, self.S, dsamp, tsample,
        )

    def generate_many(self, prompts, n_predicts, *, ignore_eos=False):
        """Decode all S requests to completion; returns S token lists.
        prompts: S token lists; n_predicts: int or S ints."""
        S, R, depth = self.S, self.rounds, self.sp.n_draft
        if len(prompts) != S:
            raise ValueError(f"need exactly {S} prompts (pad the batch)")
        for s, p in enumerate(prompts):
            # an empty prompt would silently read the PREVIOUS stream's
            # last prefill row (ends = cumsum(lens)-1); fail fast the way
            # decode() does on an empty batch
            if len(p) == 0:
                raise ValueError(f"stream {s}: empty prompt")
        if isinstance(n_predicts, int):
            n_predicts = [n_predicts] * S
        loop = self._loop_fn(depth)

        t0 = time.perf_counter()
        # prefill ALL streams in one batch per model (each into its own
        # sequence slot): one draft dispatch (async, KV only) + one target
        # dispatch + one fetch, instead of S round-trips
        topk = min(128, self.tgt.cfg.n_vocab)
        bt, bd = Batch(), Batch()
        for s, prompt in enumerate(prompts):
            for i, t in enumerate(prompt):
                last = i == len(prompt) - 1
                bt.add(t, i, s, want_logits=last)
                bd.add(t, i, s, want_logits=last)
        dh = self.dft.decode_async(bd, topk=min(128, self.dft.cfg.n_vocab))
        rows = self.tgt.decode(bt, topk=topk)  # one row per batch TOKEN
        del dh
        ends = np.cumsum([len(p) for p in prompts]) - 1
        tlogs = [rows[e] for e in ends]  # each stream's last-token row
        streams: list[_Stream] = []
        roots = np.zeros(S, np.int32)
        bases = np.zeros(S, np.int32)
        for s, prompt in enumerate(prompts):
            if self.sampling.temp > 0:
                from ..sampling.samplers import SamplerState, sample

                # fold the stream index into the host root-sampling seed:
                # seeded runs with identical prompts must not all emit the
                # same first token (the device keys fold s; the host root
                # draw has to as well)
                sp_s = self.sampling
                if sp_s.seed >= 0:
                    sp_s = dataclasses.replace(sp_s, seed=sp_s.seed + 1000003 * s)
                hs = SamplerState(params=sp_s)
                root = int(sample(hs, tlogs[s]))
            else:
                root = int(tlogs[s].ids[0])
            st = _Stream(prompt_len=len(prompt), n_predict=n_predicts[s],
                         host_base=len(prompt))
            st.tokens.append(root)
            st.stats.n_predict = 1
            if n_predicts[s] <= 1 or (not ignore_eos and root == self.eos_id):
                st.done = True
            streams.append(st)
            roots[s], bases[s] = root, len(prompt)
        self.t_prefill = time.perf_counter() - t0

        # pin the hot bucket once for the whole batch (device_loop.py
        # rationale: a mid-decode bucket swap costs an executable switch)
        MAX_INFLIGHT = 2
        peak = max(
            st.prompt_len + st.n_predict for st in streams
        ) * S + MAX_INFLIGHT * R * S * (2 * depth + 1) + 1
        for ctx in (self.tgt, self.dft):
            pool = ctx.trash_cell + 1
            hot = 512
            while hot < min(peak, pool):
                hot *= 2
            if pool <= 512 or hot >= pool:
                hot = 0
            if ctx.cache.hot != hot:
                ctx.cache = dataclasses.replace(ctx.cache, hot=hot)

        roots_dev = jnp.asarray(roots)
        bases_dev = jnp.asarray(bases)
        key_i = 0
        t_dec0 = time.perf_counter()
        inflight = []  # (future, active [S], dcells, tcells)

        def dispatch() -> bool:
            nonlocal roots_dev, bases_dev, key_i
            active = np.array([not st.done for st in streams])
            if not active.any():
                return False
            # skip dispatch when in-flight packs' upper bound already covers
            # every live stream (tail-waste guard, see device_loop)
            bound = len(inflight) * R * (depth + 1)
            if inflight and all(
                st.done or len(st.tokens) + bound >= st.n_predict
                for st in streams
            ):
                return False
            try:
                dcells = self.dft.find_cells(R * S * depth).reshape(R, S, depth)
                tcells = self.tgt.find_cells(R * S * (depth + 1)).reshape(R, S, depth + 1)
            except CacheFull:
                return False
            # host-mirror hints: per stream, monotone positions past its
            # frontier (exact values reconciled per fetched round)
            for s, st in enumerate(streams):
                hint = st.host_base + len(inflight) * R * (depth + 1)
                dflat = dcells[:, s, :].reshape(-1)
                tflat = tcells[:, s, :].reshape(-1)
                self.dft.h_pos[dflat] = hint + np.arange(R * depth)
                self.dft.h_seq[dflat] = kv.host_only(s)
                self.tgt.h_pos[tflat] = hint + np.arange(R * (depth + 1))
                self.tgt.h_seq[tflat] = kv.host_only(s)
            extra = ()
            if self.sampling.temp > 0:
                extra = (jax.random.PRNGKey(self._seed_base * 9176 + key_i),)
                key_i += 1
            pack, roots2, bases2, self.dft.cache, self.tgt.cache = loop(
                self.dft.params, self.dft.cache, self.tgt.params, self.tgt.cache,
                roots_dev, bases_dev, jnp.asarray(active),
                dcells.astype(np.int32), tcells.astype(np.int32), *extra,
            )
            fut = self.tgt._fetch_pool.submit(lambda p=pack: np.asarray(p))
            inflight.append((fut, active, dcells, tcells))
            roots_dev, bases_dev = roots2, bases2
            return True

        while any(not st.done for st in streams) or inflight:
            while len(inflight) < MAX_INFLIGHT and dispatch():
                pass
            if not inflight:
                if any(not st.done for st in streams):
                    raise RuntimeError(
                        "batched device loop could not dispatch (KV cache too small)"
                    )
                break
            fut, active, dcells, tcells = inflight.pop(0)
            host_pack = fut.result()  # [R, S, depth+2]
            for s, st in enumerate(streams):
                if not active[s]:
                    # inactive rows were padding: cells never claimed
                    self._reclaim(self.dft, dcells[:, s, :].reshape(-1), 0, 0)
                    self._reclaim(self.tgt, tcells[:, s, :].reshape(-1), 0, 0)
                    continue
                st.stats.n_rounds += R
                for r in range(R):
                    m = int(host_pack[r, s, depth + 1])
                    st.stats.n_drafted += depth
                    # reconcile mirrors with device truth for EVERY active
                    # stream — the device committed these rounds whether or
                    # not the host has already retired the stream
                    self._reclaim(self.dft, dcells[r, s], min(m + 1, depth),
                                  st.host_base, s)
                    self._reclaim(self.tgt, tcells[r, s], m + 1, st.host_base, s)
                    st.host_base += m + 1
                    if st.done:
                        # rounds after the stream retired are tail waste:
                        # counting their m in n_accept would double-dip
                        # accept_rate_decided (device_loop's convention)
                        st.stats.n_drafted_unverified += depth
                        continue
                    st.stats.n_accept += m
                    for t in host_pack[r, s, : m + 1].tolist():
                        st.tokens.append(int(t))
                        if len(st.tokens) >= st.n_predict or (
                            not ignore_eos and t == self.eos_id
                        ):
                            st.done = True
                            break

        # trim device + host state back to each stream's final frontier
        for s, st in enumerate(streams):
            st.tokens = st.tokens[: st.n_predict]
            st.stats.n_predict = len(st.tokens)
            final = st.prompt_len + len(st.tokens)
            self.tgt.seq_rm(s, final, -1)
            self.dft.seq_rm(s, final, -1)
        self.t_decode = time.perf_counter() - t_dec0
        self.streams = streams
        return [st.tokens for st in streams]

    def _reclaim(self, ctx: InferenceContext, cells, keep: int, base: int,
                 seq: int = 0):
        kv.reclaim_cells(ctx, cells, keep, base, seq)


@dataclasses.dataclass
class LaneHandle:
    """Serving-side handle for one DeviceLoopServer request."""

    prompt_ids: list
    n_predict: int
    on_token: object = None  # callable(tok) per committed token
    ignore_eos: bool = False
    tokens: list = dataclasses.field(default_factory=list)
    done: bool = False
    error: str | None = None
    cancel: bool = False  # cooperative early stop (server stop sequences)
    stats: SpecStats = dataclasses.field(default_factory=SpecStats)
    # internal lane binding
    _lane: int = -1
    _host_base: int = 0
    _retiring: bool = False  # done, waiting for in-flight packs to drain


class DeviceLoopServer:
    """Continuous-batching server over the S-lane batched device loop.

    BatchedDeviceLoop decodes one fixed batch to completion; serving needs
    requests to hot-join and leave. This wrapper keeps the same compiled
    (S, depth, rounds) program but drives it incrementally from a
    scheduler `step()`: a finished lane's sequence slot is reclaimed and
    reseeded with the next queued request WITHOUT stopping the other lanes
    — lanes retire/join by flipping the dispatch-time `active` mask, and
    the chained (roots, bases) device vectors get lane-wise updates (a
    masked `where`, no host round-trip). The TPU-native counterpart of the
    reference server's slot scheduler (ref: examples/server/server.cpp
    :377-463 slot reuse; examples/parallel/parallel.cpp:238-274 hot-join).

    Sampler envelope = device_loop.supported with ONE compiled chain for
    all lanes (greedy by default); the serving scheduler routes anything
    else to the host-verified MultiPipeInfer engine. Lanes own sequence
    slots [seq_base, seq_base + n_lanes), so both engines can share the
    same contexts with disjoint slot namespaces.
    """

    MAX_INFLIGHT = 2

    def __init__(
        self,
        ctx_tgt: InferenceContext,
        ctx_dft: InferenceContext,
        sampling,
        sp: SpecParams,
        *,
        n_lanes: int,
        seq_base: int = 0,
        eos_id: int = 2,
        rounds: int = 4,
    ):
        if getattr(ctx_tgt, "mesh", object()) is not None or \
                getattr(ctx_dft, "mesh", object()) is not None:
            raise ValueError("DeviceLoopServer needs single-device contexts")
        if not supported(sampling):
            raise ValueError("sampler chain needs host verification; use spec.multi")
        if n_lanes < 1 or seq_base + n_lanes > 32 * kv.SEQ_WORDS:
            raise ValueError(
                f"lanes [{seq_base}, {seq_base + n_lanes}) exceed "
                f"{32 * kv.SEQ_WORDS} sequence slots"
            )
        self.tgt = ctx_tgt
        self.dft = ctx_dft
        self.sampling = sampling
        self.sp = sp
        self.S = n_lanes
        self.seq_base = seq_base
        self.eos_id = eos_id
        self.rounds = rounds
        self._seed = sampling.seed if sampling.seed >= 0 else None
        self._seed_base = entropy_seed(self._seed)
        self._key_i = 0
        self.lanes: list[LaneHandle | None] = [None] * n_lanes
        self.queue: list[LaneHandle] = []
        self.inflight: list = []  # (future, active[S], dcells, tcells)
        # per-lane count of in-flight packs that carry the lane as active:
        # a lane may only be reseeded (or its seq trimmed) once quiescent
        self._lane_inflight = np.zeros(n_lanes, np.int64)
        self.roots_dev = jnp.zeros(n_lanes, jnp.int32)
        self.bases_dev = jnp.zeros(n_lanes, jnp.int32)
        self._loop = None

    # -- routing ------------------------------------------------------------

    def compatible(self, sampling) -> bool:
        """Can this request ride the compiled device chain? Greedy requests
        match a greedy server; stochastic requests must match the chain
        tuple exactly and be unseeded (per-request seeds are only exactly
        reproducible on the host path)."""
        if not supported(sampling):
            return False
        if self.sampling.temp <= 0:
            return sampling.temp <= 0
        if sampling.temp <= 0 or sampling.seed >= 0:
            return False
        from .fused import draft_samp

        return draft_samp(sampling) == draft_samp(self.sampling)

    # -- request lifecycle ---------------------------------------------------

    def submit(self, prompt_ids, n_predict, *, on_token=None,
               ignore_eos=False) -> LaneHandle:
        if not prompt_ids:
            raise ValueError("empty prompt")
        h = LaneHandle(prompt_ids=list(prompt_ids), n_predict=n_predict,
                       on_token=on_token, ignore_eos=ignore_eos)
        self.queue.append(h)
        return h

    @property
    def busy(self) -> bool:
        return bool(self.queue) or bool(self.inflight) or any(
            h is not None for h in self.lanes
        )

    # -- engine step ---------------------------------------------------------

    def step(self, block: bool = False) -> int:
        """One scheduler iteration: collect ready packs, retire quiescent
        lanes, admit queued requests, dispatch. Non-blocking by default
        (returns 0 when only waiting on an in-flight fetch); block=True
        waits for the oldest pack instead of spinning."""
        progress = 0
        for h in self.lanes:  # canceled lanes retire at the step boundary
            if h is not None and h.cancel:
                h._retiring = True
        for h in list(self.queue):
            if h.cancel:
                self.queue.remove(h)
                h.done = True
        progress += self._collect(block=block)
        self._retire_quiescent()
        if self.queue:
            progress += self._admit()
        while len(self.inflight) < self.MAX_INFLIGHT and self._dispatch():
            progress += 1
        return progress

    def run_until_idle(self):
        while self.busy:
            made = self.step(block=True)
            if made == 0 and not self.inflight and self.queue and all(
                h is None for h in self.lanes
            ):
                raise RuntimeError(
                    "device loop server could not admit (KV cache too small)"
                )

    # -- internals -----------------------------------------------------------

    def _loop_fn(self):
        if self._loop is None:
            from . import fused

            dsamp = fused.draft_samp(self.sampling)
            tsample = self.sampling.temp > 0
            self._loop = _shared_batched_loop(
                self.dft._forward, self.dft.cfg, self.tgt._forward,
                self.tgt.cfg, self.sp.n_draft, self.rounds, self.S,
                dsamp, tsample, self.seq_base,
            )
        return self._loop

    def _admit(self) -> int:
        """Seed queued requests into free quiescent lanes: one batched
        prefill per model for ALL admissions this step (the
        BatchedDeviceLoop prefill shape), then lane-wise (roots, bases)
        device updates."""
        free = [
            i for i, h in enumerate(self.lanes)
            if h is None and self._lane_inflight[i] == 0
        ]
        if not free:
            return 0
        take = []
        usable = min(self.tgt.n_cells, self.dft.n_cells) - 1
        # free cells minus running lanes' OUTSTANDING growth: the mirror
        # only shows cells occupied so far, but every running lane will
        # still claim its remaining n_predict commits plus a dispatch of
        # scratch — admitting against the instantaneous count overcommits
        # the pool and livelocks _dispatch (CacheFull forever, no lane can
        # retire to free cells)
        scratch = self.rounds * (2 * self.sp.n_draft + 1)
        outstanding = sum(
            max(0, h.n_predict - len(h.tokens)) + scratch
            for h in self.lanes
            if h is not None
        )
        free_cells = int((self.tgt.h_pos < 0).sum()) - 1 - outstanding
        for h in list(self.queue):
            if len(take) >= len(free):
                break
            need = len(h.prompt_ids) + h.n_predict + \
                self.rounds * (2 * self.sp.n_draft + 1)
            if need > usable:
                self.queue.remove(h)
                h.error = (
                    f"prompt + n_predict needs {need} KV cells, cache has {usable}"
                )
                h.done = True
                continue
            if need > free_cells:
                break  # wait for running lanes to release cells
            free_cells -= need
            self.queue.remove(h)
            take.append(h)
        if not take:
            return 0

        topk = min(128, self.tgt.cfg.n_vocab)
        bt, bd = Batch(), Batch()
        for h, lane in zip(take, free):
            seq = self.seq_base + lane
            self.tgt.seq_rm(seq, 0, -1)
            self.dft.seq_rm(seq, 0, -1)
            for i, t in enumerate(h.prompt_ids):
                last = i == len(h.prompt_ids) - 1
                bt.add(t, i, seq, want_logits=last)
                bd.add(t, i, seq, want_logits=last)
        try:
            dh = self.dft.decode_async(bd, topk=min(128, self.dft.cfg.n_vocab))
            rows = self.tgt.decode(bt, topk=topk)
            del dh
        except CacheFull:
            # admission raced another engine on the shared pool: requeue
            for h, lane in zip(take, free):
                self.tgt.seq_rm(self.seq_base + lane, 0, -1)
                self.dft.seq_rm(self.seq_base + lane, 0, -1)
            self.queue = take + self.queue
            return 0
        ends = np.cumsum([len(h.prompt_ids) for h in take]) - 1

        mask = np.zeros(self.S, bool)
        roots = np.zeros(self.S, np.int32)
        bases = np.zeros(self.S, np.int32)
        n_done_now = 0
        for j, (h, lane) in enumerate(zip(take, free)):
            row = rows[ends[j]]
            if self.sampling.temp > 0:
                from ..sampling.samplers import SamplerState, sample

                sp_s = self.sampling
                if sp_s.seed >= 0:
                    sp_s = dataclasses.replace(
                        sp_s, seed=sp_s.seed + 1000003 * lane)
                root = int(sample(SamplerState(params=sp_s), row))
            else:
                root = int(row.ids[0])
            h.tokens.append(root)
            h.stats.n_predict = 1
            if h.on_token:
                h.on_token(root)
            h._lane = lane
            h._host_base = len(h.prompt_ids)
            if h.n_predict <= 1 or (
                not h.ignore_eos and root == self.eos_id
            ):
                h._retiring = True
                n_done_now += 1
            self.lanes[lane] = h
            mask[lane], roots[lane], bases[lane] = True, root, len(h.prompt_ids)

        # lane-wise update of the chained device vectors (no fetch: a
        # masked where keeps the dispatch pipeline asynchronous)
        mask_d = jnp.asarray(mask)
        self.roots_dev = jnp.where(mask_d, jnp.asarray(roots), self.roots_dev)
        self.bases_dev = jnp.where(mask_d, jnp.asarray(bases), self.bases_dev)
        self._retire_quiescent()
        return len(take)

    def _dispatch(self) -> bool:
        live = [
            h is not None and not h._retiring and len(h.tokens) < h.n_predict
            for h in self.lanes
        ]
        if not any(live):
            return False
        R, depth, S = self.rounds, self.sp.n_draft, self.S
        bound = len(self.inflight) * R * (depth + 1)
        if self.inflight and all(
            (not lv) or len(h.tokens) + bound >= h.n_predict
            for lv, h in zip(live, self.lanes)
        ):
            return False
        try:
            dcells = self.dft.find_cells(R * S * depth).reshape(R, S, depth)
            tcells = self.tgt.find_cells(R * S * (depth + 1)).reshape(R, S, depth + 1)
        except CacheFull:
            return False
        active = np.array(live)
        for lane, h in enumerate(self.lanes):
            # mark EVERY allocated cell (inactive lanes' scratch included):
            # unmarked cells would be handed out again by the next
            # dispatch's find_cells while this one is still in flight, and
            # the inactive-row reclaim at collect would then free cells the
            # newer dispatch is actively using (mirror corruption)
            hint = (h._host_base if active[lane] else 0) \
                + len(self.inflight) * R * (depth + 1)
            # inactive scratch carries NO seq membership (seq=0 bits):
            # a lane retire's seq_rm must not free cells an in-flight
            # pack still owns
            seq_bits = kv.host_only(self.seq_base + lane) if active[lane] \
                else np.zeros_like(kv.host_only(0))
            dflat = dcells[:, lane, :].reshape(-1)
            tflat = tcells[:, lane, :].reshape(-1)
            self.dft.h_pos[dflat] = hint + np.arange(R * depth)
            self.dft.h_seq[dflat] = seq_bits
            self.tgt.h_pos[tflat] = hint + np.arange(R * (depth + 1))
            self.tgt.h_seq[tflat] = seq_bits
        extra = ()
        if self.sampling.temp > 0:
            extra = (jax.random.PRNGKey(
                self._seed_base * 9176 + self._key_i),)
            self._key_i += 1
        loop = self._loop_fn()
        pack, roots2, bases2, self.dft.cache, self.tgt.cache = loop(
            self.dft.params, self.dft.cache, self.tgt.params, self.tgt.cache,
            self.roots_dev, self.bases_dev, jnp.asarray(active),
            dcells.astype(np.int32), tcells.astype(np.int32), *extra,
        )
        fut = self.tgt._fetch_pool.submit(lambda p=pack: np.asarray(p))
        self.inflight.append((fut, active, dcells, tcells))
        self._lane_inflight[active] += 1
        self.roots_dev, self.bases_dev = roots2, bases2
        return True

    def _collect(self, block: bool = False) -> int:
        n_committed = 0
        R, depth = self.rounds, self.sp.n_draft
        while self.inflight and (block or self.inflight[0][0].done()):
            block = False  # only block for the oldest pack
            fut, active, dcells, tcells = self.inflight.pop(0)
            host_pack = fut.result()  # [R, S, depth+2]
            for lane in range(self.S):
                h = self.lanes[lane]
                if not active[lane]:
                    _reclaim_cells(self.dft, dcells[:, lane, :], 0, 0)
                    _reclaim_cells(self.tgt, tcells[:, lane, :], 0, 0)
                    continue
                self._lane_inflight[lane] -= 1
                seq = self.seq_base + lane
                h.stats.n_rounds += R
                for r in range(R):
                    m = int(host_pack[r, lane, depth + 1])
                    h.stats.n_drafted += depth
                    _reclaim_cells(self.dft, dcells[r, lane],
                                   min(m + 1, depth), h._host_base, seq)
                    _reclaim_cells(self.tgt, tcells[r, lane],
                                   m + 1, h._host_base, seq)
                    h._host_base += m + 1
                    if h._retiring:
                        h.stats.n_drafted_unverified += depth
                        continue
                    h.stats.n_accept += m
                    for t in host_pack[r, lane, : m + 1].tolist():
                        h.tokens.append(int(t))
                        n_committed += 1
                        if h.on_token:
                            h.on_token(int(t))
                        if len(h.tokens) >= h.n_predict or (
                            not h.ignore_eos and t == self.eos_id
                        ):
                            h._retiring = True
                            break
        return n_committed

    def abort_all(self, msg: str):
        """Fail every queued and in-flight request (engine-fault path):
        waiting callers see .error instead of hanging forever."""
        for h in self.queue + [h for h in self.lanes if h is not None]:
            h.error = msg
            h.done = True
        self.queue = []
        for lane in range(self.S):
            if self.lanes[lane] is not None:
                self.tgt.seq_rm(self.seq_base + lane, 0, -1)
                self.dft.seq_rm(self.seq_base + lane, 0, -1)
                self.lanes[lane] = None
        self.inflight = []
        self._lane_inflight[:] = 0

    def _retire_quiescent(self):
        """Free lanes whose stream finished AND whose in-flight packs have
        all been collected — only then is the seq-slot trim safe (an
        in-flight pack dispatched while the lane was live will still
        commit cells to its sequence)."""
        for lane, h in enumerate(self.lanes):
            if h is None or not h._retiring or self._lane_inflight[lane]:
                continue
            h.tokens = h.tokens[: h.n_predict]
            h.stats.n_predict = len(h.tokens)
            seq = self.seq_base + lane
            # full clear (not a frontier trim): the request is done, and
            # its cells go back to the pool shared with the host-verified
            # engine (BatchScheduler._finish does the same)
            self.tgt.seq_rm(seq, 0, -1)
            self.dft.seq_rm(seq, 0, -1)
            self.lanes[lane] = None
            h.done = True


_reclaim_cells = kv.reclaim_cells
