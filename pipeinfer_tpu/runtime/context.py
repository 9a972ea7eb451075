"""Inference context: jitted decode engine + host-side cell bookkeeping.

The counterpart of `llama_context` + `llama_decode_internal`
(ref: llama.cpp:1445-1520 context state, :5461-5848 decode engine), built
around XLA's constraints:

- the per-step forward is jitted once per (padded batch size) bucket;
  token/pos/seq/cell arrays are padded to the bucket and padding tokens
  write to a reserved trash cell;
- the KV cache is donated through the step so updates are in-place in HBM;
- cell allocation runs on a host numpy mirror of (pos, seq) — the same
  find-slot bookkeeping as the reference (llama.cpp:1593 find_slot) — while
  the device arrays remain the source of truth for attention masking;
- batches mirror `llama_batch` (token/pos/seq_id/logits flags,
  ref: llama.h batch struct + common.cpp:991-1011 helpers).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from . import kv_cache as kv


class CacheFull(RuntimeError):
    """No free KV cells for an allocation. Speculation treats this as a
    BACKPRESSURE signal (stop launching, recycle the run's cells) instead
    of a crash — the reference simply asserts on find_slot failure
    (llama.cpp:1593); here in-flight trees can transiently exhaust a small
    pool and must degrade gracefully."""


def _bucket(n: int) -> int:
    """Pad batch sizes to a SPARSE bucket set: {1, 8, 32, 128, 512, ...}.

    Every bucket is a separate XLA compilation; on a weight-streaming-bound
    decode step the matmul cost is nearly independent of the token dim, so
    padding 9→32 is ~free while halving the number of compiled variants
    (vs powers of two)."""
    if n <= 1:
        return 1
    if n <= 8:
        return 8
    b = 32
    while b < n:
        b *= 4
    return b


@dataclasses.dataclass
class AsyncHandle:
    """A dispatched decode: device work in flight, logits not yet on host.

    When constructed with an executor, the host fetch starts EAGERLY on a
    worker thread: on this machine's tunneled runtime a fetch costs ~30 ms
    RTT and `jax.Array.is_ready()` returns at remote enqueue (useless as a
    completion probe), so true readiness = "the bytes are on this host".
    The eager fetch overlaps that RTT with the controller's drafting work —
    the analogue of the reference head overlapping speculation with the
    tail's SYNC_LOGITS Bsend being in flight."""

    logits: jax.Array
    fetch: Callable[[], np.ndarray]
    cells: np.ndarray
    _future: object | None = None

    def start_fetch(self, executor) -> "AsyncHandle":
        fn = self.fetch
        self._future = executor.submit(fn)
        self.fetch = self._future.result
        return self

    def ready(self) -> bool:
        """Non-blocking completion check — the counterpart of the head's
        llama_mpi_iprobe(SYNC_LOGITS) (ref: llama.cpp:5457-5459)."""
        if self._future is not None:
            return self._future.done()
        try:
            return self.logits.is_ready()
        except AttributeError:  # non-jax fallback
            return True


@dataclasses.dataclass
class Batch:
    """Mirror of llama_batch (tokens to decode in one step). Each token may
    belong to several sequences (tree batches); the first is primary."""

    tokens: list[int] = dataclasses.field(default_factory=list)
    pos: list[int] = dataclasses.field(default_factory=list)
    seqs: list[list[int]] = dataclasses.field(default_factory=list)
    want_logits: list[bool] = dataclasses.field(default_factory=list)

    def add(self, token: int, pos: int, seq: int | list[int], want_logits: bool = True):
        """ref: llama_batch_add (common/common.cpp:991-1011)."""
        self.tokens.append(int(token))
        self.pos.append(int(pos))
        self.seqs.append([int(seq)] if isinstance(seq, int) else [int(s) for s in seq])
        self.want_logits.append(want_logits)

    def add_seq_to(self, idx: int, seq: int):
        """Add another sequence to an already-queued token (branch split
        sharing its prefix, ref: speculative.cpp:1027-1037)."""
        if seq not in self.seqs[idx]:
            self.seqs[idx].append(int(seq))

    def clear(self):
        self.tokens.clear()
        self.pos.clear()
        self.seqs.clear()
        self.want_logits.clear()

    def copy(self) -> "Batch":
        return Batch(
            list(self.tokens), list(self.pos), [list(s) for s in self.seqs], list(self.want_logits)
        )

    def __len__(self):
        return len(self.tokens)


def pack_batch(batch: "Batch", t_pad: int, trash_cell: int, cells: np.ndarray):
    """Pad a Batch to the bucket size as the device-step input arrays.

    Shared by every decode engine (single-device, staged, remote staged);
    padding rows write to the trash cell. Returns
    (tokens, pos, seq, seq_bits, cell_idx, valid, seq_rows) — seq_rows is
    the per-token [n, SEQ_WORDS] membership for the host mirrors (the same
    layout as the device bitmask; see kv.host_* helpers)."""
    n = len(batch)
    tokens = np.zeros(t_pad, np.int32)
    pos = np.zeros(t_pad, np.int32)
    seq = np.zeros(t_pad, np.int32)
    seq_bits = np.zeros((t_pad, kv.SEQ_WORDS), np.uint32)
    cell_idx = np.full(t_pad, trash_cell, np.int32)
    valid = np.zeros(t_pad, bool)
    tokens[:n] = batch.tokens
    pos[:n] = batch.pos
    seq[:n] = [s[0] for s in batch.seqs]
    seq_rows = kv.host_rows(batch.seqs)
    seq_bits[:n] = seq_rows
    cell_idx[:n] = cells
    valid[:n] = True
    return tokens, pos, seq, seq_bits, cell_idx, valid, seq_rows


class InferenceContext:
    """Single-model decode engine over one device (or one stage sub-mesh)."""

    def __init__(
        self,
        params,
        cfg: ModelConfig,
        *,
        n_cells: int = 1024,
        forward_fn: Callable | None = None,
        cache_dtype=jnp.bfloat16,
        mesh=None,
        device=None,
    ):
        """mesh: a 1-axis 'model' jax Mesh — weights/KV shard tensor-
        parallel across it (parallel.tp; BASELINE "weights tensor-sharded
        in HBM"). device: place this context's params+cache on a specific
        device (dual-pipeline topologies put draft and target on disjoint
        devices, ref: speculative.cpp:118-138 comm split)."""
        from ..models.loader import forward_for_arch

        self.cfg = cfg
        n_cells = kv.round_pool(n_cells)
        self.n_cells = n_cells
        self.mesh = mesh
        self._forward = forward_fn or forward_for_arch(cfg.arch)
        cache = kv.create(cfg.n_layers, n_cells, cfg.n_kv_heads, cfg.head_dim, cache_dtype)
        if mesh is not None:
            from ..parallel import tp

            self.params, self._tp_specs = tp.shard_params(params, cfg, mesh)
            self.cache = tp.shard_cache(cache, mesh)
        elif device is not None:
            self.params = jax.device_put(params, device)
            self.cache = jax.device_put(cache, device)
        else:
            self.params = params
            self.cache = cache
        # host mirrors for allocation (last cell reserved as padding trash)
        self.h_pos = np.full(n_cells, -1, np.int64)
        self.h_seq = kv.host_seq_zeros(n_cells)
        self.trash_cell = n_cells - 1
        self._step_cache: dict[int, Callable] = {}
        # eager-fetch workers: host transfers start at dispatch and OVERLAP
        # on the wire (the tunnel RTT is ~30 ms/transfer; a single worker
        # would re-serialize one RTT per in-flight run)
        import concurrent.futures as _cf
        import threading as _th

        self._fetch_pool = _cf.ThreadPoolExecutor(max_workers=4)
        # timings (ref: llama_print_timings). Counters accumulate
        # dispatch->fetch WALL time per handle (overlapping handles each
        # count their full latency — a utilization-style figure, not
        # throughput); the lock keeps concurrent fetch threads from losing
        # updates
        self._time_lock = _th.Lock()
        self.t_eval = 0.0
        self.n_eval = 0
        self.t_prefill = 0.0
        self.n_prefill = 0

    # -- jitted step --------------------------------------------------------
    # step functions are SHARED across contexts (module-level cache keyed by
    # forward fn + config): a fresh InferenceContext on the same model reuses
    # compiled executables instead of re-jitting per instance

    def _step_fn(self, t_pad: int, topk: int | None) -> Callable:
        if self.mesh is not None:
            from ..parallel import tp

            return tp.build_tp_step(
                self.cfg, topk, self.mesh, self._tp_specs, t_pad, self.cache.hot
            )
        return _shared_step(self._forward, self.cfg, topk)

    # -- on-device draft chain ---------------------------------------------

    def _chain_fn(self, depth: int, n_cand: int, samp=None) -> Callable:
        if self.mesh is not None:
            from ..parallel import tp

            return tp.build_tp_chain(
                self.cfg, depth, n_cand, self.mesh, self._tp_specs,
                self.cache.hot, samp,
            )
        return _shared_chain(self._forward, self.cfg, depth, n_cand, samp)
    def draft_chain(self, root_token, pos0: int, seq_id: int, depth: int,
                    n_cand: int = 8, fetch: bool = True,
                    samp: tuple | None = None, seed: int = 0):
        """Draft a chain of `depth` tokens rooted at `root_token`
        (decoded at pos0) — greedy, or sampled ON DEVICE when
        samp=(temp, top_k, top_p, min_p) (seed keys the per-step Gumbel
        draws). Returns (tokens [depth], candidates list of
        SparseLogits per step — candidates for the token drafted at that
        step). One dispatch + one host fetch. n_cand=0 skips the
        per-step top-k/normalizer entirely (bare greedy decode — the
        non-speculative bench baseline) and returns (tokens, []).

        root_token may be a host int or a DEVICE i32 scalar — specifically
        the `root_next` returned by a previous fetch=False call: with
        fetch=False this returns (out_device, root_next_device) without any
        host transfer, so back-to-back chains enqueue with ZERO host round
        trips or intermediate dispatches between them — the cell
        bookkeeping here is position-based and never needs token values.
        With fetch=False and n_cand>0, out_device is the raw packed
        [depth, 1+2*n_cand+1] rows (token ++ top-k vals ++ top-k ids ++
        lse); decode it the way the fetch=True branch below does."""
        from ..sampling.samplers import SparseLogits

        cells = self.find_cells(depth)
        self.h_pos[cells] = pos0 + np.arange(depth)
        self.h_seq[cells] = kv.host_only(seq_id)
        self._refresh_hot()
        fn = self._chain_fn(depth, n_cand, samp)
        if not isinstance(root_token, jax.Array):
            root_token = np.int32(root_token)
        extra = (jax.random.PRNGKey(seed),) if samp is not None else ()
        out, root_next, self.cache = fn(
            self.params,
            self.cache,
            root_token,
            np.int32(pos0),
            np.int32(seq_id),
            cells.astype(np.int32),
            *extra,
        )
        if not fetch:
            return out, root_next
        both = np.asarray(out)
        tokens = both[:, 0].astype(np.int32).tolist()
        if n_cand == 0:
            return tokens, []
        cands = [
            SparseLogits(
                both[i, 1 + n_cand : 1 + 2 * n_cand].astype(np.int32),
                both[i, 1 : 1 + n_cand],
                float(both[i, 1 + 2 * n_cand]),
            )
            for i in range(depth)
        ]
        return tokens, cands

    # -- startup ------------------------------------------------------------

    def precompile(
        self,
        *,
        buckets=(1, 8, 32),
        topk: int | None = None,
        chain_depths=(),
        n_cand: int = 8,
        seq_groups=(),
        max_workers: int = 6,
        log=None,
    ):
        """Warm-compile the program variants this context will use, in
        PARALLEL, by executing each once against a throwaway cache (the
        remote-compile service overlaps concurrent compiles; see
        utils.compile_cache). Results land in the persistent cache, so the
        next process deserializes in seconds.

        seq_groups: branch-group sizes (n_parallel values) to warm the
        fused seq-op programs for (prepare_branch_seqs/consolidate).

        Every program is warmed for each hot-bucket the pool can reach
        (hot is STATIC pytree aux — a different hot is a different
        executable; missing these made the first real prefill pay a
        multi-second recompile on the remote service)."""
        import dataclasses as _dc

        from ..utils.compile_cache import warm_parallel

        hots = [0]
        h = 512
        while h < self.trash_cell + 1:
            hots.append(h)
            h *= 2

        def dummy_cache(hot=0):
            c = jax.tree_util.tree_map(jnp.copy, self.cache)
            return _dc.replace(c, hot=hot) if hot else c

        def wait(x):
            # under the IFRT proxy, block_until_ready returns at remote
            # ENQUEUE; only a host fetch waits for compile+execution — fetch
            # the smallest leaf so warm jobs truly finish before reporting
            leaves = sorted(jax.tree_util.tree_leaves(x), key=lambda a: a.nbytes)
            np.asarray(leaves[0])

        def step_job(b, _topk, hot):
            def run():
                step = self._step_fn(b, _topk)
                out, c2 = step(
                    self.params,
                    dummy_cache(hot),
                    np.zeros(b, np.int32),
                    np.zeros(b, np.int32),
                    np.zeros(b, np.int32),
                    np.full(b, self.trash_cell, np.int32),
                    np.zeros(b, bool),
                    np.zeros((b, kv.SEQ_WORDS), np.uint32),
                )
                wait(out)

            return run

        def chain_job(d, hot):
            def run():
                fn = self._chain_fn(d, n_cand)
                out, _rn, c2 = fn(
                    self.params,
                    dummy_cache(hot),
                    np.int32(0),
                    np.int32(0),
                    np.int32(1),
                    np.full(d, self.trash_cell, np.int32),
                )
                wait(out)

            return run

        def seq_job(g, hot):
            def run():
                c = _jit_prepare_seqs(
                    dummy_cache(hot), np.int32(0), np.arange(1, g + 1, dtype=np.int32), np.int32(1)
                )
                c = _jit_consolidate(
                    c, np.int32(1), np.arange(1, g + 1, dtype=np.int32),
                    np.int32(0), np.int32(1), np.int32(0),
                )
                c = _jit_seq_rm(c, 1, 0, -1)
                c = _jit_seq_cp(c, 0, 1, 0, 1)
                c = _jit_rm_tail(c, 1)
                wait(c)

            return run

        jobs = [
            (f"step[{b},topk={topk},hot={h}]", step_job(b, topk, h))
            for b in buckets for h in hots
        ]
        jobs += [(f"chain[{d},hot={h}]", chain_job(d, h))
                 for d in chain_depths for h in hots]
        jobs += [(f"seqops[{g},hot={h}]", seq_job(g, h))
                 for g in seq_groups for h in hots]
        return warm_parallel(jobs, max_workers=max_workers, log=log)

    # -- cell allocation (host) --------------------------------------------

    def find_cells(self, n: int) -> np.ndarray:
        """First n free cells (the trash cell is never handed out)."""
        free = np.nonzero(self.h_pos[: self.trash_cell] < 0)[0]
        if len(free) < n:
            raise CacheFull(f"KV cache full: need {n} cells, {len(free)} free")
        return free[:n]

    def _refresh_hot(self):
        """Stamp the cache's static high-water mark from the host mirror so
        attention streams only the occupied prefix of the cell pool (the
        first-fit allocator keeps occupancy prefix-dense; see
        kv.hot_bucket for the shared bucket ladder). TP contexts pass the
        hot value into their step builders, whose shard_map in_specs are
        built from cache_spec(hot) to keep the pytree aux matched."""
        hot = kv.hot_bucket(self.h_pos, self.trash_cell)
        if hot != self.cache.hot:
            self.cache = dataclasses.replace(self.cache, hot=hot)

    @property
    def n_free_cells(self) -> int:
        return int((self.h_pos[: self.trash_cell] < 0).sum())

    # -- decode -------------------------------------------------------------

    def decode(self, batch: Batch, topk: int | None = None):
        """Run one step; returns logits [len(batch), n_vocab] (host numpy)
        or a SparseLogits batch when topk is set.

        The synchronous analogue of llama_decode; the async pipeline engine
        in spec/ dispatches the same jitted steps without blocking."""
        return self.decode_async(batch, topk).fetch()

    def decode_async(self, batch: Batch, topk: int | None = None) -> "AsyncHandle":
        """Dispatch one step without blocking. Returns an AsyncHandle whose
        .ready() mirrors the head's MPI_Iprobe on SYNC_LOGITS and whose
        .fetch() is phase 1 (the phase-0/phase-1 split of
        llama_start/finish_async_decode, ref: llama.h:285-290)."""
        t0 = time.perf_counter()
        n = len(batch)
        if n == 0:
            raise ValueError("empty batch")
        t_pad = _bucket(n)
        cells = self.find_cells(n)
        tokens, pos, seq, seq_bits, cell_idx, valid, seq_rows = pack_batch(
            batch, t_pad, self.trash_cell, cells
        )

        # host mirror update
        self.h_pos[cells] = batch.pos
        self.h_seq[cells] = seq_rows
        self._refresh_hot()

        step = self._step_fn(t_pad, topk)
        out, self.cache = step(
            self.params, self.cache, tokens, pos, seq, cell_idx, valid, seq_bits
        )

        def fetch(_out=out, _n=n, _t0=t0, _isdecode=(n <= 2), _topk=topk):
            if _topk is None:
                host = np.asarray(_out)[:_n]
            else:
                from ..sampling.samplers import SparseLogits

                packed = np.asarray(_out)[:_n]  # single transfer
                host = [
                    SparseLogits(
                        packed[i, _topk : 2 * _topk].astype(np.int32),
                        packed[i, :_topk],
                        float(packed[i, 2 * _topk]),
                    )
                    for i in range(_n)
                ]
            dt = time.perf_counter() - _t0
            with self._time_lock:
                if _isdecode:
                    self.t_eval += dt
                    self.n_eval += _n
                else:
                    self.t_prefill += dt
                    self.n_prefill += _n
            return host

        return AsyncHandle(logits=out, fetch=fetch, cells=cells).start_fetch(
            self._fetch_pool
        )

    # -- embedding input (the llama_batch.embd path: multimodal tokens) ----

    def decode_embd(self, embd: np.ndarray, pos0: int, seq_id: int = 0):
        """Feed pre-computed embeddings [T, E] at positions pos0..pos0+T-1
        (ref: llava_eval_image_embed llava.cpp:70-90 — image patches enter
        the pipeline as embeddings, no token ids). Fills KV cells; returns
        the final row's logits (np [n_vocab])."""
        t = embd.shape[0]
        t_pad = _bucket(t)
        cells = self.find_cells(t)
        x = np.zeros((t_pad, embd.shape[1]), np.float32)
        x[:t] = embd
        pos = np.zeros(t_pad, np.int32)
        pos[:t] = pos0 + np.arange(t)
        seq = np.full(t_pad, seq_id, np.int32)
        cell_idx = np.full(t_pad, self.trash_cell, np.int32)
        cell_idx[:t] = cells
        valid = np.zeros(t_pad, bool)
        valid[:t] = True
        self.h_pos[cells] = pos[:t]
        self.h_seq[cells] = kv.host_only(seq_id)
        self._refresh_hot()
        step = _shared_step_embd(self._forward, self.cfg)
        out, self.cache = step(self.params, self.cache, x, pos, seq, cell_idx, valid)
        return np.asarray(out)[t - 1]

    # -- seq ops (device + host mirror) ------------------------------------
    # Each is the counterpart of a pipelined KV transaction in the reference
    # (llama.cpp:9238-9359); here both copies update synchronously and the
    # device ops ride inside jit.

    def seq_rm(self, seq_id: int, p0: int = 0, p1: int = -1):
        self.cache = _jit_seq_rm(self.cache, seq_id, p0, p1)
        hp1 = np.iinfo(np.int64).max if p1 < 0 else p1
        hit = kv.host_member(self.h_seq, seq_id)
        hit &= (self.h_pos >= p0) & (self.h_pos < hp1)
        kv.host_clear(self.h_seq, seq_id, hit)
        self.h_pos[kv.host_empty(self.h_seq)] = -1

    def seq_cp(self, src: int, dst: int, p0: int = 0, p1: int = -1):
        self.cache = _jit_seq_cp(self.cache, src, dst, p0, p1)
        hp1 = np.iinfo(np.int64).max if p1 < 0 else p1
        hit = kv.host_member(self.h_seq, src)
        hit &= (self.h_pos >= p0) & (self.h_pos < hp1)
        kv.host_set(self.h_seq, dst, hit)

    def rm_tail(self, p0: int):
        """Free every cell at pos >= p0 on ALL sequences (the reference's
        seq_rm(-1, p0, -1))."""
        self.cache = _jit_rm_tail(self.cache, p0)
        hit = self.h_pos >= p0
        self.h_seq[hit] = 0
        self.h_pos[hit] = -1

    def seq_keep(self, seq_id: int):
        self.cache = _jit_seq_keep(self.cache, seq_id)
        keep = kv.host_member(self.h_seq, seq_id)
        self.h_seq[:] = 0
        self.h_seq[keep] = kv.host_only(seq_id)
        self.h_pos[~keep] = -1

    def seq_shift(self, seq_id: int, p0: int, p1: int, delta: int):
        """Shift positions + re-rotate K for [p0,p1) of a sequence. The host
        cell mirror identifies the affected cells, so the device op gathers,
        re-ropes, and scatters ONLY those (ref: the reference's lazy
        per-range K_shift llama.cpp:3495-3544 — not a full-cache rope)."""
        hp1 = np.iinfo(np.int64).max if p1 < 0 else p1
        hit = kv.host_member(self.h_seq, seq_id)
        hit &= (self.h_pos >= p0) & (self.h_pos < hp1)
        cells = np.nonzero(hit)[0]
        if len(cells):
            n_pad = _bucket(len(cells))
            padded = np.full(n_pad, self.trash_cell, np.int32)
            padded[: len(cells)] = cells
            self.cache = _jit_shift_cells(
                self.cache,
                padded,
                np.int32(delta),
                np.int32(self.trash_cell),
                self.cfg.rope_dims,
                self.cfg.rope_mode,
                self.cfg.rope_base,
                self.cfg.rope_scale,
            )
        self.h_pos[hit] += delta
        dropped = hit & (self.h_pos < 0)
        self.h_seq[dropped] = 0
        self.h_pos[dropped] = -1

    def prepare_branch_seqs(self, seqs: list[int], src: int, p1: int, device: bool = True):
        """Fused: clear each branch seq entirely and share src's cells
        [0, p1) into it — one device program instead of 2*len(seqs)
        (spec-run launch hot path). device=False updates only the host
        mirrors (the fused spec program applies the device side itself)."""
        if device:
            self.cache = _jit_prepare_seqs(
                self.cache, np.int32(src), np.asarray(seqs, np.int32), np.int32(p1)
            )
        for sq in seqs:
            kv.host_clear(self.h_seq, sq)
        self.h_pos[kv.host_empty(self.h_seq)] = -1
        hit = kv.host_member(self.h_seq, src) & (self.h_pos >= 0) & (self.h_pos < p1)
        for sq in seqs:
            kv.host_set(self.h_seq, sq, hit)

    def consolidate(self, win_seq: int, branch_seqs: list[int], p0: int, p1: int, dst: int = 0):
        """Fused: share win_seq's cells [p0, p1) with the committed sequence
        `dst`, then drop all branch seqs (verification retirement hot path)."""
        self.cache = _jit_consolidate(
            self.cache, np.int32(win_seq), np.asarray(branch_seqs, np.int32),
            np.int32(p0), np.int32(p1), np.int32(dst),
        )
        hit = kv.host_member(self.h_seq, win_seq) & (self.h_pos >= p0) & (self.h_pos < p1)
        kv.host_set(self.h_seq, dst, hit)
        for sq in branch_seqs:
            kv.host_clear(self.h_seq, sq)
        self.h_pos[kv.host_empty(self.h_seq)] = -1

    def clear_cache(self):
        self.cache = kv.clear(self.cache)
        self.h_pos[:] = -1
        self.h_seq[:] = 0

    def print_timings(self, log=print):
        """ref: llama_print_timings."""
        if self.n_prefill:
            log(
                f"prefill: {self.n_prefill} tokens in {self.t_prefill:.2f}s "
                f"({self.n_prefill / max(self.t_prefill, 1e-9):.1f} tok/s)"
            )
        if self.n_eval:
            log(
                f"decode:  {self.n_eval} tokens in {self.t_eval:.2f}s "
                f"({self.n_eval / max(self.t_eval, 1e-9):.1f} tok/s)"
            )


@functools.partial(jax.jit, donate_argnums=(0,))
def _jit_prepare_seqs(cache, src, seqs, p1):
    for i in range(seqs.shape[0]):
        cache = kv.seq_rm(cache, seqs[i], 0, -1)
        cache = kv.seq_cp(cache, src, seqs[i], 0, p1)
    return cache


@functools.partial(jax.jit, donate_argnums=(0,))
def _jit_consolidate(cache, win_seq, branch_seqs, p0, p1, dst=0):
    cache = kv.seq_cp(cache, win_seq, dst, p0, p1)
    for i in range(branch_seqs.shape[0]):
        cache = kv.seq_rm(cache, branch_seqs[i], 0, -1)
    return cache


@functools.partial(jax.jit, donate_argnums=(0,))
def _jit_seq_rm(cache, seq_id, p0, p1):
    return kv.seq_rm(cache, seq_id, p0, p1)


@functools.partial(jax.jit, donate_argnums=(0,))
def _jit_seq_cp(cache, src, dst, p0, p1):
    return kv.seq_cp(cache, src, dst, p0, p1)


@functools.partial(jax.jit, donate_argnums=(0,))
def _jit_seq_keep(cache, seq_id):
    return kv.seq_keep(cache, seq_id)


@functools.partial(jax.jit, donate_argnums=(0,))
def _jit_rm_tail(cache, p0):
    return kv.rm_tail(cache, p0)


@functools.partial(
    jax.jit,
    donate_argnums=(0,),
    static_argnames=("rope_dims", "rope_mode", "freq_base", "freq_scale"),
)
def _jit_shift_cells(cache, cells, delta, trash, rope_dims, rope_mode, freq_base, freq_scale):
    return kv.shift_cells(
        cache, cells, delta, trash,
        rope_dims=rope_dims, rope_mode=rope_mode,
        freq_base=freq_base, freq_scale=freq_scale,
    )


@functools.lru_cache(maxsize=None)
def _shared_step_embd(forward, cfg):
    @functools.partial(jax.jit, donate_argnums=(1,))
    def step(params, cache, embd, pos, seq, cell_idx, valid):
        tokens = jnp.zeros(embd.shape[0], jnp.int32)
        return forward(params, cfg, cache, tokens, pos, seq, cell_idx, valid,
                       embd=embd)

    return step


@functools.lru_cache(maxsize=None)
def _shared_step(forward, cfg, topk):
    @functools.partial(jax.jit, donate_argnums=(1,))
    def step(params, cache, tokens, pos, seq, cell_idx, valid, seq_bits):
        logits, cache = forward(params, cfg, cache, tokens, pos, seq, cell_idx, valid, seq_bits)
        if topk is None:
            return logits, cache
        # sparse head: ship only top-K + the exact softmax normalizer,
        # PACKED into one array — host fetch cost is per-call latency,
        # so one transfer, not three
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        vals, ids = jax.lax.top_k(logits, topk)
        packed = jnp.concatenate([vals, ids.astype(jnp.float32), lse[:, None]], axis=1)
        return packed, cache

    return step


def _device_draft_sample(row, samp, key):
    """Sample one draft token on device from a logits row under the
    (temp, top_k, top_p, min_p) chain via the Gumbel-max trick — the
    fused-run counterpart of the host draft sampler
    (ref: common/sampling.cpp:140-200 chain; used at speculative.cpp:274).
    Output-distribution correctness does NOT depend on this matching the
    host chain bit-for-bit (token-matching verification samples the
    TARGET on the host); the draft sampler only shapes acceptance.

    NOTE: top_k <= 0 means "consider the full vocab" in the host chain;
    here it is capped to the TOP-64 candidates (a full-vocab device sort
    per draft step costs more than the acceptance it buys), and top_p /
    min_p renormalize over that window. This can skew acceptance-rate
    comparisons against host drafting at very flat distributions — it
    never affects output correctness. Callers that need the exact host
    distribution (device_loop TARGET sampling) must pass 0 < top_k <= 64
    (enforced by device_loop.supported)."""
    temp, top_k, top_p, min_p = samp
    k = min(max(int(top_k), 1), row.shape[-1]) if top_k > 0 else min(64, row.shape[-1])
    vals, ids = jax.lax.top_k(row, k)
    logp = jax.nn.log_softmax(vals / max(temp, 1e-6))
    probs = jnp.exp(jax.nn.log_softmax(vals))  # pre-temp probs for p-gates
    cum = jnp.cumsum(probs) - probs
    allow = cum < top_p
    if min_p > 0:
        allow &= probs >= min_p * probs[0]
    allow = allow.at[0].set(True)  # the top token always survives
    g = -jnp.log(-jnp.log(jax.random.uniform(key, (k,), minval=1e-9, maxval=1.0)))
    pick = jnp.argmax(jnp.where(allow, logp + g, -jnp.inf))
    return ids[pick].astype(jnp.int32)


@functools.lru_cache(maxsize=None)
def _shared_fused_spec(fwd_d, cfg_d, fwd_t, cfg_t, depth, topk, samp=None):
    """ONE program per speculative run: draft-chain `depth` tokens on the
    draft model (lax.scan) and immediately batch-verify them on the target
    — the drafted tokens never leave the device between the two phases.
    The reference pays (depth draft decodes + 1 target dispatch) worth of
    host round trips per run; here a run is one dispatch + one eager fetch
    of a combined [depth, 2*topk+2] row pack (target sparse logits ++
    chain token). samp=None drafts greedily (bare argmax — the
    deterministic fast path); samp=(temp, top_k, top_p, min_p) drafts
    stochastically on device (Gumbel-max over the top-k), taking an extra
    PRNG-key argument — the common temp>0 serving case keeps the
    one-dispatch shape instead of paying a host RTT per tree depth.
    (ref: start_async_spec_run speculative.cpp:881-1180 collapsed into the
    phase-0 dispatch; phase 1 = the eager fetch.)"""

    @functools.partial(jax.jit, donate_argnums=(1, 3))
    def fused(dparams, dcache, tparams, tcache,
              root_token, dpos0, dseq_id, dcells,
              tpos, tseq, tcells, tseq_bits, src_seq, *key):
        # branch-seq preparation folded in (was 2 extra dispatches per run):
        # clear the run's seq slot and share src's prefix cells into it
        dcache = kv.seq_rm(dcache, dseq_id, 0, -1)
        dcache = kv.seq_cp(dcache, src_seq, dseq_id, 0, dpos0)
        tcache = kv.seq_rm(tcache, tseq[0], 0, -1)
        tcache = kv.seq_cp(tcache, src_seq, tseq[0], 0, tpos[0])

        def body(carry, i):
            dcache, tok, pos = carry
            logits, dcache = fwd_d(
                dparams, cfg_d, dcache,
                tok[None], pos[None], dseq_id[None], dcells[i][None],
                jnp.ones(1, bool), None,
            )
            if samp is None:
                nxt = jnp.argmax(logits[0]).astype(jnp.int32)
            else:
                nxt = _device_draft_sample(
                    logits[0], samp, jax.random.fold_in(key[0], i)
                )
            return (dcache, nxt, pos + 1), nxt

        (dcache, _, _), toks = jax.lax.scan(
            body, (dcache, root_token.astype(jnp.int32), dpos0), jnp.arange(depth)
        )

        tlogits, tcache = fwd_t(
            tparams, cfg_t, tcache, toks, tpos, tseq, tcells,
            jnp.ones(depth, bool), tseq_bits,
        )
        lse = jax.scipy.special.logsumexp(tlogits, axis=-1)
        vals, ids = jax.lax.top_k(tlogits, topk)
        tpacked = jnp.concatenate([vals, ids.astype(jnp.float32), lse[:, None]], axis=1)
        out = jnp.concatenate([tpacked, toks.astype(jnp.float32)[:, None]], axis=1)
        return out, dcache, tcache

    return fused


@functools.lru_cache(maxsize=None)
def _shared_chain(forward, cfg, depth, n_cand, samp=None):
    @functools.partial(jax.jit, donate_argnums=(1,))
    def chain(params, cache, root_token, pos0, seq_id, cell_idx, *key):
        """Draft `depth` tokens in ONE program (lax.scan): the per-depth
        decode->sample->decode chain stays on device, turning the draft
        loop's `depth` host round trips into one. samp=None drafts greedily;
        samp=(temp, top_k, top_p, min_p) samples on device via the Gumbel
        chain (one extra PRNG-key argument) — the staged/DCN-target
        counterpart of the fused stochastic path (ref: the per-depth draft
        sampling loop, speculative.cpp:957-1104)."""

        def body(carry, i):
            cache, tok, pos = carry
            logits, cache = forward(
                params, cfg, cache,
                tok[None], pos[None], seq_id[None], cell_idx[i][None],
                jnp.ones(1, bool), None,
            )
            row = logits[0]
            if n_cand == 0:
                # bare greedy chain (bench baseline): no candidate pack
                nxt = jnp.argmax(row).astype(jnp.int32)
                return (cache, nxt, pos + 1), (nxt, nxt[None].astype(jnp.float32))
            if samp is None:
                nxt = None  # greedy: the top candidate
            else:
                nxt = _device_draft_sample(row, samp, jax.random.fold_in(key[0], i))
            lse = jax.scipy.special.logsumexp(row)
            vals, ids = jax.lax.top_k(row, n_cand)
            packed = jnp.concatenate([vals, ids.astype(jnp.float32), lse[None]])
            if nxt is None:
                nxt = ids[0]
            return (cache, nxt, pos + 1), (nxt, packed)

        (cache, _, _), (toks, packs) = jax.lax.scan(
            body, (cache, root_token, pos0), jnp.arange(depth)
        )
        # root_next: the last drafted token as a ready-to-chain i32 scalar,
        # produced INSIDE this program — a follow-up chain can root here
        # with no intermediate slice/cast dispatch (each extra program on
        # the tunneled runtime costs more than the RTT it would save)
        root_next = toks[-1].astype(jnp.int32)
        if n_cand == 0:
            return toks.astype(jnp.float32)[:, None], root_next, cache
        out = jnp.concatenate([toks.astype(jnp.float32)[:, None], packs], axis=1)
        return out, root_next, cache

    return chain
