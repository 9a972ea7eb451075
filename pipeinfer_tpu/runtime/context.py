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


def _bucket(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


@dataclasses.dataclass
class AsyncHandle:
    """A dispatched decode: device work in flight, logits not yet on host."""

    logits: jax.Array
    fetch: Callable[[], np.ndarray]
    cells: np.ndarray

    def ready(self) -> bool:
        """Non-blocking completion check — the counterpart of the head's
        llama_mpi_iprobe(SYNC_LOGITS) (ref: llama.cpp:5457-5459)."""
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
    ):
        from ..models import llama as default_model

        self.params = params
        self.cfg = cfg
        self.n_cells = n_cells
        self._forward = forward_fn or default_model.forward
        self.cache = kv.create(cfg.n_layers, n_cells, cfg.n_kv_heads, cfg.head_dim, cache_dtype)
        # host mirrors for allocation (last cell reserved as padding trash)
        self.h_pos = np.full(n_cells, -1, np.int64)
        self.h_seq = np.zeros(n_cells, np.uint64)
        self.trash_cell = n_cells - 1
        self._step_cache: dict[int, Callable] = {}
        # timings (ref: llama_print_timings)
        self.t_eval = 0.0
        self.n_eval = 0
        self.t_prefill = 0.0
        self.n_prefill = 0

    # -- jitted step --------------------------------------------------------

    def _step_fn(self, t_pad: int) -> Callable:
        fn = self._step_cache.get(t_pad)
        if fn is None:
            forward = self._forward
            cfg = self.cfg

            @functools.partial(jax.jit, donate_argnums=(1,))
            def step(params, cache, tokens, pos, seq, cell_idx, valid, seq_bits):
                return forward(params, cfg, cache, tokens, pos, seq, cell_idx, valid, seq_bits)

            fn = step
            self._step_cache[t_pad] = fn
        return fn

    # -- cell allocation (host) --------------------------------------------

    def find_cells(self, n: int) -> np.ndarray:
        """First n free cells (the trash cell is never handed out)."""
        free = np.nonzero(self.h_pos[: self.trash_cell] < 0)[0]
        if len(free) < n:
            raise RuntimeError(f"KV cache full: need {n} cells, {len(free)} free")
        return free[:n]

    @property
    def n_free_cells(self) -> int:
        return int((self.h_pos[: self.trash_cell] < 0).sum())

    # -- decode -------------------------------------------------------------

    def decode(self, batch: Batch) -> np.ndarray:
        """Run one step; returns logits [len(batch), n_vocab] (host numpy).

        The synchronous analogue of llama_decode; the async pipeline engine
        in spec/ dispatches the same jitted steps without blocking."""
        return self.decode_async(batch).fetch()

    def decode_async(self, batch: Batch) -> "AsyncHandle":
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

        tokens = np.zeros(t_pad, np.int32)
        pos = np.zeros(t_pad, np.int32)
        seq = np.zeros(t_pad, np.int32)
        seq_bits = np.zeros((t_pad, kv.SEQ_WORDS), np.uint32)
        cell_idx = np.full(t_pad, self.trash_cell, np.int32)
        valid = np.zeros(t_pad, bool)
        tokens[:n] = batch.tokens
        pos[:n] = batch.pos
        seq[:n] = [s[0] for s in batch.seqs]
        mask64 = np.zeros(n, np.uint64)
        for i, slist in enumerate(batch.seqs):
            for s in slist:
                mask64[i] |= np.uint64(1) << np.uint64(s)
        seq_bits[:n, 0] = (mask64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        seq_bits[:n, 1] = (mask64 >> np.uint64(32)).astype(np.uint32)
        cell_idx[:n] = cells
        valid[:n] = True

        # host mirror update
        self.h_pos[cells] = batch.pos
        self.h_seq[cells] = mask64

        step = self._step_fn(t_pad)
        logits, self.cache = step(
            self.params,
            self.cache,
            jnp.asarray(tokens),
            jnp.asarray(pos),
            jnp.asarray(seq),
            jnp.asarray(cell_idx),
            jnp.asarray(valid),
            jnp.asarray(seq_bits),
        )

        def fetch(_logits=logits, _n=n, _t0=t0, _isdecode=(n <= 2)):
            host = np.asarray(_logits)[:_n]
            dt = time.perf_counter() - _t0
            if _isdecode:
                self.t_eval += dt
                self.n_eval += _n
            else:
                self.t_prefill += dt
                self.n_prefill += _n
            return host

        return AsyncHandle(logits=logits, fetch=fetch, cells=cells)

    # -- seq ops (device + host mirror) ------------------------------------
    # Each is the counterpart of a pipelined KV transaction in the reference
    # (llama.cpp:9238-9359); here both copies update synchronously and the
    # device ops ride inside jit.

    def seq_rm(self, seq_id: int, p0: int = 0, p1: int = -1):
        self.cache = _jit_seq_rm(self.cache, seq_id, p0, p1)
        hp1 = np.iinfo(np.int64).max if p1 < 0 else p1
        hit = (self.h_seq >> np.uint64(seq_id) & np.uint64(1)).astype(bool)
        hit &= (self.h_pos >= p0) & (self.h_pos < hp1)
        self.h_seq[hit] &= ~(np.uint64(1) << np.uint64(seq_id))
        self.h_pos[self.h_seq == 0] = -1

    def seq_cp(self, src: int, dst: int, p0: int = 0, p1: int = -1):
        self.cache = _jit_seq_cp(self.cache, src, dst, p0, p1)
        hp1 = np.iinfo(np.int64).max if p1 < 0 else p1
        hit = (self.h_seq >> np.uint64(src) & np.uint64(1)).astype(bool)
        hit &= (self.h_pos >= p0) & (self.h_pos < hp1)
        self.h_seq[hit] |= np.uint64(1) << np.uint64(dst)

    def seq_keep(self, seq_id: int):
        self.cache = _jit_seq_keep(self.cache, seq_id)
        keep = (self.h_seq >> np.uint64(seq_id) & np.uint64(1)).astype(bool)
        self.h_seq[:] = np.where(keep, np.uint64(1) << np.uint64(seq_id), np.uint64(0))
        self.h_pos[~keep] = -1

    def seq_shift(self, seq_id: int, p0: int, p1: int, delta: int):
        self.cache = kv.seq_shift(
            self.cache,
            seq_id,
            p0,
            p1,
            delta,
            rope_dims=self.cfg.rope_dims,
            rope_mode=self.cfg.rope_mode,
            freq_base=self.cfg.rope_base,
            freq_scale=self.cfg.rope_scale,
        )
        hp1 = np.iinfo(np.int64).max if p1 < 0 else p1
        hit = (self.h_seq >> np.uint64(seq_id) & np.uint64(1)).astype(bool)
        hit &= (self.h_pos >= p0) & (self.h_pos < hp1)
        self.h_pos[hit] += delta
        dropped = hit & (self.h_pos < 0)
        self.h_seq[dropped] = 0
        self.h_pos[dropped] = -1

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
def _jit_seq_rm(cache, seq_id, p0, p1):
    return kv.seq_rm(cache, seq_id, p0, p1)


@functools.partial(jax.jit, donate_argnums=(0,))
def _jit_seq_cp(cache, src, dst, p0, p1):
    return kv.seq_cp(cache, src, dst, p0, p1)


@functools.partial(jax.jit, donate_argnums=(0,))
def _jit_seq_keep(cache, seq_id):
    return kv.seq_keep(cache, seq_id)
