"""Host-driven pipeline stages: the PipeInfer multi-chip target topology.

Re-imagines the reference's MPI pipeline (ref: ggml-mpi.c ring +
llama.cpp:9941-9977 worker loop) for TPU: each stage owns a layer slab and
its own KV-cache slab on its own device; the host asynchronously dispatches
per-stage jitted steps and device-to-device activation transfers, so
several microbatches can be in flight across the stage depth — the async
controller's AsyncRun deque maps 1:1 onto this. There is no tag protocol:
JAX async dispatch orders work per device, and `AsyncHandle.ready()` on the
final stage's output is the head's iprobe.

KV sequence operations fan out to every stage's cache (the counterpart of
the reference's pipelined KV transactions, llama.cpp:9238-9359), dispatched
without host synchronization.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models import staged
from ..runtime import kv_cache as kv
from ..runtime.context import AsyncHandle, Batch, InferenceContext, _bucket, pack_batch


def split_ranges(n_layers: int, weights: Sequence[float]) -> list[tuple[int, int]]:
    """Weighted layer ranges (ref: ggml_mpi_split_range ggml-mpi.c:523-559;
    the --mpi-layer-split fractions UX)."""
    total = sum(weights)
    ranges = []
    start = 0
    for i, w in enumerate(weights):
        n = round(n_layers * w / total) if i < len(weights) - 1 else n_layers - start
        n = max(1, min(n, n_layers - start - (len(weights) - 1 - i)))
        ranges.append((start, start + n))
        start += n
    assert start == n_layers, (ranges, n_layers)
    return ranges


class StagedInferenceContext:
    """InferenceContext-compatible engine over pipeline stages.

    Exposes the same decode/seq-op surface the speculation controller uses,
    so PipeInfer runs unchanged over 1..N devices."""

    FIRST_STAGE_GLOBALS = ("tok_embd", "tok_norm", "tok_norm_b", "pos_embd")
    LAST_STAGE_GLOBALS = ("output_norm", "output_norm_b", "output")

    def __init__(
        self,
        params,
        cfg: ModelConfig,
        *,
        n_cells: int = 1024,
        devices: Sequence | None = None,
        split: Sequence[float] | None = None,
        cache_dtype=jnp.bfloat16,
        tp: int = 1,
    ):
        """devices: one device per stage, or a flat list grouped into
        per-stage TP sub-meshes of size `tp` (weights tensor-sharded
        WITHIN each pipeline stage — SURVEY §2.3 TP row; llama-family
        split-qkv weights only when tp > 1)."""
        self.cfg = cfg
        n_cells = kv.round_pool(n_cells)
        self.n_cells = n_cells
        devices = list(devices) if devices else [jax.devices()[0]]
        self.tp = tp
        if tp > 1:
            assert len(devices) % tp == 0, (len(devices), tp)
            groups = [devices[i : i + tp] for i in range(0, len(devices), tp)]
        else:
            groups = [[d] for d in devices]
        self.groups = groups
        self.devices = [g[0] for g in groups]
        n_stages = len(groups)
        split = split or [1.0 / n_stages] * n_stages
        self.ranges = split_ranges(cfg.n_layers, split)
        self.local_cfg = staged.local_cfg(cfg, tp)

        from . import tp as tpmod

        self.meshes = [tpmod.tp_mesh(g) if tp > 1 else None for g in groups]
        self.stage_params = []
        self.stage_specs = []
        for gi, (g, (lo, hi)) in enumerate(zip(groups, self.ranges)):
            sp = {"layers": params["layers"][lo:hi]}
            if lo == 0:
                for key in self.FIRST_STAGE_GLOBALS:
                    if key in params:
                        sp[key] = params[key]
            if hi == cfg.n_layers:
                for key in self.LAST_STAGE_GLOBALS:
                    if key in params:
                        sp[key] = params[key]
            if tp > 1:
                sharded, specs = tpmod.shard_params(sp, cfg, self.meshes[gi])
                self.stage_params.append(sharded)
                self.stage_specs.append(specs)
            else:
                self.stage_params.append(jax.device_put(sp, g[0]))
                self.stage_specs.append(None)
        self.caches = []
        for gi, (g, (lo, hi)) in enumerate(zip(groups, self.ranges)):
            c = kv.create(hi - lo, n_cells, cfg.n_kv_heads, cfg.head_dim, cache_dtype)
            if tp > 1:
                self.caches.append(tpmod.shard_cache(c, self.meshes[gi]))
            else:
                self.caches.append(jax.device_put(c, g[0]))

        self._init_host_state(n_cells)

    def _init_host_state(self, n_cells: int):
        """Host allocation mirrors + timing counters — the invariants every
        seq op and find_cells reads (shared with RemoteStagedContext).
        `_time_lock` guards the timing counters: overlapping in-flight runs
        update them from concurrent fetch threads (same race context.py's
        counters had)."""
        import threading as _th

        self.h_pos = np.full(n_cells, -1, np.int64)
        self.h_seq = kv.host_seq_zeros(n_cells)
        self.trash_cell = n_cells - 1
        self._time_lock = _th.Lock()
        self.t_eval = 0.0
        self.n_eval = 0
        self.t_prefill = 0.0
        self.n_prefill = 0

    # -- stage step fns ------------------------------------------------------

    def _stage_fn(self, si: int, topk, hot: int | None = None) -> Callable:
        first = si == 0
        last = si == len(self.groups) - 1
        if self.tp > 1:
            from . import tp as tpmod

            return _staged_step_tp(
                self.cfg, first, last, topk if last else None,
                self.meshes[si], tpmod._freeze(self.stage_specs[si]),
                self.caches[si].hot if hot is None else hot,
            )
        return _staged_step(self.cfg, first, last, topk if last else None)

    # -- decode --------------------------------------------------------------

    def decode(self, batch: Batch, topk: int | None = None):
        return self.decode_async(batch, topk).fetch()

    def decode_async(self, batch: Batch, topk: int | None = None) -> AsyncHandle:
        t0 = time.perf_counter()
        n = len(batch)
        t_pad = _bucket(n)
        cells = self.find_cells(n)
        tokens, pos, seq, seq_bits, cell_idx, valid, seq_rows = pack_batch(
            batch, t_pad, self.trash_cell, cells
        )
        self.h_pos[cells] = batch.pos
        self.h_seq[cells] = seq_rows
        self._refresh_hot()

        x = tokens
        for si in range(len(self.groups)):
            if si > 0:
                # ICI hop, async: replicate the boundary activation onto the
                # next stage's device (or TP sub-mesh)
                if self.meshes[si] is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    x = jax.device_put(
                        x, NamedSharding(self.meshes[si], P(*([None] * x.ndim)))
                    )
                else:
                    x = jax.device_put(x, self.devices[si])
            fn = self._stage_fn(si, topk)
            x, self.caches[si] = fn(
                self.stage_params[si], self.caches[si], x, pos, seq, cell_idx, valid, seq_bits
            )

        def fetch(_out=x, _n=n, _t0=t0, _topk=topk, _isdecode=(n <= 2)):
            if _topk is None:
                host = np.asarray(_out)[:_n]
            else:
                from ..sampling.samplers import SparseLogits

                packed = np.asarray(_out)[:_n]
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

        if not hasattr(self, "_fetch_pool"):
            import concurrent.futures as _cf

            self._fetch_pool = _cf.ThreadPoolExecutor(max_workers=4)
        return AsyncHandle(logits=x, fetch=fetch, cells=cells).start_fetch(
            self._fetch_pool
        )

    def _refresh_hot(self):
        """Hot-cell bounding for staged caches: stamp the shared bucket
        (kv.hot_bucket) on every stage cache so attention streams only the
        occupied prefix (TP stages pass the hot value into their step
        builders, whose shard_map in_specs come from cache_spec(hot))."""
        import dataclasses as _dc

        hot = kv.hot_bucket(self.h_pos, self.trash_cell)
        for i in range(len(self.caches)):
            if self.caches[i].hot != hot:
                self.caches[i] = _dc.replace(self.caches[i], hot=hot)

    # -- allocation (host mirror, shared across stages) ----------------------

    def find_cells(self, n: int) -> np.ndarray:
        from ..runtime.context import CacheFull

        free = np.nonzero(self.h_pos[: self.trash_cell] < 0)[0]
        if len(free) < n:
            raise CacheFull(f"KV cache full: need {n}, have {len(free)}")
        return free[:n]

    # -- KV seq ops: fan out to every stage (pipelined transactions) ---------

    def seq_rm(self, seq_id: int, p0: int = 0, p1: int = -1):
        for i in range(len(self.caches)):
            self.caches[i] = _jit_rm(self.caches[i], seq_id, p0, p1)
        hp1 = np.iinfo(np.int64).max if p1 < 0 else p1
        hit = kv.host_member(self.h_seq, seq_id)
        hit &= (self.h_pos >= p0) & (self.h_pos < hp1)
        kv.host_clear(self.h_seq, seq_id, hit)
        self.h_pos[kv.host_empty(self.h_seq)] = -1

    def seq_cp(self, src: int, dst: int, p0: int = 0, p1: int = -1):
        for i in range(len(self.caches)):
            self.caches[i] = _jit_cp(self.caches[i], src, dst, p0, p1)
        hp1 = np.iinfo(np.int64).max if p1 < 0 else p1
        hit = kv.host_member(self.h_seq, src)
        hit &= (self.h_pos >= p0) & (self.h_pos < hp1)
        kv.host_set(self.h_seq, dst, hit)

    def rm_tail(self, p0: int):
        """Free every cell at pos >= p0 on ALL sequences (the reference's
        seq_rm(-1, p0, -1) fan-out, llama.cpp:9245-9265)."""
        from ..runtime.context import _jit_rm_tail

        for i in range(len(self.caches)):
            self.caches[i] = _jit_rm_tail(self.caches[i], p0)
        hit = self.h_pos >= p0
        self.h_seq[hit] = 0
        self.h_pos[hit] = -1

    def seq_keep(self, seq_id: int):
        from ..runtime.context import _jit_seq_keep

        for i in range(len(self.caches)):
            self.caches[i] = _jit_seq_keep(self.caches[i], seq_id)
        keep = kv.host_member(self.h_seq, seq_id)
        self.h_seq[:] = 0
        self.h_seq[keep] = kv.host_only(seq_id)
        self.h_pos[~keep] = -1

    def seq_shift(self, seq_id: int, p0: int, p1: int, delta: int):
        """Context sliding over a pipelined target: every stage re-rotates
        its own K slab for the affected cells (the reference broadcasts the
        shift transaction through the ring, llama.cpp:9348-9359)."""
        from ..runtime.context import _jit_shift_cells

        hp1 = np.iinfo(np.int64).max if p1 < 0 else p1
        hit = kv.host_member(self.h_seq, seq_id)
        hit &= (self.h_pos >= p0) & (self.h_pos < hp1)
        cells = np.nonzero(hit)[0]
        if len(cells):
            n_pad = _bucket(len(cells))
            padded = np.full(n_pad, self.trash_cell, np.int32)
            padded[: len(cells)] = cells
            for i in range(len(self.caches)):
                self.caches[i] = _jit_shift_cells(
                    self.caches[i], padded, np.int32(delta), np.int32(self.trash_cell),
                    self.cfg.rope_dims, self.cfg.rope_mode,
                    self.cfg.rope_base, self.cfg.rope_scale,
                )
        self.h_pos[hit] += delta
        dropped = hit & (self.h_pos < 0)
        self.h_seq[dropped] = 0
        self.h_pos[dropped] = -1

    def clear_cache(self):
        for i in range(len(self.caches)):
            self.caches[i] = kv.clear(self.caches[i])
        self.h_pos[:] = -1
        self.h_seq[:] = 0

    def precompile(self, *, buckets=(1, 8, 32), topk: int | None = None,
                   seq_groups=(), max_workers: int = 6, log=None, **_ignored):
        """Warm-compile every stage's step variants + the staged seq-op
        programs in parallel (same contract as InferenceContext.precompile;
        chain_depths is ignored — staged targets draft on the host path)."""
        import jax.numpy as _jnp

        from ..utils.compile_cache import warm_parallel
        from ..runtime.context import (
            _jit_prepare_seqs, _jit_consolidate, _jit_seq_rm, _jit_seq_cp,
            _jit_seq_keep, _jit_rm_tail,
        )

        def wait(x):
            leaves = sorted(jax.tree_util.tree_leaves(x), key=lambda a: a.nbytes)
            np.asarray(leaves[0])

        hots = [0]
        h = 512
        while h < self.trash_cell + 1:
            hots.append(h)
            h *= 2

        def step_job(si, b, _topk, hot=0):
            import dataclasses as _dc

            def run():
                fn = self._stage_fn(si, _topk, hot)
                cache = jax.tree_util.tree_map(jnp.copy, self.caches[si])
                if hot:
                    cache = _dc.replace(cache, hot=hot)
                x = (np.zeros(b, np.int32) if si == 0
                     else np.zeros((b, self.cfg.n_embd), np.float32))
                if si > 0:
                    x = jax.device_put(x, self.devices[si]) if self.meshes[si] is None else x
                out, _c = fn(
                    self.stage_params[si], cache, x,
                    np.zeros(b, np.int32), np.zeros(b, np.int32),
                    np.full(b, self.trash_cell, np.int32),
                    np.zeros(b, bool), np.zeros((b, kv.SEQ_WORDS), np.uint32),
                )
                wait(out)

            return run

        def seq_job(si, g):
            def run():
                c = jax.tree_util.tree_map(_jnp.copy, self.caches[si])
                c = _jit_prepare_seqs(c, np.int32(0), np.arange(1, g + 1, dtype=np.int32), np.int32(1))
                c = _jit_consolidate(c, np.int32(1), np.arange(1, g + 1, dtype=np.int32),
                                     np.int32(0), np.int32(1), np.int32(0))
                c = _jit_seq_rm(c, 1, 0, -1)
                c = _jit_seq_cp(c, 0, 1, 0, 1)
                c = _jit_rm_tail(c, 1)
                c = _jit_seq_keep(c, 0)
                wait(c)

            return run

        jobs = [
            (f"stage{si}/step[{b},topk={topk if si == len(self.groups) - 1 else None},hot={h}]",
             step_job(si, b, topk if si == len(self.groups) - 1 else None, h))
            for si in range(len(self.groups))
            for b in buckets
            for h in hots
        ]
        jobs += [
            (f"stage{si}/seqops[{g}]", seq_job(si, g))
            for si in range(len(self.groups))
            for g in seq_groups
        ]
        return warm_parallel(jobs, max_workers=max_workers, log=log)

    def prepare_branch_seqs(self, seqs: list[int], src: int, p1: int):
        from ..runtime.context import _jit_prepare_seqs

        for i in range(len(self.caches)):
            self.caches[i] = _jit_prepare_seqs(
                self.caches[i], np.int32(src), np.asarray(seqs, np.int32), np.int32(p1)
            )
        for sq in seqs:
            kv.host_clear(self.h_seq, sq)
        self.h_pos[kv.host_empty(self.h_seq)] = -1
        hit = kv.host_member(self.h_seq, src) & (self.h_pos >= 0) & (self.h_pos < p1)
        for sq in seqs:
            kv.host_set(self.h_seq, sq, hit)

    def consolidate(self, win_seq: int, branch_seqs: list[int], p0: int, p1: int, dst: int = 0):
        from ..runtime.context import _jit_consolidate

        for i in range(len(self.caches)):
            self.caches[i] = _jit_consolidate(
                self.caches[i], np.int32(win_seq), np.asarray(branch_seqs, np.int32),
                np.int32(p0), np.int32(p1), np.int32(dst),
            )
        hit = kv.host_member(self.h_seq, win_seq) & (self.h_pos >= p0) & (self.h_pos < p1)
        kv.host_set(self.h_seq, dst, hit)
        for sq in branch_seqs:
            kv.host_clear(self.h_seq, sq)
        self.h_pos[kv.host_empty(self.h_seq)] = -1

    def print_timings(self, log=print):
        InferenceContext.print_timings(self, log)  # same counters


@functools.lru_cache(maxsize=None)
def _staged_step(cfg, first, last, topk):
    @functools.partial(jax.jit, donate_argnums=(1,))
    def step(sp, cache, x, pos, seq, cell_idx, valid, seq_bits):
        return staged.stage_forward(
            sp, cfg, cache, x, pos, seq, cell_idx, valid, seq_bits,
            first=first, last=last, topk=topk,
        )

    return step


@functools.lru_cache(maxsize=None)
def _staged_step_tp(cfg, first, last, topk, mesh, specs_key, hot=0):
    """TP-inside-a-stage step: shard_map over the stage's sub-mesh."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from . import tp as tpmod

    specs_struct, specs_leaves = specs_key
    specs = jax.tree_util.tree_unflatten(specs_struct, list(specs_leaves))
    lcfg = staged.local_cfg(cfg, mesh.shape["model"])

    def inner(sp, cache, x, pos, seq, cell_idx, valid, seq_bits):
        p = tpmod.unstack_local(sp, specs)
        return staged.stage_forward(
            p, lcfg, cache, x, pos, seq, cell_idx, valid, seq_bits,
            first=first, last=last, topk=topk, tp_axis="model",
        )

    rep = P(None)
    x_spec = rep if first else P(None, None)
    fn = shard_map(
        inner,
        mesh=mesh,
        in_specs=(specs, tpmod.cache_spec(hot), x_spec, rep, rep, rep, rep,
                  P(None, None)),
        out_specs=(P(None, None), tpmod.cache_spec(hot)),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(1,))


@functools.partial(jax.jit, donate_argnums=(0,))
def _jit_rm(cache, seq_id, p0, p1):
    return kv.seq_rm(cache, seq_id, p0, p1)


@functools.partial(jax.jit, donate_argnums=(0,))
def _jit_cp(cache, src, dst, p0, p1):
    return kv.seq_cp(cache, src, dst, p0, p1)
