"""Device-corrected chaining: fused speculative runs that verify ON DEVICE
and chain from the *corrected* frontier.

The assume-chained fused path (spec/fused.py) keeps the pipeline full by
chaining each run from the previous run's LAST DRAFT TOKEN — the whole
chain rides on the assumption that every drafted token verifies. At
per-token acceptance `a` and depth `d`, a run survives with probability
a^d, and a single within-run mismatch invalidates every chained run in
flight behind it (~max_inflight-1 dispatches of pure dead device time —
the controller's degraded-draft row measured 37% dead work at a~0.98,
d=8; the reference pays the same structural cost through its
cancellation wave, speculative.cpp:1277-1359 + llama.cpp:9981-9993).

The TPU-native fix: fold the verification INTO the speculative run. Each
corrected run, in one XLA program (one device-loop round,
spec/device_loop.py, plus the controller's sparse logits head):

  1. draft-chains `depth` tokens from the chain root (root decoded at
     `base` — both DEVICE scalars produced by the previous run);
  2. batch-decodes [root ++ drafted] on the target (one weight pass);
  3. verifies on device — greedy argmax match, or row-wise Gumbel-max
     target sampling through the user's (temp, top_k, top_p, min_p)
     chain, so every committed token is a true target sample;
  4. commits the matched prefix + the bonus token, drops the rejected
     rows' cells BY INDEX (multi-stream safe — other sequences' cells
     are never touched), and emits (bonus, base+m+1) as device scalars.

The next run chains from those scalars: its context is the TRUE frontier
by construction, so chained runs are never launched on a diverged
assumption and cross-run dead work is zero. The host retires runs
exactly as before (eager fetch -> commit tokens -> sampler/metrics
bookkeeping), remains the sampling authority for regimes the device
cannot express (grammar, penalties, mirostat, multi-branch trees,
staged/DCN targets — those keep spec/fused.py + cancellation), and
keeps the adaptive depth ladder: each launch picks its rung from the
acceptance EMA (SpecParams.pick_depth with the tail-waste value model —
at low acceptance a deep run wastes its tail, the only waste left).

ref: examples/speculative/speculative.cpp:881-1180 (speculative run),
:1277-1359 (the cancellation this path makes unnecessary in-regime),
llama.cpp:5850-5872 (async decode split — here phase 1 carries the
verification result, not raw logits).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime import kv_cache as kv
from ..runtime.context import AsyncHandle, InferenceContext, _device_draft_sample
from ..sampling.samplers import SparseLogits


def supported(ctrl) -> bool:
    """Can this controller chain through device-corrected runs?

    Needs everything the device verify can express: single-branch trees,
    a sparse logits head, no grammar, and a sampler chain the device
    target-sampler covers (greedy, or pure temp/top_k/top_p/min_p with
    top_k <= 64 — device_loop.supported's envelope). Richer samplers keep
    the host-verified fused path and its cancellation machinery."""
    from . import device_loop

    return (
        ctrl.sp.device_verify
        and ctrl.sp.n_parallel == 1
        and ctrl.topk is not None
        and ctrl.sampler.grammar is None
        and device_loop.supported(ctrl.sampling)
        and getattr(ctrl.tgt, "mesh", object()) is None
        and getattr(ctrl.dft, "mesh", object()) is None
    )


def _drop_rows(cache: kv.KVCache, cells: jax.Array, keep: jax.Array) -> kv.KVCache:
    """Free cache rows `cells[i]` where keep[i] is False — index-based
    rollback (never touches cells outside this run, unlike kv.rm_tail)."""
    import dataclasses

    pos = cache.pos.at[cells].set(jnp.where(keep, cache.pos[cells], -1))
    seq = cache.seq.at[cells].set(
        jnp.where(keep[:, None], cache.seq[cells], jnp.uint32(0))
    )
    return dataclasses.replace(cache, pos=pos, seq=seq)


@functools.lru_cache(maxsize=None)
def _shared_corrected_spec(fwd_d, cfg_d, fwd_t, cfg_t, depth, topk,
                           samp=None, tsample=False, rounds=1):
    """R corrected speculative rounds as a single program.

    Returns (out [R, depth+1, 2*topk+3], bonus, new_base, dcache, tcache):
    per round, out rows pack the target's sparse logits (top-k vals ++
    ids ++ lse), a committed-token column, and the accept count m
    smuggled in row 0 of the last column. Each round chains from the
    previous round's corrected (bonus, base) ON DEVICE — rounds > 1 is
    the device loop's cadence (spec/device_loop.py) with the
    controller's sparse logits head kept per round; bonus/new_base chain
    the NEXT dispatched run."""

    @functools.partial(jax.jit, donate_argnums=(1, 3))
    def run(dparams, dcache, tparams, tcache, root, base, seq_id,
            dcells, tcells, *key):
        # root i32 scalar; dcells [R, depth]; tcells [R, depth+1]
        root = root.astype(jnp.int32)

        def round_body(carry, xs):
            dcache, tcache, root, base = carry
            dcell_row, tcell_row, r = xs

            # 1) draft chain from root (root decoded at `base`)
            def draft_step(c, i):
                dcache, tok, pos = c
                logits, dcache = fwd_d(
                    dparams, cfg_d, dcache,
                    tok[None], pos[None], seq_id[None], dcell_row[i][None],
                    jnp.ones(1, bool), None,
                )
                if samp is None:
                    nxt = jnp.argmax(logits[0]).astype(jnp.int32)
                else:
                    nxt = _device_draft_sample(
                        logits[0], samp,
                        jax.random.fold_in(key[0], r * (depth + 1) + i),
                    )
                return (dcache, nxt, pos + 1), nxt

            (dcache, _, _), toks = jax.lax.scan(
                draft_step, (dcache, root, base), jnp.arange(depth)
            )

            # 2) one target pass over [root ++ drafted]
            ttoks = jnp.concatenate([root[None], toks])
            tpos = base + jnp.arange(depth + 1, dtype=jnp.int32)
            tseq = jnp.broadcast_to(seq_id, (depth + 1,)).astype(jnp.int32)
            tlogits, tcache = fwd_t(
                tparams, cfg_t, tcache, ttoks, tpos, tseq, tcell_row,
                jnp.ones(depth + 1, bool), None,
            )

            # 3) device verification (g[i] decides position base+i+1)
            if tsample:
                gk = jax.random.fold_in(key[0], rounds * (depth + 1) + r)
                g = jax.vmap(
                    lambda row_l, i: _device_draft_sample(
                        row_l, samp, jax.random.fold_in(gk, i)
                    )
                )(tlogits, jnp.arange(depth + 1))
            else:
                g = jnp.argmax(tlogits, axis=-1).astype(jnp.int32)
            matches = toks == g[:depth]
            m = jnp.sum(jnp.cumprod(matches.astype(jnp.int32))).astype(jnp.int32)
            bonus = g[m]
            new_base = base + m + 1

            # 4) drop rejected rows by index: draft row i holds pos base+i
            # (root..toks[depth-2]), keep i <= m (capped); target row i
            # holds pos base+i (root ++ drafted), keep i <= m.
            # Known trade (shared with device_loop's _reclaim convention):
            # on a FULL accept (m == depth) the draft never decoded
            # toks[depth-1], so the draft KV permanently lacks position
            # base+depth — one token in depth+1 of future draft context.
            # Output correctness is unaffected (the target verifies every
            # committed token); the cost is a possible acceptance dent on
            # real pairs. Closing it needs one extra draft forward per
            # round (decode toks[depth-1] at base+depth), ~1/depth more
            # draft time — left unpaid at the measured depths (8-32).
            dcache = _drop_rows(
                dcache, dcell_row, jnp.arange(depth) < jnp.minimum(m + 1, depth)
            )
            tcache = _drop_rows(tcache, tcell_row, jnp.arange(depth + 1) < m + 1)

            # output pack: sparse target rows ++ committed tokens ++ m
            lse = jax.scipy.special.logsumexp(tlogits, axis=-1)
            vals, ids = jax.lax.top_k(tlogits, topk)
            idx = jnp.arange(depth + 1)
            committed = jnp.where(idx < m, jnp.concatenate([toks, toks[-1:]]), 0)
            committed = jnp.where(idx == m, bonus, committed)
            mcol = jnp.zeros(depth + 1, jnp.int32).at[0].set(m)
            out = jnp.concatenate(
                [vals, ids.astype(jnp.float32), lse[:, None],
                 committed.astype(jnp.float32)[:, None],
                 mcol.astype(jnp.float32)[:, None]],
                axis=1,
            )
            return (dcache, tcache, bonus, new_base), out

        (dcache, tcache, bonus, new_base), out = jax.lax.scan(
            round_body, (dcache, tcache, root, base),
            (dcells, tcells, jnp.arange(rounds)),
        )
        return out, bonus, new_base, dcache, tcache

    return run


def launch(
    dft: InferenceContext,
    tgt: InferenceContext,
    *,
    root,  # int or device i32 scalar (previous run's bonus token)
    base,  # int or device i32 scalar (root's position)
    seq_id: int,  # the stream's committed sequence slot
    depth: int,
    topk: int,
    hint: int,  # host-side UPPER BOUND for this run's base (mirror hints)
    samp: tuple | None = None,
    tsample: bool = False,
    seed: int = 0,
    rounds: int = 1,
):
    """Dispatch one corrected run of R rounds. Returns
    (handle, bonus_dev, new_base_dev, dcells [R, depth], tcells [R, depth+1]).

    handle.fetch() -> list of R per-round tuples
    (m, committed tokens list [m+1], SparseLogits rows [depth+1]).
    May raise CacheFull (backpressure, cells untouched).
    Host mirrors get hint-based positions (upper bounds — actual base is
    device-resident until the fetch); the caller reconciles at retire."""
    dcells = dft.find_cells(rounds * depth).reshape(rounds, depth)
    tcells = tgt.find_cells(rounds * (depth + 1)).reshape(rounds, depth + 1)
    seq_row = kv.host_only(seq_id)
    dft.h_pos[dcells.reshape(-1)] = hint + np.arange(rounds * depth)
    dft.h_seq[dcells.reshape(-1)] = seq_row
    tgt.h_pos[tcells.reshape(-1)] = hint + np.arange(rounds * (depth + 1))
    tgt.h_seq[tcells.reshape(-1)] = seq_row
    dft._refresh_hot()
    tgt._refresh_hot()

    fn = _shared_corrected_spec(
        dft._forward, dft.cfg, tgt._forward, tgt.cfg, depth, topk,
        samp, tsample, rounds,
    )
    root_arg = root if hasattr(root, "dtype") else np.int32(root)
    base_arg = base if hasattr(base, "dtype") else np.int32(base)
    extra = ()
    if samp is not None:
        extra = (jax.random.PRNGKey(seed),)
    out, bonus, new_base, dft.cache, tgt.cache = fn(
        dft.params, dft.cache, tgt.params, tgt.cache,
        root_arg, base_arg, np.int32(seq_id),
        dcells.astype(np.int32), tcells.astype(np.int32), *extra,
    )

    def fetch(_out=out, _topk=topk, _d=depth, _r=rounds):
        host = np.asarray(_out)  # [R, depth+1, 2*topk+3]
        packs = []
        for r in range(_r):
            m = int(host[r, 0, 2 * _topk + 2])
            toks = host[r, : m + 1, 2 * _topk + 1].astype(np.int32).tolist()
            rows = [
                SparseLogits(
                    host[r, i, _topk : 2 * _topk].astype(np.int32),
                    host[r, i, :_topk],
                    float(host[r, i, 2 * _topk]),
                )
                for i in range(_d + 1)
            ]
            packs.append((m, toks, rows))
        return packs

    handle = AsyncHandle(logits=out, fetch=fetch, cells=tcells).start_fetch(
        tgt._fetch_pool
    )
    return handle, bonus, new_base, dcells, tcells


def reclaim(ctx: InferenceContext, cells, keep: int, base: int, seq_id: int):
    """Reconcile the host mirrors with the device truth for one retired
    run's cells: rows [0, keep) live at positions base+row on seq_id; the
    program freed the rest (the shared kv.reclaim_cells contract)."""
    kv.reclaim_cells(ctx, cells, keep, base, seq_id)
