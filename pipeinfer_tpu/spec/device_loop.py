"""Device-resident speculative decode: R full speculative rounds in ONE
XLA program, with verification and the continuation decision on device.

The async controller (spec/controller.py) mirrors the reference's
host-driven state machine: the host drafts/launches runs, fetches logits,
verifies, and cancels stale work (ref: examples/speculative/speculative.cpp
main loop :316-679). On a single chip that shape leaves two costs on the
table: (a) canceled chained runs are pure dead device time (the assumed
frontier diverges ~once per mismatch), and (b) every verify round-trips to
the host (~30 ms on tunneled runtimes). The TPU-native answer is to keep
the WHOLE speculative loop under jit:

    per round (lax.scan):
      1. draft-chain `depth` tokens from the current root (draft model);
      2. batch-decode [root ++ drafted] on the target — one weight pass;
      3. verify ON DEVICE: greedy mode compares drafted tokens against the
         target argmax; stochastic mode samples the target row-wise via
         full-vocab Gumbel-max (every committed token is a true target
         sample, so the output distribution equals sequential sampling);
      4. commit the matched prefix + the bonus token, invalidate the
         rejected tokens' KV cells (kv.rm_tail with the traced frontier),
         and continue the next round from the bonus token.

    The dispatch returns a [R, depth+2] pack (committed tokens + accept
    count per round) plus the chained (root, base) device scalars, so
    back-to-back dispatches never wait on a host fetch.

There is NO dead cross-round work (each round drafts from the true
frontier) and the host touches the loop once per R rounds. This is the
single-chip fast engine; the async controller remains the multi-chip /
multi-stream topology (its pipelining exists to hide inter-node latency,
which a single-chip loop does not have).
"""

from __future__ import annotations

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime import kv_cache as kv
from ..runtime.context import Batch, InferenceContext, _device_draft_sample
from .params import SpecParams, entropy_seed
from .sync_spec import SpecStats


@functools.lru_cache(maxsize=None)
def _shared_device_loop(fwd_d, cfg_d, fwd_t, cfg_t, depth, rounds,
                        dsamp=None, tsample=False):
    """R-round speculative loop program.

    dsamp: (temp, top_k, top_p, min_p) for stochastic DRAFTING (None =
    greedy argmax). tsample: sample the TARGET via full-vocab Gumbel-max
    (temp folded into dsamp[0]); False = greedy argmax verification.
    """

    @functools.partial(jax.jit, donate_argnums=(1, 3))
    def loop(dparams, dcache, tparams, tcache, root, base, dcells, tcells, *key):
        # dcells [R, depth]; tcells [R, depth+1]; root/base i32 scalars
        seq0 = jnp.int32(0)

        def round_body(carry, xs):
            dcache, tcache, root, base = carry
            dcell_row, tcell_row, r = xs

            # 1) draft chain from root (root decoded at `base`)
            def draft_step(c, i):
                dcache, tok, pos = c
                logits, dcache = fwd_d(
                    dparams, cfg_d, dcache,
                    tok[None], pos[None], seq0[None], dcell_row[i][None],
                    jnp.ones(1, bool), None,
                )
                if dsamp is None:
                    nxt = jnp.argmax(logits[0]).astype(jnp.int32)
                else:
                    nxt = _device_draft_sample(
                        logits[0], dsamp,
                        jax.random.fold_in(jax.random.fold_in(key[0], r), i),
                    )
                return (dcache, nxt, pos + 1), nxt

            (dcache, _, _), toks = jax.lax.scan(
                draft_step, (dcache, root, base), jnp.arange(depth)
            )

            # 2) one target pass over [root ++ drafted]
            ttoks = jnp.concatenate([root[None], toks])
            tpos = base + jnp.arange(depth + 1, dtype=jnp.int32)
            tlogits, tcache = fwd_t(
                tparams, cfg_t, tcache, ttoks, tpos,
                jnp.zeros(depth + 1, jnp.int32), tcell_row,
                jnp.ones(depth + 1, bool), None,
            )

            # 3) on-device verification: g[i] decides position base+i+1.
            # Stochastic mode samples each target row through the user's
            # (temp, top_k, top_p, min_p) chain — every committed token is
            # a true target sample, so the output distribution equals
            # sequential target sampling (token-matching verification,
            # like the reference's speculative.cpp:509-585)
            if tsample:
                gk = jax.random.fold_in(jax.random.fold_in(key[0], r), depth + 7)
                g = jax.vmap(
                    lambda row_l, i: _device_draft_sample(
                        row_l, dsamp, jax.random.fold_in(gk, i)
                    )
                )(tlogits, jnp.arange(depth + 1))
            else:
                g = jnp.argmax(tlogits, axis=-1).astype(jnp.int32)
            matches = toks == g[:depth]
            m = jnp.sum(jnp.cumprod(matches.astype(jnp.int32))).astype(jnp.int32)
            bonus = g[m]
            new_base = base + m + 1

            # 4) roll back rejected cells on BOTH caches (pos >= new_base);
            # the bonus token is not in either cache yet — next round's
            # draft decodes it at new_base, the target in its batch
            dcache = kv.rm_tail(dcache, new_base)
            tcache = kv.rm_tail(tcache, new_base)

            # pack row: [m accepted tokens ++ bonus at slot m ++ zeros], m
            idx = jnp.arange(depth + 1)
            vals = jnp.where(idx < m, jnp.concatenate([toks, toks[-1:]]), 0)
            vals = jnp.where(idx == m, bonus, vals)
            row = jnp.concatenate([vals, m[None]])
            return (dcache, tcache, bonus, new_base), row

        (dcache, tcache, root, base), pack = jax.lax.scan(
            round_body, (dcache, tcache, root, base),
            (dcells, tcells, jnp.arange(rounds)),
        )
        return pack, root, base, dcache, tcache

    return loop


def supported(sampling, grammar=None) -> bool:
    """Single-sequence, stateless-sampler generations only: greedy, or a
    pure (temp, top_k, top_p, min_p) chain — penalties/mirostat/grammar
    keep the async controller's host verification. Stochastic mode samples
    the TARGET on device through the same chain, so top_k must be a real
    bound (the device sampler works within the top-64 candidates) and
    tfs/typical must be off."""
    no_pen = sampling.penalty_last_n == 0 or (
        sampling.penalty_repeat == 1.0
        and sampling.penalty_freq == 0.0
        and sampling.penalty_present == 0.0
    )
    base_ok = (
        no_pen
        and sampling.mirostat == 0
        and not sampling.logit_bias
        and grammar is None
    )
    if not base_ok:
        return False
    if sampling.temp <= 0:
        return True
    return (
        0 < sampling.top_k <= 64
        and sampling.tfs_z >= 1.0
        and sampling.typical_p >= 1.0
    )


class DeviceLoopEngine:
    """Single-chip speculative decode engine with the verify loop on device.

    Same model pair and golden-token semantics as the controller (greedy
    output is bit-identical to plain decoding); stochastic mode samples the
    target on device (full-vocab Gumbel), which IS sequential target
    sampling — seeded runs are reproducible."""

    def __init__(
        self,
        ctx_tgt: InferenceContext,
        ctx_dft: InferenceContext,
        sampling,
        sp: SpecParams,
        *,
        eos_id: int = 2,
        rounds: int = 8,
    ):
        if getattr(ctx_tgt, "mesh", object()) is not None or \
                getattr(ctx_dft, "mesh", object()) is not None:
            raise ValueError("DeviceLoopEngine needs single-device contexts")
        if not supported(sampling):
            raise ValueError("sampler chain needs host verification; use the controller")
        self.tgt = ctx_tgt
        self.dft = ctx_dft
        self.sampling = sampling
        self.sp = sp
        self.eos_id = eos_id
        self.rounds = rounds
        self.stats = SpecStats()
        self._seed = sampling.seed if sampling.seed >= 0 else None
        self._seed_base = entropy_seed(self._seed)

    def _loop_fn(self, depth: int):
        from . import fused

        dsamp = fused.draft_samp(self.sampling)
        tsample = self.sampling.temp > 0
        return _shared_device_loop(
            self.dft._forward, self.dft.cfg, self.tgt._forward, self.tgt.cfg,
            depth, self.rounds, dsamp, tsample,
        )

    def generate(self, prompt_ids, n_predict, *, ignore_eos=False, stream=None):
        from ..runtime.context import CacheFull

        t0 = time.perf_counter()
        depth = self.sp.n_draft
        loop = self._loop_fn(depth)
        R = self.rounds

        # prefill both models (one batch each); the target's last-row
        # SPARSE pack gives the first root token (a full-vocab f32 fetch is
        # ~4 MB / ~90 ms on the tunnel; the top-128 pack is enough for both
        # greedy and the supported stochastic chains). topk=128 matches the
        # controller's head width, so the step variant is already warm —
        # a novel topk value would cold-compile for minutes on this
        # machine's remote compile service. The draft's logits are
        # discarded (cells only) — dispatch async, never block on it.
        topk = min(128, self.tgt.cfg.n_vocab)
        b = Batch()
        for i, t in enumerate(prompt_ids):
            b.add(t, i, 0, want_logits=(i == len(prompt_ids) - 1))
        dh = self.dft.decode_async(b, topk=min(128, self.dft.cfg.n_vocab))
        tlog = self.tgt.decode(b, topk=topk)
        if self.sampling.temp > 0:
            # first token: host sampler over the same chain
            from ..sampling.samplers import SamplerState, sample

            hs = SamplerState(params=self.sampling)
            root = int(sample(hs, tlog[-1]))
        else:
            root = int(tlog[-1].ids[0])  # sparse pack, ids sorted by value
        del dh  # draft prefill result intentionally unused
        self.t_prefill = time.perf_counter() - t0

        generated = [root]
        if stream:
            stream(root)
        if n_predict <= 1 or (not ignore_eos and root == self.eos_id):
            self.t_decode = time.perf_counter() - t0
            self.stats.n_predict = len(generated[:n_predict])
            return generated[:n_predict]
        base = len(prompt_ids)  # root's position (committed, not yet decoded)
        root_dev, base_dev = np.int32(root), np.int32(base)
        key_i = 0
        t_dec0 = time.perf_counter()

        inflight = []  # (pack_future, dcells [R, d], tcells [R, d+1])
        MAX_INFLIGHT = 2
        host_base = base  # true committed frontier (reconciled per fetch)

        # pin the hot bucket ONCE for the whole generation: the loop's peak
        # cell usage is known up front, and letting _refresh_hot cross a
        # bucket boundary mid-generation would swap in a second compiled
        # variant (a warm deserialization costs ~1s in the decode's
        # critical path). dispatch() below therefore skips _refresh_hot.
        peak = base + n_predict + MAX_INFLIGHT * R * (2 * depth + 1) + 1
        for ctx in (self.tgt, self.dft):
            pool = ctx.trash_cell + 1
            hot = 512
            while hot < min(peak, pool):
                hot *= 2
            if pool <= 512 or hot >= pool:
                hot = 0  # stream the whole pool
            if ctx.cache.hot != hot:
                ctx.cache = dataclasses.replace(ctx.cache, hot=hot)

        def dispatch() -> bool:
            nonlocal root_dev, base_dev, key_i
            try:
                dcells = self.dft.find_cells(R * depth).reshape(R, depth)
                tcells = self.tgt.find_cells(R * (depth + 1)).reshape(R, depth + 1)
            except CacheFull:
                return False
            hint = host_base + len(inflight) * R * (depth + 1)
            self.dft.h_pos[dcells.reshape(-1)] = hint + np.arange(R * depth)
            self.dft.h_seq[dcells.reshape(-1)] = kv.host_only(0)
            self.tgt.h_pos[tcells.reshape(-1)] = hint + np.arange(R * (depth + 1))
            self.tgt.h_seq[tcells.reshape(-1)] = kv.host_only(0)
            # hot stays at the per-generation pin (see above): no
            # _refresh_hot here, or a smaller runtime bucket would swap
            # executables mid-decode
            extra = ()
            if self.sampling.temp > 0:
                extra = (jax.random.PRNGKey(self._seed_base * 9176 + key_i),)
                key_i += 1
            pack, root2, base2, self.dft.cache, self.tgt.cache = loop(
                self.dft.params, self.dft.cache, self.tgt.params, self.tgt.cache,
                root_dev, base_dev, dcells.astype(np.int32), tcells.astype(np.int32),
                *extra,
            )
            fut = self.tgt._fetch_pool.submit(lambda p=pack: np.asarray(p))
            inflight.append((fut, dcells, tcells))
            root_dev, base_dev = root2, base2
            return True

        stop = False
        while not stop:
            while len(inflight) < MAX_INFLIGHT and (
                # don't over-dispatch: if the in-flight packs' UPPER BOUND
                # already covers the remaining tokens, wait for evidence
                # (an extra pack is pure tail waste that the drain would
                # otherwise sit behind on the device queue)
                len(generated) + len(inflight) * R * (depth + 1) < n_predict
                or not inflight
            ):
                if not dispatch():
                    break
            if not inflight:
                raise RuntimeError("device loop could not dispatch (KV cache too small)")
            fut, dcells, tcells = inflight.pop(0)
            host_pack = fut.result()  # [R, depth+2]
            self.stats.n_rounds += R
            for r in range(R):
                m = int(host_pack[r, depth + 1])
                toks = host_pack[r, : m + 1].tolist()
                self.stats.n_drafted += depth
                self.stats.n_accept += m
                # reconcile host mirrors with the TRUE device state: draft
                # kept rows 0..min(m, depth-1) (root..t_m), target kept rows
                # 0..m (root + accepted); both at positions host_base + i
                self._reclaim(self.dft, dcells[r], keep=min(m + 1, depth),
                              base=host_base)
                self._reclaim(self.tgt, tcells[r], keep=m + 1, base=host_base)
                host_base += m + 1
                for t in toks:
                    generated.append(int(t))
                    if stream:
                        stream(int(t))
                    if len(generated) >= n_predict or (
                        not ignore_eos and t == self.eos_id
                    ):
                        stop = True
                        break
                if stop:
                    # rounds after the stop point were never consumed:
                    # count their drafts as unverified tail waste
                    tail = (R - 1 - r) * depth
                    self.stats.n_drafted += tail
                    self.stats.n_drafted_unverified += tail
                    break

        # drain: discard any still-inflight packs (tail waste) and free
        # their cells WITHOUT waiting on the fetch — the device work is
        # unabortable but nothing here needs its result, and the final
        # rm_tail below is queued behind it in device order anyway
        for fut, dcells, tcells in inflight:
            self._reclaim(self.dft, dcells.reshape(-1), keep=0, base=0)
            self._reclaim(self.tgt, tcells.reshape(-1), keep=0, base=0)
            self.stats.n_drafted += R * depth
            self.stats.n_drafted_unverified += R * depth
        # roll back everything past the committed frontier (device + host)
        out = generated[:n_predict]
        final = len(prompt_ids) + len(out)
        self.tgt.rm_tail(final)
        self.dft.rm_tail(final)
        self.t_decode = time.perf_counter() - t_dec0
        self.stats.n_predict = len(out)
        return out

    def _reclaim(self, ctx: InferenceContext, cells, keep: int, base: int):
        """Host-mirror reconcile for one round's cells: rows [0, keep) are
        live at positions base+row; the device invalidated the rest."""
        kv.reclaim_cells(ctx, cells, keep, base)
