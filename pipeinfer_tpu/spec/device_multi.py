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
from .params import SpecParams
from .sync_spec import SpecStats


def _rm_stream_tails(cache: kv.KVCache, bases: jax.Array, n_streams: int) -> kv.KVCache:
    """Vectorized per-stream tail rollback: free every cell that belongs to
    stream s at pos >= bases[s], for all s at once. Loop-written cells are
    single-membership (each belongs to exactly its stream), so clearing the
    whole seq row of a hit cell is exact; committed prompt cells sit at
    pos < bases[s] and are never hit. (Per-seq counterpart of kv.rm_tail —
    ref: llama_kv_cache_seq_rm per seq, llama.cpp:9245-9268.)"""
    hit = jnp.zeros(cache.pos.shape, bool)
    for s in range(n_streams):  # static unroll: S small, one mask op each
        hit |= kv._member(cache.seq, jnp.int32(s)) & (cache.pos >= bases[s])
    new_seq = jnp.where(hit[:, None], jnp.uint32(0), cache.seq)
    new_pos = jnp.where(hit, -1, cache.pos)
    return dataclasses.replace(cache, pos=new_pos, seq=new_seq)


@functools.lru_cache(maxsize=None)
def _shared_batched_loop(fwd_d, cfg_d, fwd_t, cfg_t, depth, rounds, n_streams,
                         dsamp=None, tsample=False):
    """S-stream R-round speculative loop program (device_loop's
    _shared_device_loop with a stream axis). Stream s uses sequence slot s.

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
        seqs = jnp.arange(S, dtype=jnp.int32)

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
            dcache = _rm_stream_tails(dcache, new_bases, S)
            tcache = _rm_stream_tails(tcache, new_bases, S)

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
        # device PRNG base: the user's seed, or REAL entropy when unseeded —
        # `(seed or 0)` would alias seed=0 with unseeded AND make unseeded
        # stochastic runs replay the same Gumbel draws every call
        if self._seed is not None:
            self._seed_base = self._seed
        else:
            import os

            self._seed_base = int.from_bytes(os.urandom(4), "little")

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
        flat = np.asarray(cells).reshape(-1)
        if keep:
            ctx.h_pos[flat[:keep]] = base + np.arange(keep)
            ctx.h_seq[flat[:keep]] = kv.host_only(seq)
        ctx.h_pos[flat[keep:]] = -1
        ctx.h_seq[flat[keep:]] = 0
