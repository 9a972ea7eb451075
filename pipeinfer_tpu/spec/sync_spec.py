"""Lock-step tree speculation — the "Speculative" baseline.

Re-implementation of the reference's synchronous speculative example
(ref: examples/speculative_orig/speculative.cpp): draft a token tree,
decode it in one target batch (the root "safety" token at position n_past
plus tree tokens at n_past+1+depth), verify greedily along matching
branches, commit the winning branch's KV cells to sequence 0, roll back the
rest. Produces identical tokens to plain decoding for deterministic
sampling (golden-equivalence enforced in tests).

Position invariants (cleaner than the reference's n_past juggling):
- before a round, cells [0, n_past) are committed on seq 0;
- the round's root token r (already sampled, not yet decoded) is written at
  position n_past with seq list {0} ∪ branches;
- branch tokens at depth d are written at n_past+1+d on their branch seqs;
- logits[0] verifies depth 0; branch.i_batch_tgt[d] verifies depth d+1.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..runtime.context import Batch, InferenceContext
from ..sampling.samplers import SamplerState, SamplingParams, sample
from . import drafting
from .params import SpecParams


@dataclasses.dataclass
class SpecStats:
    n_drafted: int = 0
    n_accept: int = 0
    n_predict: int = 0
    n_rounds: int = 0
    # drafted tokens whose runs were still in flight when generation hit its
    # stop condition — never verified (the async pipeline's tail waste; with
    # deep chains and short generations this dominates the naive accept %)
    n_drafted_unverified: int = 0

    @property
    def accept_rate(self) -> float:
        """Acceptance over ALL drafted tokens (the reference's accept %,
        ref: speculative.cpp:712-730)."""
        return self.n_accept / max(self.n_drafted, 1)

    @property
    def accept_rate_decided(self) -> float:
        """Acceptance over drafted tokens that actually reached
        verification — draft quality, untangled from pipeline tail waste."""
        return self.n_accept / max(self.n_drafted - self.n_drafted_unverified, 1)


def draft_sampler_proto(user: SamplingParams) -> SamplerState:
    """Draft sampling needs full candidate probs even in deterministic mode
    ("greedy with probs", ref: sampling.cpp:172-175, speculative.cpp:274)."""
    p = dataclasses.replace(user, temp=-1.0 if user.temp <= 0 else user.temp)
    return SamplerState(params=p)


class SyncSpeculator:
    def __init__(
        self,
        ctx_tgt: InferenceContext,
        ctx_dft: InferenceContext,
        sampling: SamplingParams,
        sp: SpecParams,
        *,
        eos_id: int = 2,
        grammar=None,
    ):
        self.ctx_tgt = ctx_tgt
        self.ctx_dft = ctx_dft
        self.sampling = sampling
        self.sp = sp
        self.eos_id = eos_id
        self.grammar = grammar
        self.stats = SpecStats()
        # sparse logits head (same gating as the async controller): host
        # fetch bandwidth over the tunnel bounds decode, so ship top-K +
        # normalizer instead of full vocab rows when samplers allow it
        self.topk: int | None = None
        if sampling.mirostat == 0 and not sampling.logit_bias and grammar is None:
            self.topk = 128

    def generate(self, prompt_ids: list[int], n_predict: int, *, ignore_eos=False, stream=None):
        tgt, dft, sp = self.ctx_tgt, self.ctx_dft, self.sp
        sampler = SamplerState(params=self.sampling, grammar=self.grammar)
        for t in prompt_ids:
            sampler.accept(t, apply_grammar=False)

        # prefill both models on seq 0
        b = Batch()
        for i, t in enumerate(prompt_ids):
            b.add(t, i, 0, want_logits=(i == len(prompt_ids) - 1))
        logits = tgt.decode(b, self.topk)[-1]
        dft.decode(b)
        n_past = len(prompt_ids)

        root = sample(sampler, logits)
        sampler.accept(root)
        generated = [root]
        if stream:
            stream(root)
        self.stats.n_predict += 1
        if not ignore_eos and root == self.eos_id:
            return generated

        proto = draft_sampler_proto(self.sampling)
        seq_offset = 1  # branches on seqs 1..n_parallel

        while len(generated) < n_predict:
            self.stats.n_rounds += 1
            # per-round sampler snapshot for the draft branches
            # (ref: llama_sampling_cp before drafting)
            proto.prev = list(sampler.prev)
            proto.grammar = sampler.grammar.copy() if sampler.grammar is not None else None
            branches = drafting.new_branches(sp.n_parallel, proto)
            # branch seqs inherit the committed prefix [0, n_past) and the
            # root cell written below
            for s in range(sp.n_parallel):
                tgt.seq_rm(s + seq_offset, 0, -1)
                dft.seq_rm(s + seq_offset, 0, -1)
                tgt.seq_cp(0, s + seq_offset, 0, n_past)
                dft.seq_cp(0, s + seq_offset, 0, n_past)

            batch_tgt = Batch()
            batch_tgt.add(root, n_past, [0] + [s + seq_offset for s in range(sp.n_parallel)])

            n_drafted, _ = drafting.draft_tree(
                dft,
                sp,
                branches,
                root,
                None,
                seq_offset=seq_offset,
                dft_base=n_past,
                tgt_base=n_past + 1,
                batch_tgt=batch_tgt,
                topk=self.topk,
                seed=self.stats.n_rounds,
            )
            self.stats.n_drafted += n_drafted
            for br in branches:
                if br.tokens:
                    br.tokens.pop(0)  # strip chained root

            logits = tgt.decode(batch_tgt, self.topk)

            # verify
            # verify the round to its NATURAL end (mismatch or drafts
            # exhausted) — the reference keeps matching even once n_predict
            # or EOS is reached (speculative_orig:282-310 only breaks the
            # outer loop afterwards), so accepts in the final round count;
            # stopping at the n_predict boundary undercounts acceptance
            alive = [s for s in range(sp.n_parallel) if branches[s].active]
            idx = 0  # logits index for the next position
            depth = 0
            s_keep = 0
            hit_eos = False
            new_tokens: list[int] = []
            while True:
                t = sample(sampler, logits[idx])
                sampler.accept(t)
                new_tokens.append(t)
                if not ignore_eos and t == self.eos_id:
                    hit_eos = True
                matches = [
                    s for s in alive if depth < len(branches[s].tokens) and branches[s].tokens[depth] == t
                ]
                if not matches:
                    break
                alive = matches
                s_keep = matches[0]
                self.stats.n_accept += 1
                idx = branches[s_keep].i_batch_tgt[depth]
                depth += 1

            m = depth  # matched draft tokens
            self.stats.n_predict += len(new_tokens)
            if hit_eos:
                # emit nothing the round verified past the EOS
                new_tokens = new_tokens[: new_tokens.index(self.eos_id) + 1]
            generated.extend(new_tokens)
            if stream:
                for t in new_tokens:
                    stream(t)

            # KV consolidation (ref: speculative_orig rollback / our scheme)
            if m > 0:
                tgt.seq_cp(s_keep + seq_offset, 0, n_past + 1, n_past + 1 + m)
            # draft-side: the root cell at n_past lives on the winning branch
            # seq (it was decoded there), commit it together with matches
            dft.seq_cp(s_keep + seq_offset, 0, n_past, n_past + 1 + m)
            for s in range(sp.n_parallel):
                tgt.seq_rm(s + seq_offset, 0, -1)
                dft.seq_rm(s + seq_offset, 0, -1)

            n_past += 1 + m
            root = generated[-1]
            if hit_eos:
                break

        # a final round may overshoot n_predict (the reference emits the
        # overshoot too; callers here expect at most n_predict)
        return generated[:n_predict]
