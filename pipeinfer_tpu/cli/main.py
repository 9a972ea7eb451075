"""`pipeinfer` — single-model generation CLI (ref: examples/main/main.cpp):
tokenize → prefill → sample/decode loop → detokenize, with the full
sampler chain and streaming output."""

from __future__ import annotations

import argparse
import sys

import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..models import load_model
from ..runtime.context import Batch, InferenceContext
from ..sampling.samplers import SamplerState
from ..tokenizer import tokenizer_from_gguf
from .args import add_gen_args, add_model_args, add_sampling_args, read_prompt, sampling_from_args


def build_context(model_path: str, n_cells: int, cache_dtype: str = "bf16", need_tokenizer=True):
    params, cfg = load_model(model_path)
    tok = None
    with GGUFReader(model_path) as r:
        try:
            tok = tokenizer_from_gguf(r)
        except (KeyError, ValueError):
            if need_tokenizer:
                raise SystemExit(f"error: {model_path} has no tokenizer vocabulary")
    ctx = InferenceContext(
        params,
        cfg,
        n_cells=n_cells,
        cache_dtype=jnp.bfloat16 if cache_dtype == "bf16" else jnp.float32,
    )
    return ctx, tok


def generate(ctx, tok, sampler: SamplerState, prompt_ids, n_predict, *, ignore_eos=False, stream=None):
    """Greedy/sampled generation on sequence 0. Yields token ids."""
    batch = Batch()
    for i, t in enumerate(prompt_ids):
        batch.add(t, i, 0, want_logits=(i == len(prompt_ids) - 1))
    logits = ctx.decode(batch)[-1]
    out = []
    n_past = len(prompt_ids)
    for _ in range(n_predict):
        token = _sample_step(sampler, logits)
        out.append(token)
        if stream:
            stream(token)
        if not ignore_eos and token == tok.vocab.eos_id:
            break
        batch.clear()
        batch.add(token, n_past, 0)
        logits = ctx.decode(batch)[0]
        n_past += 1
    return out


def _sample_step(sampler: SamplerState, logits: np.ndarray) -> int:
    from ..sampling.samplers import sample

    token = sample(sampler, logits)
    sampler.accept(token)
    return token


def main(argv=None):
    p = argparse.ArgumentParser("pipeinfer", description=__doc__)
    add_model_args(p)
    add_gen_args(p)
    add_sampling_args(p)
    args = p.parse_args(argv)

    ctx, tok = build_context(args.model, args.ctx_size, args.cache_dtype)
    sp = sampling_from_args(args)
    sampler = SamplerState(params=sp)
    if args.grammar or args.grammar_file:
        from ..sampling.grammar import grammar_state_from_gbnf

        text = args.grammar or open(args.grammar_file).read()
        sampler.grammar = grammar_state_from_gbnf(text, tok)

    prompt = read_prompt(args)
    ids = tok.encode(prompt, add_bos=True)
    for t in ids:
        sampler.accept(t, apply_grammar=False)
    if not args.no_display_prompt:
        sys.stdout.write(tok.decode(ids))
        sys.stdout.flush()

    def stream(token_id):
        sys.stdout.write(tok.piece(token_id))
        sys.stdout.flush()

    generate(ctx, tok, sampler, ids, args.n_predict, ignore_eos=args.ignore_eos, stream=stream)
    sys.stdout.write("\n")
    ctx.print_timings(lambda s: print(s, file=sys.stderr))
    return 0


if __name__ == "__main__":
    sys.exit(main())
