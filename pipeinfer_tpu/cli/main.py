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


def build_context(model_path: str, n_cells: int, cache_dtype: str = "bf16",
                  need_tokenizer=True, lora: list[tuple[str, float]] | None = None):
    params, cfg = load_model(model_path)
    for adapter_path, scale in lora or []:
        from ..tools.lora import apply_lora

        params = apply_lora(params, adapter_path, scale)
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


def generate(ctx, tok, sampler: SamplerState, prompt_ids, n_predict, *,
             ignore_eos=False, stream=None, cached_prefix=0, n_keep=-1):
    """Greedy/sampled generation on sequence 0. Returns token ids.

    cached_prefix > 0 skips prefilling that many prompt tokens (their cells
    were restored from a session file). When the cell array fills, the
    context SLIDES: the first n_keep positions stay, half of the rest is
    discarded and the tail shifts down with K re-rotation (ref: main.cpp
    context swapping n_keep/n_discard + llama_kv_cache_seq_shift; infinite
    generation via --keep)."""
    batch = Batch()
    start = min(cached_prefix, len(prompt_ids) - 1)  # always decode the last
    for i in range(start, len(prompt_ids)):
        batch.add(prompt_ids[i], i, 0, want_logits=(i == len(prompt_ids) - 1))
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
        if ctx.n_free_cells < 1:
            # context full: slide the window (ref: main.cpp "context
            # swapping" — keep n_keep, discard half of the rest)
            keep = len(prompt_ids) if n_keep < 0 else min(n_keep, n_past - 2)
            n_discard = max(1, (n_past - keep) // 2)
            ctx.seq_rm(0, keep, keep + n_discard)
            ctx.seq_shift(0, keep + n_discard, n_past, -n_discard)
            n_past -= n_discard
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
    p.add_argument("--in-prefix", default=None,
                   help="fill-in-middle: code before the cursor (ref: examples/infill)")
    p.add_argument("--in-suffix", default=None,
                   help="fill-in-middle: code after the cursor")
    p.add_argument(
        "--prompt-cache",
        default="",
        help="session file: reuse/extend a cached prompt prefill "
        "(ref: main --prompt-cache + llama session files)",
    )
    p.add_argument("--lora", action="append", default=[], metavar="GGUF",
                   help="apply a LoRA adapter at load (ref: --lora; repeatable)")
    p.add_argument("--lora-scaled", action="append", default=[], nargs=2,
                   metavar=("GGUF", "S"), help="LoRA adapter with scale S")
    p.add_argument("--keep", type=int, default=-1,
                   help="tokens to keep when the context window slides "
                   "(-1 = whole prompt; ref: main --keep)")
    p.add_argument("--logdir", default="",
                   help="write a YAML run dump to this directory "
                   "(ref: main --logdir dump_non_result_info_yaml)")
    p.add_argument("--profile", default="", metavar="DIR",
                   help="capture an XLA op-level trace of the run to DIR, "
                   "viewable in TensorBoard/Perfetto (the GGML_PERF "
                   "counterpart, ref: llama.cpp:5720-5724)")
    args = p.parse_args(argv)

    lora = [(f, 1.0) for f in args.lora] + [(f, float(s)) for f, s in args.lora_scaled]
    ctx, tok = build_context(args.model, args.ctx_size, args.cache_dtype, lora=lora)
    sp = sampling_from_args(args)
    sampler = SamplerState(params=sp)
    if args.grammar or args.grammar_file:
        from ..sampling.grammar import grammar_state_from_gbnf

        text = args.grammar or open(args.grammar_file).read()
        sampler.grammar = grammar_state_from_gbnf(text, tok)

    prompt = read_prompt(args)
    if args.in_prefix is not None or args.in_suffix is not None:
        v = tok.vocab
        if v.fim_pre < 0 or v.fim_suf < 0 or v.fim_mid < 0:
            raise SystemExit("error: this model's vocab has no fill-in-middle tokens")
        ids = (
            [v.bos_id, v.fim_pre]
            + tok.encode(args.in_prefix or "", add_bos=False)
            + [v.fim_suf]
            + tok.encode(args.in_suffix or "", add_bos=False)
            + [v.fim_mid]
        )
    else:
        ids = tok.encode(prompt, add_bos=True)
    for t in ids:
        sampler.accept(t, apply_grammar=False)
    if not args.no_display_prompt:
        sys.stdout.write(tok.decode(ids))
        sys.stdout.flush()

    from ..tokenizer.stream import StreamDecoder

    sdec = StreamDecoder(tok)

    def stream(token_id):
        sys.stdout.write(sdec.feed(token_id))
        sys.stdout.flush()

    # prompt cache: skip re-prefilling a previously saved matching prompt
    # (ref: examples/main session logic)
    cached_prefix = 0
    if args.prompt_cache:
        import os

        from ..runtime import state as rstate

        if os.path.exists(args.prompt_cache):
            try:
                cached = rstate.load_state(ctx, args.prompt_cache) or []
                if cached[: len(ids)] == ids[: len(cached)]:
                    # keep at most len(ids)-1 cells; the final prompt token is
                    # re-decoded to produce fresh logits (drop newer cells)
                    cached_prefix = min(len(cached), len(ids) - 1)
                    ctx.seq_rm(0, cached_prefix, -1)
                else:
                    ctx.clear_cache()
            except ValueError as e:
                print(f"prompt-cache ignored: {e}", file=sys.stderr)

    import contextlib

    prof = contextlib.nullcontext()
    if args.profile:
        import jax

        prof = jax.profiler.trace(args.profile)
    with prof:
        out = generate(
            ctx, tok, sampler, ids, args.n_predict,
            ignore_eos=args.ignore_eos, stream=stream, cached_prefix=cached_prefix,
            n_keep=args.keep,
        )
    if args.profile:
        print(f"profile trace -> {args.profile}", file=sys.stderr)
    if args.prompt_cache:
        from ..runtime import state as rstate

        rstate.save_state(ctx, args.prompt_cache, tokens=ids + out)
    sys.stdout.write("\n")
    ctx.print_timings(lambda s: print(s, file=sys.stderr))
    if args.logdir:
        from ..utils.rundump import dump_run_yaml

        path = dump_run_yaml(args.logdir, args=vars(args), prompt_ids=ids,
                             output_ids=out, output_text=tok.decode(out), ctx=ctx)
        print(f"run dump: {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
