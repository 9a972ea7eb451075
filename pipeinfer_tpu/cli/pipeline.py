"""`pipeinfer-pipeline` — single model across pipeline stages
(ref: examples/mpi/mpi.cpp, the "Sequential" benchmark baseline): generation
over a layer-split pipeline with a weighted --layer-split, driven by the
host-side stage engine instead of mpirun ranks."""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp

from ..models import load_model
from ..parallel.stages import StagedInferenceContext
from ..runtime.context import Batch
from ..sampling.samplers import SamplerState, sample
from ..gguf.reader import GGUFReader
from ..tokenizer import tokenizer_from_gguf
from .args import add_gen_args, add_model_args, add_sampling_args, read_prompt, sampling_from_args


def main(argv=None):
    p = argparse.ArgumentParser("pipeinfer-pipeline", description=__doc__)
    add_model_args(p)
    add_gen_args(p)
    add_sampling_args(p)
    p.add_argument(
        "--layer-split",
        default="",
        help="comma-separated stage weights (the --mpi-layer-split fractions,"
        " e.g. 0.1,0.45,0.45); default = even split over available devices",
    )
    p.add_argument("--stages", type=int, default=0, help="number of stages (default: all devices)")
    args = p.parse_args(argv)

    import os

    if not os.environ.get("PIPEINFER_NO_COMPILE_CACHE"):
        from ..utils.compile_cache import enable

        enable()
    params, cfg = load_model(args.model)
    with GGUFReader(args.model) as r:
        tok = tokenizer_from_gguf(r)

    devices = jax.devices()
    n_stages = args.stages or len(devices)
    split = [float(x) for x in args.layer_split.split(",") if x] or None
    if split and len(split) != n_stages:
        n_stages = len(split)
    ctx = StagedInferenceContext(
        params,
        cfg,
        n_cells=args.ctx_size,
        devices=(devices * n_stages)[:n_stages],
        split=split,
        cache_dtype=jnp.bfloat16 if args.cache_dtype == "bf16" else jnp.float32,
    )
    print(
        f"pipeline: {n_stages} stages, layer ranges {ctx.ranges} over "
        f"{[str(d) for d in ctx.devices]}",
        file=sys.stderr,
    )

    sampler = SamplerState(params=sampling_from_args(args))
    ids = tok.encode(read_prompt(args), add_bos=True)
    for t in ids:
        sampler.accept(t, apply_grammar=False)
    if not args.no_display_prompt:
        sys.stdout.write(tok.decode(ids))
        sys.stdout.flush()

    b = Batch()
    for i, t in enumerate(ids):
        b.add(t, i, 0, want_logits=(i == len(ids) - 1))
    logits = ctx.decode(b)[-1]
    pos = len(ids)
    from ..tokenizer.stream import StreamDecoder

    sdec = StreamDecoder(tok)
    for _ in range(args.n_predict):
        t = sample(sampler, logits)
        sampler.accept(t)
        sys.stdout.write(sdec.feed(t))
        sys.stdout.flush()
        if not args.ignore_eos and t == tok.vocab.eos_id:
            break
        b.clear()
        b.add(t, pos, 0)
        logits = ctx.decode(b)[0]
        pos += 1
    sys.stdout.write("\n")
    ctx.print_timings(lambda s: print(s, file=sys.stderr))
    return 0


if __name__ == "__main__":
    sys.exit(main())
