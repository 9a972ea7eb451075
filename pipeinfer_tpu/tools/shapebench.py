"""Shape-faithful performance probe: synthesizes quantized models of real
production shapes (7B target / 1.1B draft / ...) directly in device memory
(random packed planes — no GGUF build, no host quantization) and measures
the decode-path step times against the HBM roofline.

This is the MFU/bandwidth instrument the reference lacks; its closest
counterparts are llama-bench (examples/llama-bench/llama-bench.cpp) and
benchmark-matmult. Single-token decode of a quantized model is HBM-bound:
every step must stream the full packed weight bytes, so

    bandwidth utilization = packed_bytes / (step_time * PEAK_BW)

is the honest "percent of roofline" figure (MFU is ~0 by construction at
batch 1; we report it too for the batched verify shapes where the MXU
starts to matter).

Usage: python -m pipeinfer_tpu.tools.shapebench [--model 7b] [--json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

SHAPES = {
    # llama-7B (the BASELINE.md Orca-2 7B class target)
    "7b": dict(n_layers=32, n_embd=4096, n_heads=32, n_kv_heads=32, n_ff=11008, n_vocab=32000),
    # TinyLlama-1.1B (the BASELINE.md draft)
    "1.1b": dict(n_layers=22, n_embd=2048, n_heads=32, n_kv_heads=4, n_ff=5632, n_vocab=32000),
    # round-1 bench target shape
    "220m": dict(n_layers=12, n_embd=1024, n_heads=16, n_kv_heads=8, n_ff=2816, n_vocab=32000),
    "13b": dict(n_layers=40, n_embd=5120, n_heads=40, n_kv_heads=40, n_ff=13824, n_vocab=32000),
}

# peak numbers for the attached chip (TPU v5e): 819 GB/s HBM, 197 bf16 TFLOP/s
PEAK_BW = 819e9
PEAK_FLOPS = 197e12


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synth_qtensor(n: int, k: int, qtype=None, layout: str = "k_major"):
    """Random packed Q4_K-format QuantTensor straight to device (values are
    arbitrary but structurally valid; timing is data-independent)."""
    import jax.numpy as jnp

    from ..gguf.constants import GGMLQuantType
    from ..ops.qmatmul import QuantTensor

    qtype = qtype or GGMLQuantType.Q4_K
    group = 32
    rng = np.random.default_rng(0)

    def mk(shape, dtype):
        if dtype == np.uint8:
            a = rng.integers(0, 255, size=min(1 << 20, int(np.prod(shape))), dtype=np.uint8)
            reps = -(-int(np.prod(shape)) // a.size)
            return jnp.asarray(np.tile(a, reps)[: int(np.prod(shape))].reshape(shape))
        return jnp.full(shape, 0.01, jnp.float32)

    if layout == "k_major":
        qs = mk((k // 2, n), np.uint8)
        scales = mk((k // group, n), np.float32)
        bias = mk((k // group, n), np.float32)
    else:
        qs = mk((n, k // 2), np.uint8)
        scales = mk((n, k // group), np.float32)
        bias = mk((n, k // group), np.float32)
    return QuantTensor(qs=qs, qh=None, scales=scales, bias=bias, qtype=qtype,
                       shape=(n, k), layout=layout)


def synth_params(shape: dict):
    """Quantized llama-family param tree of the given shape, on device."""
    import jax.numpy as jnp

    e, ff, v = shape["n_embd"], shape["n_ff"], shape["n_vocab"]
    kvd = shape["n_kv_heads"] * (e // shape["n_heads"])
    params = {
        "tok_embd": synth_qtensor(v, e, layout="n_major"),
        "output_norm": jnp.ones(e, jnp.float32),
        "output": synth_qtensor(v, e),
    }
    layers = []
    for _ in range(shape["n_layers"]):
        layers.append(
            {
                "attn_norm": jnp.ones(e, jnp.float32),
                "wq": synth_qtensor(e, e),
                "wk": synth_qtensor(kvd, e),
                "wv": synth_qtensor(kvd, e),
                "wo": synth_qtensor(e, e),
                "ffn_norm": jnp.ones(e, jnp.float32),
                "w_gate": synth_qtensor(ff, e),
                "w_up": synth_qtensor(ff, e),
                "w_down": synth_qtensor(e, ff),
            }
        )
    params["layers"] = layers
    return params


def model_bytes(params) -> int:
    from ..ops.qmatmul import QuantTensor

    total = 0
    for leaf in __import__("jax").tree_util.tree_leaves(
        params, is_leaf=lambda x: isinstance(x, QuantTensor)
    ):
        total += leaf.nbytes() if isinstance(leaf, QuantTensor) else leaf.nbytes
    return total


def make_config(shape: dict):
    from ..models.config import ModelConfig

    hd = shape["n_embd"] // shape["n_heads"]
    return ModelConfig(
        arch="llama",
        n_vocab=shape["n_vocab"],
        n_embd=shape["n_embd"],
        n_layers=shape["n_layers"],
        n_heads=shape["n_heads"],
        n_kv_heads=shape["n_kv_heads"],
        n_ff=shape["n_ff"],
        head_dim=hd,
        rope_dims=hd,
        rope_mode="norm",
    )


def time_fn(fn, iters=8, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="7b", choices=sorted(SHAPES))
    ap.add_argument("--draft", default="1.1b", choices=sorted(SHAPES) + ["none"])
    ap.add_argument("--n-cells", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    log(f"device: {jax.devices()[0]} platform={jax.devices()[0].platform}")
    t0 = time.perf_counter()
    (jnp.ones((128, 128)) @ jnp.ones((128, 128))).block_until_ready()
    log(f"compile-service warmup {time.perf_counter() - t0:.1f}s")

    from ..runtime.context import Batch, InferenceContext

    results = {}
    shape = SHAPES[args.model]
    t0 = time.perf_counter()
    params = synth_params(shape)
    cfg = make_config(shape)
    nbytes = model_bytes(params)
    log(f"{args.model}: synthesized {nbytes / 1e9:.2f} GB packed in "
        f"{time.perf_counter() - t0:.1f}s")
    results["model"] = args.model
    results["packed_gb"] = round(nbytes / 1e9, 3)

    ctx = InferenceContext(params, cfg, n_cells=args.n_cells)

    # prefill 128 tokens
    b = Batch()
    for i in range(128):
        b.add(int(i % 1000 + 10), i, 0, want_logits=(i == 127))
    t0 = time.perf_counter()
    ctx.decode(b, 128)
    log(f"prefill(128)+compile: {time.perf_counter() - t0:.1f}s")

    # single-token decode step (the HBM-bound hot loop)
    n_past = [128]

    def step1():
        bb = Batch()
        bb.add(11, n_past[0], 0)
        ctx.decode(bb, 128)
        n_past[0] += 1

    dt1 = time_fn(step1, args.iters)
    bw1 = nbytes / dt1
    log(f"decode step (batch 1): {dt1 * 1e3:.2f} ms  -> {bw1 / 1e9:.0f} GB/s "
        f"({100 * bw1 / PEAK_BW:.1f}% of roofline), {1 / dt1:.1f} tok/s host loop")
    results["step1_ms"] = round(dt1 * 1e3, 3)
    results["step1_bw_frac"] = round(bw1 / PEAK_BW, 4)

    # batched verify step (tree of 32 draft tokens in one pass)
    for bs in (8, 32):
        def stepb(bs=bs):
            bb = Batch()
            for j in range(bs):
                bb.add(11 + j, n_past[0] + j, 0)
            h = ctx.decode_async(bb, 128)
            h.fetch()
            ctx.rm_tail(n_past[0])

        dtb = time_fn(stepb, args.iters)
        flops = 2 * (nbytes / 0.75) * bs  # ~params*2 flops/token (q4k: 0.75B/param)
        log(f"verify step (batch {bs}): {dtb * 1e3:.2f} ms  "
            f"({nbytes / dtb / 1e9:.0f} GB/s eff, mfu {100 * flops / dtb / PEAK_FLOPS:.1f}%)")
        results[f"step{bs}_ms"] = round(dtb * 1e3, 3)

    # on-device greedy chain (scan): the draft loop / multi-step baseline probe
    for depth in (8, 32):
        def chain(depth=depth):
            toks, _ = ctx.draft_chain(11, n_past[0], 1, depth, n_cand=8)
            ctx.seq_rm(1, 0, -1)

        dtc = time_fn(chain, max(2, args.iters // 2))
        log(f"scan chain depth {depth}: {dtc * 1e3:.2f} ms "
            f"({dtc / depth * 1e3:.2f} ms/tok, {depth / dtc:.1f} tok/s)")
        results[f"chain{depth}_ms"] = round(dtc * 1e3, 3)

    # host fetch latency probe
    x = jnp.ones(8)

    def fetch():
        np.asarray(x * 2)

    dtf = time_fn(fetch, 16)
    log(f"host fetch RTT: {dtf * 1e3:.2f} ms")
    results["fetch_ms"] = round(dtf * 1e3, 3)

    if args.draft != "none":
        dshape = SHAPES[args.draft]
        dparams = synth_params(dshape)
        dcfg = make_config(dshape)
        dbytes = model_bytes(dparams)
        dctx = InferenceContext(dparams, dcfg, n_cells=args.n_cells)
        log(f"draft {args.draft}: {dbytes / 1e9:.2f} GB packed")
        bb = Batch()
        for i in range(128):
            bb.add(int(i % 1000 + 10), i, 0, want_logits=(i == 127))
        dctx.decode(bb, 128)

        for depth in (8, 32):
            def dchain(depth=depth):
                dctx.draft_chain(11, 128, 1, depth, n_cand=8)
                dctx.seq_rm(1, 0, -1)

            dtd = time_fn(dchain, max(2, args.iters // 2))
            log(f"draft chain depth {depth}: {dtd * 1e3:.2f} ms "
                f"({dtd / depth * 1e3:.2f} ms/tok; weights want {dbytes * depth / PEAK_BW * 1e3:.1f} ms)")
            results[f"draft_chain{depth}_ms"] = round(dtd * 1e3, 3)

    if args.json:
        print(json.dumps(results))


if __name__ == "__main__":
    main()
