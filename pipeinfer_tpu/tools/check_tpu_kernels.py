"""Real-hardware smoke check of the Pallas quantized-matmul kernels.

Run on a machine with a TPU attached:

    python -m pipeinfer_tpu.tools.check_tpu_kernels

Compares the fused kernel against the jnp dequant golden path for every
supported format and prints timing. (CI covers the same kernels in
interpreter mode; this script is the real-silicon check.)
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax

    from ..quant import pack
    from ..ops.qmatmul import dequant_T, qmatmul, to_device

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})")
    rng = np.random.default_rng(0)

    n, k, m = 1024, 2048, 8
    x = rng.standard_normal((m, k)).astype(np.float32)
    results = {}

    def check(label, pw, layout):
        qt = to_device(pw, layout=layout)
        if layout == "i4g":
            # i4g is a lossy requant layout: judge the KERNEL against its
            # own dequant golden (the requant noise has its own budget in
            # tests/test_qmatmul.py)
            want = x @ np.asarray(dequant_T(qt))
        else:
            # golden on host (numpy) to avoid per-format fallback compiles
            want = x @ pack.unpack_to_float(pw).T
        t0 = time.perf_counter()
        got = qmatmul(x, qt, prefer_pallas=True)
        np.asarray(got)  # is_ready/block_until_ready lie on tunneled runtimes
        compile_s = time.perf_counter() - t0
        # steady-state: amortize many calls per fetch (per-dispatch RTT is
        # ~30 ms on tunneled runtimes and would otherwise dominate)
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            got = qmatmul(x, qt, prefer_pallas=True)
        np.asarray(got)
        dt = (time.perf_counter() - t0) / iters
        err = np.abs(np.asarray(got) - want).max() / (np.abs(want).max() + 1e-6)
        ok = err < 0.02
        results[label] = ok
        gbps = qt.nbytes() / dt / 1e9
        print(
            f"{label:12s} err={err:.5f} {'OK ' if ok else 'FAIL'} "
            f"compile={compile_s:.2f}s steady={dt*1e6:.0f}us ~{gbps:.0f}GB/s"
        )

    for qtype in pack.FORMAT_INFO:
        w = rng.standard_normal((n, k)).astype(np.float32)
        pw = pack.pack_array(w, qtype)
        check(qtype.name, pw, "k_major")
        # the production TPU layouts
        check(f"{qtype.name}/i8g", pw, "i8g")
        if pw.bits == 4:
            check(f"{qtype.name}/k4", pw, "k4")
            check(f"{qtype.name}/i4g", pw, "i4g")

    # TP-sharded i4g on silicon: the packed planes split along output
    # columns (parallel.tp._stack_qt) and each shard runs the SAME Pallas
    # kernel inside shard_map. One real chip -> a 1-device 'model' mesh
    # (the sharded-code path, local shapes halved via a 2-way stack on the
    # host side being infeasible here; the shard_map wrapping itself is
    # what this exercises).
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    from ..quant import pack as _pack
    from ..ops.qmatmul import QuantTensor

    w = rng.standard_normal((n, k)).astype(np.float32)
    pw = _pack.pack_array(w, _pack.GGMLQuantType.Q4_K)
    qt = to_device(pw, layout="i4g")
    mesh = Mesh(np.asarray(jax.devices()[:1]), axis_names=("model",))
    qspec = jax.tree_util.tree_map(lambda _: P(), qt)

    def inner(xs, q):
        return qmatmul(xs, q, prefer_pallas=True)

    fn = shard_map(inner, mesh=mesh, in_specs=(P(), qspec), out_specs=P(),
                   check_vma=False)
    want = x @ np.asarray(dequant_T(qt))
    got = np.asarray(jax.jit(fn)(x, qt))
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
    ok = err < 0.02
    results["i4g/tp-shard"] = ok
    print(f"{'i4g/tp-shard':12s} err={err:.5f} {'OK ' if ok else 'FAIL'} "
          f"(Pallas i4g inside shard_map on a 'model' mesh)")

    # flash cell attention at WIDE seq-bitmask widths on silicon: tokens
    # whose primary seq id lives in word 2/3 (seq >= 64) must mask against
    # the right word (the serving-scale SEQ_WORDS>2 configuration; the
    # kernel derives the width from cell_seq.shape[1])
    import jax.numpy as jnp

    from ..ops.cell_attention import cell_attention
    from ..runtime import kv_cache as kvmod

    for W in (2, 4):
        t, h, kvh, d, c = 4, 8, 2, 64, 1024
        q = jnp.asarray(rng.standard_normal((t, h, d)), jnp.float32)
        kc = jnp.asarray(rng.standard_normal((kvh, c, d)), jnp.float32)
        vc = jnp.asarray(rng.standard_normal((kvh, c, d)), jnp.float32)
        pos = np.full(c, -1, np.int32)
        seq = np.zeros((c, W), np.uint32)
        n_used = c // 2
        pos[:n_used] = np.arange(n_used)
        seq_ids = [w * 33 for w in range(W)]  # one id per word, up to 99
        for i in range(n_used):
            s = seq_ids[i % W]
            seq[i, s // 32] |= np.uint32(1) << np.uint32(s % 32)
        tok_pos = jnp.asarray(rng.integers(5, n_used, t), jnp.int32)
        tok_seq = jnp.asarray([seq_ids[i % W] for i in range(t)], jnp.int32)
        valid = jnp.ones(t, bool)
        cache = kvmod.KVCache(k=kc[None], v=vc[None], pos=jnp.asarray(pos),
                              seq=jnp.asarray(seq))
        mask = kvmod.attn_mask(cache, tok_pos, tok_seq)
        want = np.asarray(kvmod.attention(q, kc, vc, mask, scale=0.125))
        got = np.asarray(cell_attention(
            q, kc, vc, jnp.asarray(pos), jnp.asarray(seq), tok_pos, tok_seq,
            valid, scale=0.125,
        ))
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
        # masking must also be LOAD-BEARING: word-0 tokens at the same
        # positions see different cells, so outputs must differ a lot (a
        # wrong-word select would be an O(1) error, not f32 noise)
        got0 = np.asarray(cell_attention(
            q, kc, vc, jnp.asarray(pos), jnp.asarray(seq), tok_pos,
            jnp.zeros_like(tok_seq), valid, scale=0.125,
        ))
        sep = np.abs(got0 - got).max() / (np.abs(want).max() + 1e-6)
        ok = err < 1e-2 and (W == 1 or sep > 0.05)
        results[f"flash/W={W}"] = ok
        print(f"{f'flash/W={W}':12s} err={err:.5f} sep={sep:.3f} "
              f"{'OK ' if ok else 'FAIL'} "
              f"(seq ids {seq_ids} across {W} bitmask words)")

    if not all(results.values()):
        raise SystemExit(1)
    print("all kernels OK on", dev.platform)


if __name__ == "__main__":
    main()
