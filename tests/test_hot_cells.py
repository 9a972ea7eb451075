"""KV high-water-mark bounding: attention streams only the occupied prefix
of the cell pool (KVCache.hot). Generation from a large pool must be
token-exact vs a small pool, and the bucket math must track occupancy."""

import numpy as np

import jax.numpy as jnp

from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.runtime.context import Batch, InferenceContext
from pipeinfer_tpu.tools import testmodel

from .test_sync_spec import CFG, PROMPT, N_PREDICT, _plain_greedy


def _greedy(ctx, prompt, n):
    b = Batch()
    for i, t in enumerate(prompt):
        b.add(t, i, 0, want_logits=(i == len(prompt) - 1))
    logits = ctx.decode(b)[-1]
    out = []
    pos = len(prompt)
    cur = int(np.argmax(logits))
    for _ in range(n):
        out.append(cur)
        b = Batch()
        b.add(cur, pos, 0, want_logits=True)
        cur = int(np.argmax(ctx.decode(b)[-1]))
        pos += 1
    return out


def test_big_pool_token_exact(tmp_path):
    path = tmp_path / "hot.gguf"
    testmodel.build_tiny_llama(path, seed=7, **CFG)
    params, cfg = load_model(path)

    # reference: the SAME pool size with bounding disabled (different pool
    # sizes legitimately differ in float summation order)
    ref = InferenceContext(params, cfg, n_cells=4096, cache_dtype=jnp.float32)
    ref._refresh_hot = lambda: None
    want = _greedy(ref, list(PROMPT), N_PREDICT)
    assert ref.cache.hot == 0

    big = InferenceContext(params, cfg, n_cells=4096, cache_dtype=jnp.float32)
    got = _greedy(big, list(PROMPT), N_PREDICT)
    assert big.cache.hot == 512, big.cache.hot  # bounded, not the full pool
    assert got == want, f"hot-bounded decode diverges: {got} vs {want}"


def test_hot_bucket_tracks_occupancy(tmp_path):
    path = tmp_path / "hot2.gguf"
    testmodel.build_tiny_llama(path, seed=7, **CFG)
    params, cfg = load_model(path)
    ctx = InferenceContext(params, cfg, n_cells=4096, cache_dtype=jnp.float32)

    ctx.h_pos[1000] = 5  # simulate an occupied cell past the first bucket
    ctx._refresh_hot()
    assert ctx.cache.hot == 1024
    ctx.h_pos[3000] = 6
    ctx._refresh_hot()
    assert ctx.cache.hot == 0  # next bucket would cover the pool: disable
    ctx.h_pos[:] = -1
    ctx.h_pos[3] = 0
    ctx._refresh_hot()
    assert ctx.cache.hot == 512  # shrinks back after cells free up

    small = InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32)
    small._refresh_hot()
    assert small.cache.hot == 0  # small pools skip the machinery
