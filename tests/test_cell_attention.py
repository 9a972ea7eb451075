"""Flash cell-attention kernel vs the dense reference path: tree masks,
alibi, padded rows, multi-block streaming."""

import numpy as np
import pytest

import jax.numpy as jnp

from pipeinfer_tpu.ops.cell_attention import cell_attention
from pipeinfer_tpu.runtime import kv_cache as kv


def _setup(rng, t=4, h=8, kvh=2, d=64, c=1024, n_seq=3):
    q = jnp.asarray(rng.standard_normal((t, h, d)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((kvh, c, d)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((kvh, c, d)), jnp.float32)
    pos = np.full(c, -1, np.int32)
    seq = np.zeros((c, 2), np.uint32)
    n_used = c // 2
    pos[:n_used] = np.arange(n_used)
    for i in range(n_used):
        s = rng.integers(0, n_seq)
        w = int(rng.integers(0, 40))  # exercise both seq words
        seq[i, w // 32] |= np.uint32(1) << np.uint32(w % 32)
        seq[i, 0] |= np.uint32(1) << np.uint32(s)
    tok_pos = jnp.asarray(rng.integers(5, n_used, t), jnp.int32)
    tok_seq = jnp.asarray(rng.integers(0, n_seq, t), jnp.int32)
    valid = jnp.asarray([True] * (t - 1) + [False])
    return q, kc, vc, jnp.asarray(pos), jnp.asarray(seq), tok_pos, tok_seq, valid


def _dense(q, kc, vc, pos, seq, tok_pos, tok_seq, valid, scale, alibi=None):
    cache = kv.KVCache(k=kc[None], v=vc[None], pos=pos, seq=seq)
    mask = kv.attn_mask(cache, tok_pos, tok_seq)
    mask = jnp.where(valid[:, None], mask, kv.MASK_VALUE)
    return kv.attention(q, kc, vc, mask, scale=scale, alibi=alibi,
                        cache_pos=pos if alibi is not None else None)


@pytest.mark.parametrize("t,c", [(4, 1024), (1, 512), (8, 2048)])
def test_flash_matches_dense(rng, t, c):
    q, kc, vc, pos, seq, tok_pos, tok_seq, valid = _setup(rng, t=t, c=c)
    scale = 0.125
    want = np.asarray(_dense(q, kc, vc, pos, seq, tok_pos, tok_seq, valid, scale))
    got = np.asarray(cell_attention(
        q, kc, vc, pos, seq, tok_pos, tok_seq, valid,
        scale=scale, block_c=256, interpret=True,
    ))
    v = np.asarray(valid)
    np.testing.assert_allclose(got[v], want[v], rtol=2e-5, atol=2e-5)


def test_flash_alibi(rng):
    q, kc, vc, pos, seq, tok_pos, tok_seq, valid = _setup(rng, t=4, c=512)
    scale = 0.125
    slopes = kv.alibi_slopes(8, 8.0)
    want = np.asarray(_dense(q, kc, vc, pos, seq, tok_pos, tok_seq, valid, scale, slopes))
    got = np.asarray(cell_attention(
        q, kc, vc, pos, seq, tok_pos, tok_seq, valid,
        scale=scale, alibi=slopes, block_c=256, interpret=True,
    ))
    v = np.asarray(valid)
    np.testing.assert_allclose(got[v], want[v], rtol=2e-5, atol=2e-5)
