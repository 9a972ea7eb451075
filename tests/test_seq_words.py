"""SEQ_WORDS is a build-time config (VERDICT r3 weak #5): widening it to 4
lifts the sequence-slot ceiling to 128 so >16 concurrent speculative
streams fit (the reference pools 1000 offsets, speculative.cpp:140-145).
SEQ_WORDS is read at import, so the widened run lives in a SUBPROCESS with
PIPEINFER_SEQ_WORDS=4; it drives 32 concurrent MultiPipeInfer streams and
checks golden-token equivalence per stream."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("CI_NO_SUBPROC"), reason="subprocess test"
)

SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from pipeinfer_tpu.runtime import kv_cache as kv
assert kv.SEQ_WORDS == 4, kv.SEQ_WORDS

from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.runtime.context import Batch, InferenceContext
from pipeinfer_tpu.sampling.samplers import SamplingParams
from pipeinfer_tpu.spec.multi import MAX_SEQS, MultiPipeInfer
from pipeinfer_tpu.spec.params import SpecParams
from pipeinfer_tpu.tools import testmodel
import tempfile, pathlib

assert MAX_SEQS == 128

d = pathlib.Path(tempfile.mkdtemp())
pt, pd = d / "t.gguf", d / "d.gguf"
testmodel.build_tiny_llama(pt, seed=5, n_layers=2, n_embd=128, n_heads=4,
                           n_kv_heads=2, n_ff=256, n_vocab=512)
testmodel.build_tiny_llama(pd, seed=9, n_layers=1, n_embd=64, n_heads=2,
                           n_kv_heads=2, n_ff=128, n_vocab=512)
tgt, dft = load_model(pt), load_model(pd)

PROMPTS = [[3, 17, 42], [5, 9], [11, 30, 7, 2]]
N = 10

# single-stream goldens (plain greedy per prompt)
goldens = []
for prompt in PROMPTS:
    ctx = InferenceContext(tgt[0], tgt[1], n_cells=256, cache_dtype=jnp.float32)
    b = Batch()
    for i, t in enumerate(prompt):
        b.add(t, i, 0, want_logits=(i == len(prompt) - 1))
    logits = ctx.decode(b)[-1]
    out = []
    n_past = len(prompt)
    for _ in range(N):
        tok = int(np.argmax(logits))
        out.append(tok)
        b.clear()
        b.add(tok, n_past, 0)
        logits = ctx.decode(b)[0]
        n_past += 1
    goldens.append(out)

GREEDY = SamplingParams(temp=0.0, penalty_repeat=1.0, penalty_last_n=0)
N_STREAMS = 32
sp = SpecParams(n_draft=3, n_parallel=1, p_accept=0.0, max_inflight=2)
# stride = 1 + 1*2 = 3 slots/stream -> 32 streams need 96 slots > 64 (the
# old ceiling) and <= 128 (SEQ_WORDS=4)
cells = sum((len(PROMPTS[i % 3]) + N + 2 * 3 + 4) for i in range(N_STREAMS)) + 64
eng = MultiPipeInfer(
    InferenceContext(tgt[0], tgt[1], n_cells=cells, cache_dtype=jnp.float32),
    InferenceContext(dft[0], dft[1], n_cells=cells, cache_dtype=jnp.float32),
    GREEDY, sp, eos_id=-1,
)
reqs = [
    eng.submit(prompt_ids=list(PROMPTS[i % 3]), n_predict=N, ignore_eos=True)
    for i in range(N_STREAMS)
]
eng.run_until_idle()
peak = getattr(eng, "peak_active", None)
for i, r in enumerate(reqs):
    assert r.error is None, (i, r.error)
    assert r.tokens == goldens[i % 3], (i, r.tokens, goldens[i % 3])
print("OK", len(reqs), "streams at SEQ_WORDS=4")
"""


def test_32_streams_at_seq_words_4(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # children must not inherit the axon TPU
    env["PIPEINFER_SEQ_WORDS"] = "4"
    env["PYTHONPATH"] = os.pathsep.join(
        [str(Path(__file__).resolve().parent.parent)]
        + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT], env=env, capture_output=True,
        text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "OK 32 streams" in out.stdout, out.stdout
