"""Batched drivers + context sliding + presets + YAML run dumps
(ref: examples/batched, examples/batched-bench, main.cpp context swapping,
run_with_preset.py, dump_non_result_info_yaml)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.runtime.context import Batch, InferenceContext
from pipeinfer_tpu.sampling.samplers import SamplerState, SamplingParams, sample
from pipeinfer_tpu.tools import testmodel
from pipeinfer_tpu.tools.batched import batched_generate

CFG = dict(n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2, n_ff=128, n_vocab=260)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("bt") / "m.gguf"
    testmodel.build_tiny_llama(path, seed=3, **CFG)
    return load_model(path)


def _plain(params, cfg, prompt, n, sp_params):
    ctx = InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32)
    st = SamplerState(params=sp_params)
    b = Batch()
    for i, t in enumerate(prompt):
        st.accept(t, apply_grammar=False)
        b.add(t, i, 0, want_logits=(i == len(prompt) - 1))
    logits = ctx.decode(b)[-1]
    out, pos = [], len(prompt)
    for _ in range(n):
        tok = sample(st, logits)
        st.accept(tok)
        out.append(tok)
        b.clear()
        b.add(tok, pos, 0)
        logits = ctx.decode(b)[0]
        pos += 1
    return out


def test_batched_greedy_matches_single(model):
    """All-greedy parallel continuations must each equal the single-stream
    result (they share the prompt and sample deterministically)."""
    params, cfg = model
    prompt = [5, 77, 12]
    sp = SamplingParams(temp=0.0)
    want = _plain(params, cfg, prompt, 10, sp)
    ctx = InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32)
    outs = batched_generate(ctx, prompt, 10, 3, sp, eos_id=-1)
    assert len(outs) == 3
    for s, o in enumerate(outs):
        assert o == want, f"seq {s}: {o} vs {want}"


def test_batched_seeded_streams_decorrelate(model):
    """With temp>0 each sequence samples from its own RNG stream."""
    params, cfg = model
    ctx = InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32)
    outs = batched_generate(ctx, [5, 77, 12], 12, 4,
                            SamplingParams(temp=1.2, seed=9), eos_id=-1)
    assert len({tuple(o) for o in outs}) > 1, "parallel streams identical"


def test_context_shift_infinite_generation(model):
    """Generation far beyond the cell budget slides the window instead of
    crashing; tokens before the first shift match the unshifted stream."""
    from pipeinfer_tpu.cli.main import generate

    params, cfg = model
    prompt = [5, 77, 12, 9]
    n_cells = 32

    class _Tok:  # minimal tok stub for generate()
        class vocab:
            eos_id = -1

    big = InferenceContext(params, cfg, n_cells=256, cache_dtype=jnp.float32)
    want = generate(big, _Tok, SamplerState(params=SamplingParams(temp=0.0)),
                    list(prompt), 60)

    small = InferenceContext(params, cfg, n_cells=n_cells, cache_dtype=jnp.float32)
    got = generate(small, _Tok, SamplerState(params=SamplingParams(temp=0.0)),
                   list(prompt), 60, n_keep=len(prompt))
    assert len(got) == 60, "generation stopped early (cache full?)"
    # identical until the first slide (cells exhausted around n_cells-1 pos)
    n_same = n_cells - 1 - len(prompt) - 1
    assert got[:n_same] == want[:n_same]
    # the small-context stream keeps making progress with bounded cells
    assert (small.h_pos[: small.trash_cell] >= 0).sum() < n_cells


def test_batched_bench_runs(model, tmp_path_factory, capsys):
    from pipeinfer_tpu.tools import batched_bench

    path = tmp_path_factory.mktemp("bb") / "m.gguf"
    testmodel.build_tiny_llama(path, seed=3, **CFG)
    rc = batched_bench.main(["-m", str(path), "-pp", "8", "-tg", "4", "-pl", "1,2"])
    assert rc == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith("|")]
    assert len(lines) == 2 + 2  # header+sep + 2 grid cells
    assert "S_TG t/s" in lines[0]


def test_preset_runner(model, tmp_path_factory, capsys):
    from pipeinfer_tpu.tools import preset

    d = tmp_path_factory.mktemp("ps")
    path = d / "m.gguf"
    testmodel.build_tiny_llama(path, seed=3, **CFG)
    (d / "p.yml").write_text(
        f"model: {path}\npp: 8\ntg: 2\npl: [1]\n"
    )
    rc = preset.main(["batched-bench", str(d / "p.yml")])
    assert rc == 0
    assert "| 8 | 2 | 1 |" in capsys.readouterr().out

    with pytest.raises(SystemExit):
        preset.main(["batched-bench", str(d / "missing.yml")])


def test_run_dump_yaml(tmp_path):
    import yaml

    from pipeinfer_tpu.utils.rundump import dump_run_yaml

    path = dump_run_yaml(str(tmp_path / "logs"), args={"n_predict": 4, "temp": 0.0},
                         prompt_ids=[1, 2], output_ids=[3, 4],
                         output_text="hi", ctx=None)
    doc = yaml.safe_load(open(path))
    assert doc["prompt_tokens"] == [1, 2]
    assert doc["output_tokens"] == [3, 4]
    assert doc["params"]["n_predict"] == 4
