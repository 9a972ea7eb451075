"""`pipeinfer-speculative` CLI surface: engine selection (--engine
auto/controller/device-loop) resolves correctly and all engines emit the
same greedy tokens (ref: examples/speculative/speculative.cpp CLI; the
engine flag is this framework's addition — the reference has one driver).
"""

from pathlib import Path

import pytest

from pipeinfer_tpu.cli import speculative
from pipeinfer_tpu.tools import testmodel

VOCAB = "/root/reference/models/ggml-vocab-llama.gguf"


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("clispec")
    tgt, dft = d / "tgt.gguf", d / "dft.gguf"
    testmodel.build_tiny_llama(
        tgt, seed=3, n_layers=4, n_embd=64, n_heads=4, n_kv_heads=2,
        n_ff=128, vocab_from=VOCAB,
    )
    testmodel.build_tiny_llama(
        dft, seed=3, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
        n_ff=128, vocab_from=VOCAB,
    )
    return str(tgt), str(dft)


def run_cli(pair, capsys, *extra):
    tgt, dft = pair
    argv = [
        "--model", tgt, "--model-draft", dft, "--prompt", "Once upon",
        "-n", "12", "--temp", "0", "--ignore-eos", "--ctx-size", "256",
        "--no-display-prompt", "--draft", "4", "-np", "1",
        "--repeat-penalty", "1.0", "--repeat-last-n", "0", *extra,
    ]
    speculative.main(argv)
    return capsys.readouterr().out


def test_engine_parity_and_auto(pair, capsys):
    out_ctl = run_cli(pair, capsys, "--engine", "controller")
    out_auto = run_cli(pair, capsys, "--engine", "auto")
    out_dl = run_cli(pair, capsys, "--engine", "device-loop")
    out_sync = run_cli(pair, capsys, "--engine", "sync")
    assert out_ctl == out_auto == out_dl == out_sync
    assert out_ctl.strip()


def test_auto_keeps_controller_for_trees(pair, capsys, monkeypatch):
    picked = {}
    orig = speculative.PipeInferController

    class Spy(orig):
        def __init__(self, *a, **kw):
            picked["controller"] = True
            super().__init__(*a, **kw)

    monkeypatch.setattr(speculative, "PipeInferController", Spy)
    # -np 3 (tree drafting) is controller-only: auto must not pick the
    # device loop
    out = run_cli(pair, capsys, "--engine", "auto", "-np", "3")
    assert picked.get("controller")
    assert out.strip()
