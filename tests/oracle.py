"""ctypes bindings to the reference ggml-quants kernels, used ONLY as a test
oracle for bit-exact parity of our numpy quant codecs. The reference sources
are compiled in-place from the read-only mount; nothing is copied into this
repository and the oracle is not part of the shipped framework.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_REF = Path("/root/reference")
_SO = Path("/tmp/libggml_quants_oracle.so")

_lib = None


def _scratch_cwd() -> str:
    """Scratch working directory for reference binaries: speculative_orig
    appends results.csv and rewrites speculative.log in its cwd
    (speculative.cpp:693-710) — never let that land in the repo root."""
    d = Path("/tmp/pipeinfer_oracle_cwd")
    d.mkdir(exist_ok=True)
    return str(d)


def get_oracle():
    """Compile (once) and load the reference quant kernels; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    shim = Path("/tmp/ggml_oracle_shim.c")
    if not _SO.exists() or not shim.exists():
        if not (_REF / "ggml-quants.c").exists():
            return None
        # ggml-quants.c uses the fp16->fp32 lookup table normally defined in
        # ggml.c; provide it here with a constructor that fills it in.
        shim.write_text(
            """
#include <stdint.h>
#include <string.h>
float ggml_table_f32_f16[1 << 16];
static float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t em = h & 0x7fff;
    uint32_t bits;
    if (em == 0) { bits = sign; }
    else if ((em >> 10) == 0) {            /* subnormal */
        int e = -1; uint32_t m = em;
        do { e++; m <<= 1; } while ((m & 0x400) == 0);
        bits = sign | ((uint32_t)(127 - 15 - e) << 23) | ((m & 0x3ff) << 13);
    } else if ((em >> 10) == 0x1f) {       /* inf/nan */
        bits = sign | 0x7f800000 | ((em & 0x3ff) << 13);
    } else {
        bits = sign | (((em >> 10) + 127 - 15) << 23) | ((em & 0x3ff) << 13);
    }
    float out; memcpy(&out, &bits, 4); return out;
}
__attribute__((constructor)) static void init_table(void) {
    for (uint32_t i = 0; i < (1u << 16); i++) ggml_table_f32_f16[i] = f16_to_f32((uint16_t)i);
}
"""
        )
        try:
            subprocess.run(
                [
                    "gcc", "-O2", "-shared", "-fPIC", f"-I{_REF}",
                    str(_REF / "ggml-quants.c"), str(shim), "-o", str(_SO),
                ],
                check=True,
                capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        _lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    return _lib


_FMT = ["q4_0", "q4_1", "q5_0", "q5_1", "q8_0", "q2_K", "q3_K", "q4_K", "q5_K", "q6_K", "q8_K"]

# ---------------------------------------------------------------------------
# Tokenizer oracle: the reference llama.cpp compiled single-rank (our MPI
# ABI shim + self-delivery stub in oracle_src/) with a tiny driver that
# tokenizes stdin lines against a vocab-only GGUF.
# ---------------------------------------------------------------------------

_TOK_BIN = Path("/tmp/pipeinfer_tok_oracle")
_SRC = Path(__file__).parent / "oracle_src"


def get_tok_oracle() -> Path | None:
    if _TOK_BIN.exists():
        return _TOK_BIN
    if not (_REF / "llama.cpp").exists():
        return None
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        objs = []
        try:
            for src, cc, extra in [
                (_REF / "ggml.c", "gcc", ["-D_GNU_SOURCE"]),
                (_REF / "ggml-alloc.c", "gcc", []),
                (_REF / "ggml-backend.c", "gcc", []),
                (_REF / "ggml-quants.c", "gcc", []),
                (_REF / "ggml-mpi.c", "gcc", []),
                (_SRC / "mpi_stub.c", "gcc", []),
                (_SRC / "mpi_globals.c", "gcc", []),
                (_REF / "llama.cpp", "g++", ["-std=c++11"]),
                (_SRC / "driver.cpp", "g++", ["-std=c++11"]),
            ]:
                obj = f"{td}/{src.stem}.o"
                subprocess.run(
                    [cc, "-O1", "-c", "-DGGML_USE_MPI", f"-I{_SRC}/include", f"-I{_REF}", *extra,
                     str(src), "-o", obj],
                    check=True, capture_output=True,
                )
                objs.append(obj)
            subprocess.run(
                ["g++", "-o", str(_TOK_BIN), *objs, "-lpthread", "-lm"],
                check=True, capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    return _TOK_BIN if _TOK_BIN.exists() else None


_GEN_BIN = Path("/tmp/pipeinfer_gen_oracle")


def get_gen_oracle() -> Path | None:
    """Greedy-generation oracle: the reference llama.cpp decoding a model
    end-to-end (clean llama_decode loop, f32 KV)."""
    if _GEN_BIN.exists():
        return _GEN_BIN
    if get_tok_oracle() is None:  # compiles the shared objects
        return None
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        objs = []
        try:
            for src, cc, extra in [
                (_REF / "ggml.c", "gcc", ["-D_GNU_SOURCE"]),
                (_REF / "ggml-alloc.c", "gcc", []),
                (_REF / "ggml-backend.c", "gcc", []),
                (_REF / "ggml-quants.c", "gcc", []),
                (_REF / "ggml-mpi.c", "gcc", []),
                (_SRC / "mpi_stub.c", "gcc", []),
                (_SRC / "mpi_globals.c", "gcc", []),
                (_REF / "llama.cpp", "g++", ["-std=c++11"]),
                (_SRC / "gen_driver.cpp", "g++", ["-std=c++11"]),
            ]:
                obj = f"{td}/{src.stem}.o"
                subprocess.run(
                    [cc, "-O1", "-c", "-DGGML_USE_MPI", f"-I{_SRC}/include", f"-I{_REF}", *extra,
                     str(src), "-o", obj],
                    check=True, capture_output=True,
                )
                objs.append(obj)
            subprocess.run(
                ["g++", "-o", str(_GEN_BIN), *objs, "-lpthread", "-lm"],
                check=True, capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    return _GEN_BIN if _GEN_BIN.exists() else None


def ref_generate_greedy(model_gguf: str, prompt_ids: list[int], n: int) -> list[int] | None:
    binpath = get_gen_oracle()
    if binpath is None:
        return None
    out = subprocess.run(
        [str(binpath), model_gguf, str(n), *(str(t) for t in prompt_ids)],
        capture_output=True, timeout=600, cwd=_scratch_cwd(),
    )
    if out.returncode != 0:
        return None
    return [int(x) for x in out.stdout.split()]


def ref_tokenize(vocab_gguf: str, texts: list[str], add_bos: bool = True) -> list[list[int]] | None:
    binpath = get_tok_oracle()
    if binpath is None:
        return None
    inp = "\n".join(t.replace("\n", " ") for t in texts) + "\n"
    out = subprocess.run(
        [str(binpath), vocab_gguf, "1" if add_bos else "0"],
        input=inp.encode(), capture_output=True, timeout=300,
        cwd=_scratch_cwd(),
    )
    lines = out.stdout.decode().strip("\n").split("\n")
    return [[int(x) for x in line.split()] for line in lines]


def ref_quantize(name: str, x: np.ndarray, block_bytes: int, block_elems: int) -> np.ndarray:
    lib = get_oracle()
    assert lib is not None
    fn = getattr(lib, f"quantize_row_{name}_reference")
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.zeros(x.size // block_elems * block_bytes, dtype=np.uint8)
    fn(
        x.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(x.size),
    )
    return out


def ref_dequantize(name: str, raw: np.ndarray, n: int) -> np.ndarray:
    lib = get_oracle()
    assert lib is not None
    fn = getattr(lib, f"dequantize_row_{name}")
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    out = np.zeros(n, dtype=np.float32)
    fn(
        raw.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(n),
    )
    return out


_SPEC_BIN = Path("/tmp/pipeinfer_spec_oracle")


def get_spec_oracle() -> Path | None:
    """The reference's synchronous speculative example (speculative_orig),
    compiled single-rank against the MPI stub — the acceptance-rate oracle
    (ref: examples/speculative_orig/speculative.cpp:549-551 prints)."""
    if _SPEC_BIN.exists():
        return _SPEC_BIN
    if get_tok_oracle() is None:
        return None
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        objs = []
        try:
            for src, cc, extra in [
                (_REF / "ggml.c", "gcc", ["-D_GNU_SOURCE"]),
                (_REF / "ggml-alloc.c", "gcc", []),
                (_REF / "ggml-backend.c", "gcc", []),
                (_REF / "ggml-quants.c", "gcc", []),
                (_REF / "ggml-mpi.c", "gcc", []),
                (_SRC / "mpi_stub.c", "gcc", []),
                (_SRC / "mpi_globals.c", "gcc", []),
                (_REF / "llama.cpp", "g++", ["-std=c++11"]),
                (_REF / "common" / "common.cpp", "g++", ["-std=c++11", f"-I{_REF}/common"]),
                (_REF / "common" / "sampling.cpp", "g++", ["-std=c++11", f"-I{_REF}/common"]),
                (_REF / "common" / "console.cpp", "g++", ["-std=c++11", f"-I{_REF}/common"]),
                (_REF / "common" / "grammar-parser.cpp", "g++", ["-std=c++11", f"-I{_REF}/common"]),
                (_REF / "examples" / "speculative_orig" / "speculative.cpp", "g++",
                 ["-std=c++11", f"-I{_REF}/common"]),
                (_SRC / "build_info_stub.cpp", "g++", ["-std=c++11"]),
            ]:
                obj = f"{td}/{src.stem}_{src.suffix[1:]}.o"
                subprocess.run(
                    [cc, "-O1", "-c", "-DGGML_USE_MPI", f"-I{_SRC}/include", f"-I{_REF}", *extra,
                     str(src), "-o", obj],
                    check=True, capture_output=True,
                )
                objs.append(obj)
            subprocess.run(
                ["g++", "-o", str(_SPEC_BIN), *objs, "-lpthread", "-lm"],
                check=True, capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    return _SPEC_BIN if _SPEC_BIN.exists() else None


def ref_speculative(
    tgt_gguf: str,
    dft_gguf: str,
    prompt: str,
    n_predict: int,
    *,
    n_draft: int = 5,
    n_parallel: int = 1,
    p_accept: float = 0.5,
    p_split: float = 0.1,
    temp: float = 0.0,
    seed: int | None = None,
) -> dict | None:
    """Run the reference speculative_orig binary; returns its printed
    metrics {n_drafted, n_accept, accept} or None if unavailable.

    temp > 0 exercises the binary's stochastic target sampler (drafts stay
    greedy-with-probs, speculative_orig/speculative.cpp:211); pass `seed`
    for reproducible runs."""
    binpath = get_spec_oracle()
    if binpath is None:
        return None
    out = subprocess.run(
        [
            str(binpath),
            "--model", tgt_gguf, "--model-draft", dft_gguf,
            "-p", prompt, "-n", str(n_predict),
            "--draft", str(n_draft), "-np", str(n_parallel),
            "-pa", str(p_accept), "-ps", str(p_split),
            # target sampler: greedy by default (the binary itself forces
            # temp=-1 "greedy with probs" for the DRAFT samplers,
            # speculative_orig/speculative.cpp:211; the CLI clamps --temp
            # to >= 0 anyway, common.cpp:320)
            "--temp", str(temp),
            "--repeat-penalty", "1.0", "--repeat-last-n", "0",
            *(["--seed", str(seed)] if seed is not None else []),
            "--mpi-layer-split", "1.0/1.0",
            "-c", "512", "--threads", "2",
        ],
        capture_output=True, timeout=900,
        # the reference binary appends results.csv + speculative.log in its
        # cwd (speculative.cpp:693-710); keep that out of the repo root
        cwd=_scratch_cwd(),
    )
    text = out.stderr.decode(errors="replace")
    import re

    m_d = re.search(r"n_drafted\s*=\s*(\d+)", text)
    m_a = re.search(r"n_accept\s*=\s*(\d+)", text)
    if not (m_d and m_a):
        return None
    n_drafted, n_accept = int(m_d.group(1)), int(m_a.group(1))
    return {
        "n_drafted": n_drafted,
        "n_accept": n_accept,
        "accept": n_accept / max(n_drafted, 1),
        "stdout": out.stdout.decode(errors="replace"),
    }
