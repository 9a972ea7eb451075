"""Persistent XLA compilation cache + parallel ahead-of-time warmup.

The reference loads models in seconds because there is nothing to compile
(mmap + precompiled C kernels, ref: llama.cpp:1805-1938, README.md:130-140).
On TPU the analogous startup cost is XLA compilation of every jitted step
variant. Two attacks, both here:

- a persistent on-disk compilation cache shared by every process on the
  machine (CLI runs, bench, serving) — the second process start pays
  deserialization (seconds), not compilation (minutes);
- parallel AOT warmup: the known (bucket, topk) step variants are lowered
  and compiled concurrently on a thread pool (XLA compilation releases the
  GIL), populating the persistent cache so the subsequent jit calls hit it.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
from pathlib import Path

_DEFAULT_DIR = os.environ.get(
    "PIPEINFER_CACHE_DIR", str(Path.home() / ".cache" / "pipeinfer_tpu" / "xla")
)
_enabled = False


def enable(cache_dir: str | None = None) -> str:
    """Turn on the persistent compilation cache (idempotent).

    PIPEINFER_NO_COMPILE_CACHE=1 makes this a no-op: this jax build's
    executable (de)serialization crashes the process (SIGSEGV on read,
    abort on write) for multi-device CPU-mesh executables — the test
    suite compiles many of those and disables the cache (tests/conftest),
    while the real TPU paths (CLI/bench/serving) keep it."""
    global _enabled
    import jax

    if os.environ.get("PIPEINFER_NO_COMPILE_CACHE"):
        return "(persistent compilation cache disabled)"
    d = cache_dir or _DEFAULT_DIR
    Path(d).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    # cache everything: at 7B even "cheap" programs cost seconds on a
    # tunneled compile service
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return d


def shape_of(x):
    import jax

    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), x
    )


def warm_parallel(jobs, max_workers: int = 8, log=None):
    """Execute (name, thunk) warmup jobs concurrently on a thread pool.

    Each thunk runs a jitted function once with dummy inputs and blocks on
    the result. Under the axon remote-compile backend the compiles of all
    in-flight thunks OVERLAP (measured: 3 fresh programs in the time of
    one), and each lands in the persistent compilation cache for future
    processes. NOTE: AOT ``.lower().compile()`` must NOT be used here — it
    returns instantly but defers (and de-caches) the real compile to first
    execution.
    """

    def one(job):
        name, thunk = job
        try:
            thunk()
            return name, None
        except Exception as e:  # pragma: no cover - warmup is best-effort
            return name, e

    results = []
    with cf.ThreadPoolExecutor(max_workers=max_workers) as ex:
        for name, err in ex.map(one, jobs):
            if log:
                log(f"warm {name}: {'ok' if err is None else err}")
            results.append((name, err))
    return results
