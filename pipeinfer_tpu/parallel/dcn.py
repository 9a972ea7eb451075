"""Cross-process (multi-host / DCN) pipeline stages with a socket control
plane — the TPU-native counterpart of the reference's MPI deployment.

The reference pipelines a model across *nodes*: rank 0 drives, every other
rank sits in a tag-dispatch worker loop (ref: llama.cpp:9941-9977
`llama_process_mpi_worker`), metadata rides a head->tail ring
(ggml-mpi.c:188-210), activations hop stage->stage (ggml-mpi.c:710-721),
logits return tail->head (llama.cpp:5798-5804) and cancellations travel a
backwards ring (ggml-mpi.c:212-234). TPUs have no tag-probe primitive and
XLA programs are per-process, so the re-design is:

- every stage worker is an OS process owning its layer slab + KV slab on
  its local device(s); it runs an ordered command loop over a TCP control
  connection from the head (the MPI tag protocol becomes typed frames);
- activations hop worker->worker over their own TCP data stream (on real
  pods this is the DCN path; the reference's MPI_Bsend is likewise a
  host-mediated send), overlapped with compute by a sender thread per
  stage — several microbatches are in flight across the stage depth;
- cancellation is a separate head->worker channel drained into a set by a
  reader thread, so it can OVERTAKE queued decodes (the backwards-ring
  counterpart): a canceled run's compute is skipped and a tiny "dead"
  frame keeps the data stream in sync;
- KV sequence ops are broadcast in-band on the control stream, so every
  stage applies them in exactly the head's order (the reference's
  transaction ids, llama.cpp:9263-9333, become FIFO ordering).

The head process (this module's RemoteStagedContext) owns stage 0, the
sequence-slot allocator, and the PipeInfer controller; it exposes the same
decode/seq-op surface as StagedInferenceContext, so the async controller
runs over a cross-process target unchanged.
"""

from __future__ import annotations

import functools
import json
import os
import queue
import socket
import struct
import subprocess
import sys
import threading
import time
from typing import Sequence

import ml_dtypes  # noqa: F401  (registers the "bfloat16" numpy dtype for the wire)
import numpy as np

from ..runtime import kv_cache as kv
from ..runtime.context import AsyncHandle, Batch, InferenceContext, _bucket, pack_batch
from .stages import StagedInferenceContext, _staged_step, split_ranges

# ---------------------------------------------------------------------------
# framing: 8-byte header (json_len, payload_len) + json + raw payload
# ---------------------------------------------------------------------------

_HDR = struct.Struct("<II")


def send_msg(sock: socket.socket, meta: dict, payload: bytes = b"") -> None:
    js = json.dumps(meta).encode()
    sock.sendall(_HDR.pack(len(js), len(payload)) + js + payload)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf.extend(chunk)
    return bytes(buf)


def recv_msg(sock: socket.socket) -> tuple[dict, bytes]:
    jl, pl = _HDR.unpack(_recv_exact(sock, _HDR.size))
    meta = json.loads(_recv_exact(sock, jl)) if jl else {}
    payload = _recv_exact(sock, pl) if pl else b""
    return meta, payload


def _pack_arrays(arrays: dict[str, np.ndarray]) -> tuple[dict, bytes]:
    meta, blob = {}, bytearray()
    for name, a in arrays.items():
        a = np.ascontiguousarray(a)
        meta[name] = [str(a.dtype), list(a.shape), len(blob), a.nbytes]
        blob.extend(a.tobytes())
    return meta, bytes(blob)


def _unpack_arrays(meta: dict, blob: bytes) -> dict[str, np.ndarray]:
    out = {}
    for name, (dt, shape, off, nb) in meta.items():
        out[name] = np.frombuffer(blob, dtype=np.dtype(dt), count=nb // np.dtype(dt).itemsize,
                                  offset=off).reshape(shape)
    return out


def _wire_token() -> str:
    """Shared secret for the hello handshake (PIPEINFER_DCN_TOKEN). Every
    peer role is validated against it before being accepted — without
    this, any network peer could connect as 'ctrl' and drive arbitrary
    compute/KV ops, or inject activations as 'data'."""
    return os.environ.get("PIPEINFER_DCN_TOKEN", "")


def _check_hello(hello: dict, *, bind_host: str) -> bool:
    import hmac

    want = _wire_token()
    if not want and bind_host not in ("localhost", "127.0.0.1", "::1"):
        return False  # non-loopback bind REQUIRES a token
    return hmac.compare_digest(str(hello.get("token", "")), want)


# inter-stage activations travel bf16 by default (half the bytes on the
# latency-tolerance axis the pipeline exists for; the reference's F32-only
# MPI transfer is a limitation, ggml-mpi.c:451-487). The final logits hop
# stays f32: the packed sparse rows carry token IDS as floats, and bf16's
# 8 mantissa bits corrupt ids > 256. PIPEINFER_DCN_WIRE=f32 forces f32.
def _wire_cast(a: np.ndarray) -> np.ndarray:
    if os.environ.get("PIPEINFER_DCN_WIRE", "bf16") == "f32":
        return a
    if a.dtype == np.float32:
        import ml_dtypes

        return a.astype(ml_dtypes.bfloat16)
    return a


def _wire_uncast(a: np.ndarray) -> np.ndarray:
    return a.astype(np.float32) if str(a.dtype) == "bfloat16" else a


def _connect_retry(addr: tuple[str, int], role: str,
                   timeout: float = 900.0) -> socket.socket:
    """Retry until the peer binds its listen socket. The deadline must
    cover the peer's FULL startup — model load + device upload + (cold)
    backend init can take minutes for 7B+ models — hence the generous
    default; override via the callers' connect_timeout."""
    deadline = time.monotonic() + timeout
    while True:
        try:
            s = socket.create_connection(addr, timeout=5.0)
            s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            s.settimeout(None)
            send_msg(s, {"role": role, "token": _wire_token()})
            return s
        except OSError:
            if time.monotonic() > deadline:
                raise
            time.sleep(0.1)


# ---------------------------------------------------------------------------
# stage worker (ranks 1..S-1): the tag-dispatch loop, re-designed
# ---------------------------------------------------------------------------


class StageWorker:
    """One pipeline stage in its own process (ref: the non-head rank's
    llama_process_mpi_worker loop, llama.cpp:9941-9977)."""

    # bound on queued outbound activations: a stalled downstream worker
    # backpressures this stage's command loop instead of growing host
    # memory without limit (the head's ship pool is bounded the same way)
    SEND_HIGH_WATER = 8

    def __init__(self, model_path: str, stage: int, n_stages: int,
                 split: Sequence[float] | None, listen_port: int,
                 next_addr: tuple[str, int], *, n_cells: int = 1024,
                 cache_dtype=None, bind_host: str = "localhost"):
        import jax
        import jax.numpy as jnp

        from ..models import load_model

        self.stage = stage
        self.n_stages = n_stages
        self.last = stage == n_stages - 1
        n_cells = kv.round_pool(n_cells)  # must match the head's rounding
        params, cfg = load_model(model_path)
        self.cfg = cfg
        split = list(split) if split else [1.0 / n_stages] * n_stages
        lo, hi = split_ranges(cfg.n_layers, split)[stage]
        self.layer_range = (lo, hi)
        sp = {"layers": params["layers"][lo:hi]}
        if self.last:
            for key in StagedInferenceContext.LAST_STAGE_GLOBALS:
                if key in params:
                    sp[key] = params[key]
        dev = jax.devices()[0]
        self.params = jax.device_put(sp, dev)
        self.cache = jax.device_put(
            kv.create(hi - lo, n_cells, cfg.n_kv_heads, cfg.head_dim,
                      cache_dtype or jnp.bfloat16), dev)
        self.device = dev
        self.n_cells = n_cells

        self.listen_port = listen_port
        self.bind_host = bind_host
        self.next_addr = next_addr
        self.canceled: set[int] = set()
        self._cancel_lock = threading.Lock()
        self._act_q: "queue.Queue[tuple[dict, bytes]]" = queue.Queue()
        self._send_q: "queue.Queue[tuple[dict, object] | None]" = queue.Queue(
            maxsize=self.SEND_HIGH_WATER
        )

    # -- wiring -------------------------------------------------------------

    def _accept_loop(self, lsock: socket.socket, conns: dict, ev: threading.Event):
        while len(conns) < 3:
            c, peer = lsock.accept()
            c.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            try:
                hello, _ = recv_msg(c)
            except (ConnectionError, OSError):
                c.close()
                continue
            # authenticate BEFORE honoring the claimed role: an
            # unauthenticated 'ctrl' peer could drive arbitrary compute/KV
            # ops, a 'data' peer could inject activations
            if not _check_hello(hello, bind_host=self.bind_host) or \
                    hello.get("role") not in ("ctrl", "data", "cancel"):
                c.close()
                continue
            conns[hello["role"]] = c
        ev.set()

    def _data_reader(self, dsock: socket.socket):
        try:
            while True:
                meta, payload = recv_msg(dsock)
                self._act_q.put((meta, payload))
        except (ConnectionError, OSError):
            self._act_q.put(None)

    def _cancel_reader(self, csock: socket.socket):
        try:
            while True:
                meta, _ = recv_msg(csock)
                with self._cancel_lock:
                    self.canceled.update(meta["runs"])
        except (ConnectionError, OSError):
            pass

    def _sender(self, out_sock: socket.socket):
        """Ordered fetch+send: blocks on device completion per run, which is
        exactly the stage->next activation latency the compute of the NEXT
        queued run overlaps with (jax async dispatch)."""
        # inter-stage hops cast f32 activations to bf16 on the wire (half
        # the bytes on the slow-interconnect axis this topology exists
        # for); the final logits hop stays f32 (the packed sparse rows
        # carry token ids, which bf16 would corrupt)
        reduce_wire = not self.last
        while True:
            item = self._send_q.get()
            if item is None:
                break
            meta, arr = item
            if arr is None:
                send_msg(out_sock, meta)
                continue
            host = np.asarray(arr)
            if reduce_wire:
                host = _wire_cast(host)
            ameta, blob = _pack_arrays({"x": host})
            meta["arrays"] = ameta
            send_msg(out_sock, meta, blob)

    # -- command handlers ----------------------------------------------------

    def _handle_decode(self, meta: dict, payload: bytes):
        import jax

        arrs = _unpack_arrays(meta["arrays"], payload)
        rid = meta["run"]
        topk = meta.get("topk")
        item = self._act_q.get()
        if item is None:
            raise ConnectionError("data stream closed")
        ameta, ablob = item
        assert ameta["run"] == rid, (ameta, rid)
        with self._cancel_lock:
            # run ids are monotonic and never reused: prune every mark at
            # or below the run being processed (incl. late-arriving cancels
            # for already-computed runs) so the set stays bounded
            dead = ameta.get("dead", False) or rid in self.canceled
            self.canceled = {c for c in self.canceled if c > rid}
        if dead:
            # stay in protocol sync without computing (the reference's
            # canceled-batch skip, llama.cpp:5627-5628)
            self._send_q.put(({"t": "act", "run": rid, "dead": True}, None))
            return
        x = _wire_uncast(_unpack_arrays(ameta["arrays"], ablob)["x"])
        dbg = os.environ.get("PIPEINFER_DCN_DEBUG_DIR")
        if dbg:  # per-stage run dumps (the counterpart of per-rank LOG files)
            np.savez(os.path.join(dbg, f"worker{self.stage}_run{rid}.npz"),
                     x=x, backend=jax.default_backend(), **dict(arrs))
        fn = _staged_step(self.cfg, False, self.last, topk if self.last else None)
        xd = jax.device_put(x, self.device)
        out, self.cache = fn(
            self.params, self.cache, xd,
            arrs["pos"], arrs["seq"], arrs["cell_idx"], arrs["valid"], arrs["seq_bits"],
        )
        self._send_q.put(({"t": "act", "run": rid, "dead": False}, out))

    def _handle_kv(self, meta: dict):
        from ..runtime import context as rc

        op = meta["op"]
        a = meta.get("args", {})
        c = self.cache
        if op == "seq_rm":
            c = rc._jit_seq_rm(c, a["seq_id"], a["p0"], a["p1"])
        elif op == "seq_cp":
            c = rc._jit_seq_cp(c, a["src"], a["dst"], a["p0"], a["p1"])
        elif op == "prepare":
            c = rc._jit_prepare_seqs(c, np.int32(a["src"]),
                                     np.asarray(a["seqs"], np.int32), np.int32(a["p1"]))
        elif op == "consolidate":
            c = rc._jit_consolidate(c, np.int32(a["win"]),
                                    np.asarray(a["branch_seqs"], np.int32),
                                    np.int32(a["p0"]), np.int32(a["p1"]), np.int32(a["dst"]))
        elif op == "seq_keep":
            c = rc._jit_seq_keep(c, a["seq_id"])
        elif op == "rm_tail":
            c = rc._jit_rm_tail(c, a["p0"])
        elif op == "shift":
            c = rc._jit_shift_cells(
                c, np.asarray(a["cells"], np.int32), np.int32(a["delta"]),
                np.int32(a["trash"]), self.cfg.rope_dims, self.cfg.rope_mode,
                self.cfg.rope_base, self.cfg.rope_scale)
        elif op == "clear":
            c = kv.clear(c)
        elif op == "hot":
            import dataclasses as _dc

            c = _dc.replace(c, hot=a["hot"])
        else:
            raise ValueError(f"unknown kv op {op}")
        self.cache = c

    # -- main loop -----------------------------------------------------------

    def serve(self) -> None:
        if self.bind_host not in ("localhost", "127.0.0.1", "::1") \
                and not _wire_token():
            raise RuntimeError(
                "refusing a non-loopback --bind without PIPEINFER_DCN_TOKEN "
                "set: any network peer could otherwise drive this worker"
            )
        lsock = socket.socket()
        lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        lsock.bind((self.bind_host, self.listen_port))
        lsock.listen(4)
        conns: dict[str, socket.socket] = {}
        ready = threading.Event()
        threading.Thread(target=self._accept_loop, args=(lsock, conns, ready),
                         daemon=True).start()
        out_role = "logits" if self.last else "data"
        out_sock = _connect_retry(self.next_addr, out_role)
        if not ready.wait(timeout=60):
            raise TimeoutError("worker: missing inbound connections")
        ctrl, data, cancel = conns["ctrl"], conns["data"], conns["cancel"]
        threading.Thread(target=self._data_reader, args=(data,), daemon=True).start()
        threading.Thread(target=self._cancel_reader, args=(cancel,), daemon=True).start()
        sender = threading.Thread(target=self._sender, args=(out_sock,), daemon=True)
        sender.start()
        # config fingerprint: the head validates that cell indexing and
        # layer ranges agree before any decode (a silent mismatch would
        # corrupt shared cell indices across stages)
        send_msg(ctrl, {
            "t": "ready", "stage": self.stage, "n_stages": self.n_stages,
            "n_cells": self.n_cells, "layers": list(self.layer_range),
            "n_embd": self.cfg.n_embd, "n_layers_total": self.cfg.n_layers,
        })
        try:
            while True:
                meta, payload = recv_msg(ctrl)
                t = meta["t"]
                if t == "decode":
                    self._handle_decode(meta, payload)
                elif t == "kv":
                    self._handle_kv(meta)
                elif t == "ping":
                    send_msg(ctrl, {"t": "pong"})
                elif t == "shutdown":
                    break
                else:
                    raise ValueError(f"unknown command {t}")
        finally:
            self._send_q.put(None)
            sender.join(timeout=10)
            for s in (ctrl, data, cancel, out_sock, lsock):
                try:
                    s.close()
                except OSError:
                    pass


def worker_main(argv: list[str] | None = None) -> None:
    """CLI entry: python -m pipeinfer_tpu.parallel.dcn --stage i ..."""
    import argparse

    ap = argparse.ArgumentParser(description="PipeInfer DCN stage worker")
    ap.add_argument("--model", required=True)
    ap.add_argument("--stage", type=int, required=True)
    ap.add_argument("--n-stages", type=int, required=True)
    ap.add_argument("--split", default=None,
                    help="comma-separated stage weights (--mpi-layer-split counterpart)")
    ap.add_argument("--listen-port", type=int, required=True)
    ap.add_argument("--next", required=True, help="host:port of next stage (or head)")
    ap.add_argument("--n-cells", type=int, default=1024)
    ap.add_argument("--cache-dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--bind", default="localhost",
                    help="listen address (default localhost; a non-loopback "
                         "bind for real multi-host runs REQUIRES "
                         "PIPEINFER_DCN_TOKEN on every peer)")
    args = ap.parse_args(argv)
    import jax

    # the axon TPU plugin ignores the JAX_PLATFORMS env var in this image;
    # force the platform through the config (same workaround as conftest)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    split = [float(x) for x in args.split.split(",")] if args.split else None
    host, port = args.next.rsplit(":", 1)
    StageWorker(
        args.model, args.stage, args.n_stages, split,
        args.listen_port, (host, int(port)), n_cells=args.n_cells,
        cache_dtype=jnp.bfloat16 if args.cache_dtype == "bf16" else jnp.float32,
        bind_host=args.bind,
    ).serve()


# ---------------------------------------------------------------------------
# head-side context (rank 0): stage 0 local + remote stage fan-out
# ---------------------------------------------------------------------------


class RemoteStagedContext(StagedInferenceContext):
    """InferenceContext-compatible engine whose stages 1..S-1 live in OTHER
    PROCESSES (the reference's multi-node deployment). The head keeps stage
    0 local (rank 0 also owns the first layer slab in the reference's
    --mpi-layer-split recipes) and the PipeInfer controller runs on top
    unchanged.

    workers: list of (host, ctrl_port) for stages 1..S-1, already serving.
    The head connects ctrl+cancel to each worker, streams stage-0 output
    activations to worker 1, and receives final logits from the last
    worker on its own listen socket."""

    def __init__(self, params, cfg, *, workers: Sequence[tuple[str, int]],
                 split: Sequence[float] | None = None, n_cells: int = 1024,
                 cache_dtype=None, head_port: int = 0,
                 connect_timeout: float = 900.0, head_bind: str = "localhost"):
        import jax
        import jax.numpy as jnp

        if not workers:
            raise ValueError(
                "RemoteStagedContext needs >= 1 stage worker; for a "
                "single-process pipeline use StagedInferenceContext"
            )
        n_stages = len(workers) + 1
        split = list(split) if split else [1.0 / n_stages] * n_stages
        assert len(split) == n_stages
        # local stage 0 (reuse the staged machinery with a single group,
        # but force first=True/last=False slicing)
        self.cfg = cfg
        n_cells = kv.round_pool(n_cells)
        self.n_cells = n_cells
        self.tp = 1
        dev = jax.devices()[0]
        self.groups = [[dev]]
        self.devices = [dev]
        self.meshes = [None]
        self.n_stages = n_stages
        self.ranges = split_ranges(cfg.n_layers, split)
        lo, hi = self.ranges[0]
        sp = {"layers": params["layers"][lo:hi]}
        for key in self.FIRST_STAGE_GLOBALS:
            if key in params:
                sp[key] = params[key]
        self.stage_params = [jax.device_put(sp, dev)]
        self.stage_specs = [None]
        self.caches = [jax.device_put(
            kv.create(hi - lo, n_cells, cfg.n_kv_heads, cfg.head_dim,
                      cache_dtype or jnp.bfloat16), dev)]
        self._init_host_state(n_cells)

        # listen for the last worker's logits stream (loopback by default;
        # real multi-host heads pass head_bind + PIPEINFER_DCN_TOKEN)
        self._head_bind = head_bind
        self._lsock = socket.socket()
        self._lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._lsock.bind((head_bind, head_port))
        self._lsock.listen(2)
        self.head_addr = ("localhost", self._lsock.getsockname()[1])

        self._ctrl: list[socket.socket] = []
        self._cancel: list[socket.socket] = []
        for host, port in workers:
            self._ctrl.append(_connect_retry((host, port), "ctrl", connect_timeout))
            self._cancel.append(_connect_retry((host, port), "cancel", connect_timeout))
        # data stream to worker 1 (stage-0 activations out)
        w0 = workers[0]
        self._data_out = _connect_retry((w0[0], w0[1]), "data", connect_timeout)
        # accept the logits connection from the LAST worker (authenticated:
        # an unauthenticated peer could inject logits into generation)
        self._lsock.settimeout(connect_timeout)
        deadline = time.monotonic() + connect_timeout
        while True:
            self._logits_sock, _ = self._lsock.accept()
            self._logits_sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            hello, _ = recv_msg(self._logits_sock)
            if hello.get("role") == "logits" and _check_hello(
                hello, bind_host=head_bind
            ):
                break
            self._logits_sock.close()
            if time.monotonic() > deadline:
                raise TimeoutError("no authenticated logits connection")
        self._lsock.settimeout(None)
        for wi, c in enumerate(self._ctrl):
            meta, _ = recv_msg(c)
            assert meta["t"] == "ready", meta
            # validate the shared-indexing config fingerprint: silently
            # mismatched pools/splits would corrupt cell indices
            want = {
                "stage": wi + 1, "n_stages": n_stages, "n_cells": n_cells,
                "layers": list(self.ranges[wi + 1]),
                "n_embd": cfg.n_embd, "n_layers_total": cfg.n_layers,
            }
            got = {k: meta.get(k) for k in want}
            if got != want:
                raise RuntimeError(
                    f"stage worker {wi + 1} config mismatch: head expects "
                    f"{want}, worker reports {got} — start workers with the "
                    "same --model/--split/--n-cells/--n-stages"
                )

        self._next_run = 0
        self._pending: dict[int, "queue.Queue"] = {}
        self._pending_lock = threading.Lock()
        self._hot = 0
        import concurrent.futures as _cf

        # single-thread sender: fetch order == dispatch order on the wire.
        # The high-water semaphore bounds queued ship closures (each pins a
        # device activation): a stalled worker backpressures decode_async
        # instead of growing host memory without limit
        self._send_pool = _cf.ThreadPoolExecutor(max_workers=1)
        self._ship_slots = threading.BoundedSemaphore(StageWorker.SEND_HIGH_WATER)
        # each in-flight run's eager fetch parks a worker on the result
        # queue until its logits frame lands — size for deep pipelines
        self._fetch_pool = _cf.ThreadPoolExecutor(max_workers=8)
        self._logits_thread = threading.Thread(target=self._logits_reader, daemon=True)
        self._logits_thread.start()

    # -- plumbing ------------------------------------------------------------

    def _stage_fn(self, si: int, topk):
        # the head's local slab is first=True, last=False, NO topk (logits
        # come back from the LAST worker) — overriding keeps the inherited
        # precompile warming the variant decode_async actually runs
        return _staged_step(self.cfg, True, False, None)

    def _logits_reader(self):
        try:
            while True:
                meta, payload = recv_msg(self._logits_sock)
                rid = meta["run"]
                with self._pending_lock:
                    q = self._pending.pop(rid, None)
                if q is not None:
                    if meta.get("dead"):
                        q.put(None)
                    else:
                        q.put(_unpack_arrays(meta["arrays"], payload)["x"])
        except (ConnectionError, OSError):
            with self._pending_lock:
                for q in self._pending.values():
                    q.put(ConnectionError("logits stream closed"))
                self._pending.clear()

    def _broadcast(self, meta: dict, payload: bytes = b""):
        for c in self._ctrl:
            send_msg(c, meta, payload)

    def _kv_all(self, op: str, **args):
        self._broadcast({"t": "kv", "op": op, "args": args})

    # -- decode --------------------------------------------------------------

    def decode_async(self, batch: Batch, topk: int | None = None) -> AsyncHandle:
        t0 = time.perf_counter()
        n = len(batch)
        t_pad = _bucket(n)
        cells = self.find_cells(n)
        tokens, pos, seq, seq_bits, cell_idx, valid, seq_rows = pack_batch(
            batch, t_pad, self.trash_cell, cells
        )
        self.h_pos[cells] = batch.pos
        self.h_seq[cells] = seq_rows
        self._refresh_hot_remote()

        rid = self._next_run
        self._next_run += 1

        # stage 0 locally (first=True, last=False)
        fn = _staged_step(self.cfg, True, False, None)
        x, self.caches[0] = fn(
            self.stage_params[0], self.caches[0], tokens, pos, seq,
            cell_idx, valid, seq_bits,
        )

        # broadcast the microbatch metadata to every worker (the pipelined
        # metadata bcast, ggml-mpi.c:236-347), then ship the activation
        ameta, blob = _pack_arrays({
            "pos": pos, "seq": seq, "seq_bits": seq_bits,
            "cell_idx": cell_idx, "valid": valid,
        })
        self._broadcast({"t": "decode", "run": rid, "topk": topk, "arrays": ameta}, blob)

        result_q: "queue.Queue" = queue.Queue(maxsize=1)
        with self._pending_lock:
            self._pending[rid] = result_q

        def ship(_x=x, _rid=rid):
            try:
                host = _wire_cast(np.asarray(_x))  # bf16 inter-stage wire
                am, bl = _pack_arrays({"x": host})
                send_msg(self._data_out, {"t": "act", "run": _rid, "arrays": am}, bl)
            finally:
                self._ship_slots.release()

        self._ship_slots.acquire()  # backpressure: bounded in-flight ships
        self._send_pool.submit(ship)

        def fetch(_n=n, _t0=t0, _topk=topk, _q=result_q, _isdecode=(n <= 2)):
            out = _q.get()
            if isinstance(out, Exception):
                raise out
            if out is None:
                return None  # dead (canceled) run
            if _topk is None:
                host = out[:_n]
            else:
                from ..sampling.samplers import SparseLogits

                packed = out[:_n]
                host = [
                    SparseLogits(
                        packed[i, _topk: 2 * _topk].astype(np.int32),
                        packed[i, :_topk],
                        float(packed[i, 2 * _topk]),
                    )
                    for i in range(_n)
                ]
            dt = time.perf_counter() - _t0
            with self._time_lock:
                if _isdecode:
                    self.t_eval += dt
                    self.n_eval += _n
                else:
                    self.t_prefill += dt
                    self.n_prefill += _n
            return host

        h = AsyncHandle(logits=x, fetch=fetch, cells=cells).start_fetch(self._fetch_pool)
        h.run_id = rid
        return h

    def cancel_run(self, handle: AsyncHandle):
        """Backwards-ring cancellation (ref: llama_cancel_run
        llama.cpp:9981-9993): overtakes queued decodes on the dedicated
        cancel channel; already-computed stages are sunk cost (the dead
        frame keeps the streams in sync)."""
        rid = getattr(handle, "run_id", None)
        if rid is None:
            return
        for c in self._cancel:
            send_msg(c, {"runs": [rid]})

    def _refresh_hot_remote(self):
        hot = kv.hot_bucket(self.h_pos, self.trash_cell)
        if hot != self._hot:
            self._hot = hot
            import dataclasses as _dc

            self.caches[0] = _dc.replace(self.caches[0], hot=hot)
            self._kv_all("hot", hot=hot)

    # -- seq ops: local stage 0 + remote fan-out -----------------------------

    def seq_rm(self, seq_id: int, p0: int = 0, p1: int = -1):
        self._kv_all("seq_rm", seq_id=int(seq_id), p0=int(p0), p1=int(p1))
        super().seq_rm(seq_id, p0, p1)

    def seq_cp(self, src: int, dst: int, p0: int = 0, p1: int = -1):
        self._kv_all("seq_cp", src=int(src), dst=int(dst), p0=int(p0), p1=int(p1))
        super().seq_cp(src, dst, p0, p1)

    def prepare_branch_seqs(self, seqs: list[int], src: int, p1: int):
        self._kv_all("prepare", seqs=[int(s) for s in seqs], src=int(src), p1=int(p1))
        super().prepare_branch_seqs(seqs, src, p1)

    def consolidate(self, win_seq: int, branch_seqs: list[int], p0: int, p1: int, dst: int = 0):
        self._kv_all("consolidate", win=int(win_seq),
                     branch_seqs=[int(s) for s in branch_seqs],
                     p0=int(p0), p1=int(p1), dst=int(dst))
        super().consolidate(win_seq, branch_seqs, p0, p1, dst)

    def rm_tail(self, p0: int):
        self._kv_all("rm_tail", p0=int(p0))
        super().rm_tail(p0)

    def seq_keep(self, seq_id: int):
        self._kv_all("seq_keep", seq_id=int(seq_id))
        super().seq_keep(seq_id)

    def seq_shift(self, seq_id: int, p0: int, p1: int, delta: int):
        # remote side receives the resolved cell list (the head owns the
        # metadata mirror; stages share identical cell indexing)
        hp1 = np.iinfo(np.int64).max if p1 < 0 else p1
        hit = kv.host_member(self.h_seq, seq_id)
        hit &= (self.h_pos >= p0) & (self.h_pos < hp1)
        cells = np.nonzero(hit)[0]
        if len(cells):
            n_pad = _bucket(len(cells))
            padded = np.full(n_pad, self.trash_cell, np.int32)
            padded[: len(cells)] = cells
            self._kv_all("shift", cells=[int(c) for c in padded],
                         delta=int(delta), trash=int(self.trash_cell))
        super().seq_shift(seq_id, p0, p1, delta)

    def clear_cache(self):
        self._kv_all("clear")
        for i in range(len(self.caches)):
            self.caches[i] = kv.clear(self.caches[i])
        self.h_pos[:] = -1
        self.h_seq[:] = 0

    # -- lifecycle -----------------------------------------------------------

    def ping(self, timeout: float = 30.0):
        """Round-trip a control frame through every worker (startup/liveness
        barrier); raises socket.timeout if a worker wedges."""
        for c in self._ctrl:
            send_msg(c, {"t": "ping"})
            c.settimeout(timeout)
            try:
                meta, _ = recv_msg(c)
            finally:
                c.settimeout(None)
            assert meta["t"] == "pong", meta

    def shutdown(self):
        """ref: the GGML_MPI_SHUTDOWN broadcast (ggml-mpi.c:100-114)."""
        self._send_pool.shutdown(wait=True)
        try:
            self._broadcast({"t": "shutdown"})
        except OSError:
            pass
        for s in self._ctrl + self._cancel + [self._data_out, self._logits_sock, self._lsock]:
            try:
                s.close()
            except OSError:
                pass


# ---------------------------------------------------------------------------
# local cluster launcher (tests / single-machine multi-process runs)
# ---------------------------------------------------------------------------


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def launch_local_cluster(model_path: str, n_stages: int, *,
                         split: Sequence[float] | None = None,
                         n_cells: int = 1024, cache_dtype: str = "bf16",
                         platform: str = "cpu",
                         env_extra: dict | None = None):
    """Spawn stages 1..S-1 as subprocesses of this machine and return
    (worker_addrs, head_port_hint, procs). Worker i listens on its port and
    forwards to worker i+1; the last forwards to the head's logits port
    (passed via --next after the head binds it).

    platform is FORCED into the workers' JAX_PLATFORMS (this image exports
    JAX_PLATFORMS=axon globally; inheriting it silently moves 'CPU test'
    workers onto the TPU, whose f32 matmuls run bf16 passes).

    A per-cluster shared secret is generated (unless PIPEINFER_DCN_TOKEN
    is already set) and exported to every worker AND this process, so the
    hello handshake authenticates even on loopback."""
    import secrets

    token = os.environ.get("PIPEINFER_DCN_TOKEN") or secrets.token_hex(16)
    os.environ["PIPEINFER_DCN_TOKEN"] = token
    ports = [_free_port() for _ in range(n_stages - 1)]
    head_port = _free_port()
    procs = []
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = platform
    env["PIPEINFER_DCN_TOKEN"] = token
    env["PYTHONPATH"] = os.pathsep.join(
        [str(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))]
        + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    if env_extra:
        env.update(env_extra)
    for i in range(1, n_stages):
        nxt = f"localhost:{ports[i]}" if i < n_stages - 1 else f"localhost:{head_port}"
        args = [
            sys.executable, "-m", "pipeinfer_tpu.parallel.dcn",
            "--model", str(model_path), "--stage", str(i),
            "--n-stages", str(n_stages), "--listen-port", str(ports[i - 1]),
            "--next", nxt, "--n-cells", str(n_cells),
            "--cache-dtype", cache_dtype,
        ]
        if split:
            args += ["--split", ",".join(str(x) for x in split)]
        procs.append(subprocess.Popen(args, env=env))
    workers = [("localhost", p) for p in ports]
    return workers, head_port, procs


if __name__ == "__main__":
    worker_main()
