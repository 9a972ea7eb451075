"""Multi-host (DCN) initialization and global meshes.

The reference scales across hosts with an MPI world (mpirun + ggml-mpi ring,
ref: ggml-mpi.c:38-75 init, README.md:144-160 hostfile UX). The TPU-native
counterpart is `jax.distributed`: every process connects to a coordinator,
`jax.devices()` becomes the GLOBAL device list, and the same pjit/shard_map
programs run unchanged — XLA routes intra-host collectives over ICI and
cross-host ones over DCN. There is no tag protocol and no rank loop: each
process executes the same jitted step on its addressable shard of the mesh.

`global_mesh` builds the (data, stage, model) mesh over all processes'
devices, laid out so the STAGE axis crosses hosts (pipeline ppermute hops
are the low-bandwidth DCN traffic — one activation per microbatch — while
tensor-parallel psums stay host-local, the same placement logic as the
reference's one-pipeline-stage-per-node split)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Connect this process to the JAX distributed runtime (the mpirun
    counterpart). Must run before any other JAX call (like MPI_Init).
    No-op when already initialized or single-process."""
    if coordinator_address is None:
        return  # single-process run
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized (e.g. by the launcher)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(pp: int = 1, tp: int = 1, dp: int = 1) -> Mesh:
    """Mesh over ALL processes' devices, stage axis outermost so each
    pipeline stage lands on one host where possible."""
    devs = np.array(jax.devices())
    need = pp * tp * dp
    if len(devs) < need:
        raise ValueError(f"need {need} devices, have {len(devs)} global")
    devs = devs[:need].reshape(pp, dp, tp).transpose(1, 0, 2)
    return Mesh(devs, ("data", "stage", "model"))


def replicate_to_mesh(tree, mesh: Mesh):
    """Host-local pytree → global arrays replicated over the mesh. Every
    process must call with identical values (the model-load pattern: each
    host mmaps the same GGUF, the counterpart of the reference's NFS-shared
    model files + per-rank mmap)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, repl), tree)
