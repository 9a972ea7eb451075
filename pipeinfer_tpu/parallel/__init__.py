"""Parallelism: device meshes, pipeline stages, collectives.

The TPU-native replacement for the reference's MPI backend (ggml-mpi.c):
layer-range pipeline splits become stage shards on a device mesh, activation
relays become ICI collectives (ppermute), and the head/worker tag protocol
becomes host-side async dispatch.
"""
