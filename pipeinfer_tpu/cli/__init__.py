"""Command-line drivers (ref: examples/main, examples/speculative, examples/mpi)."""
