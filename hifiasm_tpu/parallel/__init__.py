"""Multi-chip execution: device mesh, sharded kernels, collectives."""
