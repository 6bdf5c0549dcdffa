"""Multi-chip sharding: element-axis meshes, halo exchange, distributed solves."""
