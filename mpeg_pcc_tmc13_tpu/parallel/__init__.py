"""Multi-chip scaling: slice-parallel sharding over a jax device Mesh."""
