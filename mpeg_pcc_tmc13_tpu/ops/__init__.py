"""Device compute passes (JAX/XLA/Pallas) and their numpy host mirrors."""
