"""JAX/XLA/Pallas numerical kernels for the inference engine."""
