"""Device-side (JAX/XLA/Pallas) numeric kernels for kbmod_tpu."""
