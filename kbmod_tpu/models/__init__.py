"""Neural models for candidate vetting (flax/JAX)."""
