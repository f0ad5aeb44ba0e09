"""JAX model families: classifier heads and transformer encoders."""
