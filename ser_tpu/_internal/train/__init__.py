"""Training evaluation: metrics and grouped splits."""
