"""Model & training subsystem: heads, artifacts, training entrypoints."""
