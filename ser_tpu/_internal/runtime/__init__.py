"""Runtime orchestration: pipeline seam, registry, hooks, retries, postprocessing."""
