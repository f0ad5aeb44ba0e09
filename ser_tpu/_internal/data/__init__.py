"""Dataset subsystem: discovery, manifests, registry, consents, caches."""
