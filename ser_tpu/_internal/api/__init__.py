"""Internal API owners backing the public ``ser_tpu.api`` facade."""
