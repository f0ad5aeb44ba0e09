"""Internal implementation packages. Import stability is only guaranteed for ser_tpu.* facades."""
