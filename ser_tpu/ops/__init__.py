"""TPU compute primitives: batched DSP, filterbanks, and Pallas kernels."""
