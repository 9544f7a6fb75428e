"""TPU compute kernels and numerical primitives."""
