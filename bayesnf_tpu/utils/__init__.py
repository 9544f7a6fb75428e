"""Auxiliary subsystems: profiling, checkpointing, logging."""
