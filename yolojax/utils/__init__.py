"""Utilities: checkpointing, optimizers, metrics, visualization."""
