"""Offline tooling: darknet weight import/export, anchor k-means, pruning."""
