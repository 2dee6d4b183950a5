"""Parallelism: device mesh, shardings, and the sharded train step.

The reference's only strategy is single-process ``nn.DataParallel``
(SURVEY.md §2.17).  The TPU-native equivalent is SPMD over a 1-D data mesh:
batch sharded across ICI, parameters replicated, gradient all-reduce emitted
by XLA's GSPMD partitioner — no replicate/scatter/gather machinery.  On one
chip the mesh degenerates to plain jit, but the axis exists from day one.
"""

from .mesh import batch_sharding, make_mesh, make_train_step, replicated_sharding  # noqa: F401
