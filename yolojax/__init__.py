"""yolojax — a TPU-native YOLOv2/YOLO9000 object-detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``ruiminshen/yolo2-pytorch`` (see SURVEY.md for the structural analysis of the
reference).  The compute path is functional JAX compiled by XLA for TPU; hot
layout/postprocess ops have Pallas kernels; scaling is expressed as shardings
over a ``jax.sharding.Mesh`` rather than replicated-module data parallelism.

Layout (mirrors SURVEY.md §7):
    config.py     ini-driven configuration with overlays and -m modifications
    category.py   class lists and anchor tables
    ops/          pure numerics: iou, box decode, nms, loss, reorg
    models/       backbone zoo (Darknet-19, Tiny, MobileNet) + region head
    kernels/      Pallas TPU kernels (reorg, nms, depthwise conv)
    data/         dataset cache builder, augmentation graph, bucketed loader
    parallel/     device mesh + sharded train step
    utils/        checkpointing, metrics, visualization
    cli/          train / eval / detect / cache entry points
"""

__version__ = "0.1.0"
