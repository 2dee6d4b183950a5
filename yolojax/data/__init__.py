"""Data layer: dataset caches, fused device-side augmentation, bucketed loader.

Pipeline shape (TPU-first redesign of SURVEY.md §2.3–2.5):

1. ``cache.py`` — one-time offline parse of VOC XML / COCO JSON into pickled
   numpy records (the reference's interchange schema, kept byte-compatible).
2. ``dataset.py`` — host side: JPEG decode + paste into a fixed gray canvas
   (static shapes for XLA) + label padding to ``max_boxes``.
3. ``transform.py`` — the *fused* augmentation graph: jitter crop, resize,
   HSV jitter, horizontal flip, normalization — one jitted program per
   bucketed input size, run on device, boxes co-transformed in the same
   program (the reference runs all of this per-image in Python workers).
4. ``loader.py`` — background-thread batcher with multi-scale bucket
   scheduling and device prefetch.
"""
