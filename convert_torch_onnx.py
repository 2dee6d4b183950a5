#!/usr/bin/env python
"""Alias for the reference's entry-point name: inference-graph export.

Maps to ``export.py`` — the TPU-native interchange is StableHLO via
jax.export (ONNX emission is gated on the onnx package).
"""
from yolojax.cli.export import main

if __name__ == "__main__":
    raise SystemExit(main())
