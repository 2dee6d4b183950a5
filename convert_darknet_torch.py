#!/usr/bin/env python
"""Alias for the reference's entry-point name: darknet .weights importer.

Maps to ``convert_darknet.py`` (yolojax checkpoints are npz pytrees, not
torch state_dicts — the import contract in SURVEY.md §3.5 is preserved).
"""
from yolojax.cli.convert_darknet import main

if __name__ == "__main__":
    raise SystemExit(main())
