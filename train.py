#!/usr/bin/env python
"""Entry-point shim: `python train.py -c config.ini …` (reference CLI surface)."""
from yolojax.cli.train import main

if __name__ == "__main__":
    raise SystemExit(main())
