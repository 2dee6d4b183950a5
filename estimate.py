#!/usr/bin/env python
"""Entry-point shim: `python estimate.py -c config.ini …` (reference CLI surface)."""
from yolojax.cli.estimate import main

if __name__ == "__main__":
    raise SystemExit(main())
