#!/usr/bin/env python
"""Entry-point shim: `python detect.py -c config.ini …` (reference CLI surface)."""
from yolojax.cli.detect import main

if __name__ == "__main__":
    raise SystemExit(main())
