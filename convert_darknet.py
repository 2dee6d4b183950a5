#!/usr/bin/env python
"""Entry-point shim: `python convert_darknet.py -c config.ini …` (reference CLI surface)."""
from yolojax.cli.convert_darknet import main

if __name__ == "__main__":
    raise SystemExit(main())
