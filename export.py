#!/usr/bin/env python
"""Entry-point shim: `python export.py -c config.ini …` (reference CLI surface)."""
from yolojax.cli.export import main

if __name__ == "__main__":
    raise SystemExit(main())
