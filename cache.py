#!/usr/bin/env python
"""Entry-point shim: `python cache.py -c config.ini …` (reference CLI surface)."""
from yolojax.cli.cache import main

if __name__ == "__main__":
    raise SystemExit(main())
