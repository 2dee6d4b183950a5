#!/usr/bin/env python
"""Entry-point shim: `python prune.py -c config.ini …` (reference CLI surface)."""
from yolojax.cli.prune import main

if __name__ == "__main__":
    raise SystemExit(main())
