#!/usr/bin/env python
"""Entry-point shim: `python eval.py -c config.ini …` (reference CLI surface)."""
from yolojax.cli.eval import main

if __name__ == "__main__":
    raise SystemExit(main())
