#!/usr/bin/env python
"""Entry-point shim: `python receptive_field.py -c config.ini …` (reference CLI surface)."""
from yolojax.cli.receptive_field import main

if __name__ == "__main__":
    raise SystemExit(main())
