#!/usr/bin/env python
"""Entry-point shim: `python demo_data.py -c config.ini …` (reference CLI surface)."""
from yolojax.cli.demo_data import main

if __name__ == "__main__":
    raise SystemExit(main())
