"""CLI entry points, mirroring the reference's repo-root scripts
(SURVEY.md §1: cache / train / eval / detect / demo_data + converters).

Every command takes ``-c config.ini [more.ini …]`` overlays and
``-m section/key=value`` modifications; thin shims at the repo root keep the
reference's invocation surface (``python train.py -c …``).
"""

from __future__ import annotations

import argparse
import logging

from ..config import add_config_arguments, load_config

__all__ = ["make_parser", "setup"]


def make_parser(description: str) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=description)
    add_config_arguments(parser)
    return parser


def setup(args):
    logging.basicConfig(
        level=getattr(logging, str(args.logging).upper(), logging.INFO),
        format="%(asctime)s %(levelname)s %(name)s: %(message)s")
    return load_config(args.config, args.modify or ())
