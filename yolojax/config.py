"""Config system: ini files + overlays + ``-m`` modifications + dotted paths.

Preserves the reference's config surface (SURVEY.md §2.1 — reference
``utils/__init__.py``: ``modify_config`` / ``parse_attr`` (recon)):

* one root ``config.ini`` holds every knob;
* ``-c extra.ini`` overlays additional files, later files win;
* ``-m section/key=value`` applies ad-hoc modifications (repeatable);
* values that name code are dotted import paths (e.g.
  ``model/dnn = yolojax.models.darknet.Darknet``) resolved at runtime, so the
  ini file *is* the model spec;
* ``get_cache_dir`` / ``get_model_dir`` key artifact directories off config.

The values resolve to yolojax symbols instead of torch modules; everything
else about the surface is kept so reference configs translate mechanically.
"""

from __future__ import annotations

import configparser
import hashlib
import importlib
import os
import re
from typing import Any, Iterable, Sequence

__all__ = [
    "load_config",
    "modify_config",
    "parse_attr",
    "get_eval_db",
    "get_cache_dir",
    "get_model_dir",
    "get_category_path",
    "add_config_arguments",
]

_ENV_RE = re.compile(r"\$\{([^}]+)\}")


def _expand(value: str) -> str:
    """Expand ``~`` and ``${ENV}`` references in config values."""
    value = _ENV_RE.sub(lambda m: os.environ.get(m.group(1), ""), value)
    return os.path.expanduser(value)


def default_config_path() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "config.ini")


def load_config(paths: Sequence[str] | str | None = None, modify: Iterable[str] = ()) -> configparser.ConfigParser:
    """Load the root config plus overlays, then apply ``-m`` modifications.

    ``paths`` lists ini files in increasing priority (later wins), matching the
    reference's ``-c`` flag semantics. ``modify`` holds ``section/key=value``
    strings from ``-m``.
    """
    config = configparser.ConfigParser(interpolation=None)
    if paths is None:
        paths = [default_config_path()]
    elif isinstance(paths, str):
        paths = [paths]
    for path in paths:
        with open(path) as f:
            config.read_file(f)
    modify_config(config, modify)
    return config


def modify_config(config: configparser.ConfigParser, modify: Iterable[str]) -> configparser.ConfigParser:
    """Apply ``section/key=value`` command-line modifications in order."""
    for cmd in modify:
        try:
            var, value = cmd.split("=", 1)
            section, key = var.split("/", 1)
        except ValueError as e:
            raise ValueError(f"bad -m modification {cmd!r}; expected section/key=value") from e
        if not config.has_section(section):
            config.add_section(section)
        config.set(section, key, value)
    return config


def parse_attr(path: str) -> Any:
    """Resolve a dotted import path (``pkg.mod.Symbol``) to the live object.

    This is the indirection that makes the ini file the model spec: the
    backbone class, transform list entries, and optimizer factory are all
    stored as dotted paths (reference ``utils.parse_attr`` (recon)).
    """
    path = path.strip()
    try:  # whole path may itself be a module (e.g. a dataset module)
        return importlib.import_module(path)
    except ImportError:
        pass
    module_name, _, attr = path.rpartition(".")
    if not module_name:
        raise ValueError(f"cannot resolve bare name {path!r}; need a dotted path")
    module = importlib.import_module(module_name)
    try:
        return getattr(module, attr)
    except AttributeError as e:
        raise AttributeError(f"{module_name!r} has no attribute {attr!r} (from config path {path!r})") from e


def parse_attr_list(value: str) -> list[Any]:
    """Resolve a whitespace-separated list of dotted paths (transform pipelines)."""
    return [parse_attr(p) for p in value.split()]


# --------------------------------------------------------------------------
# Artifact directory layout.  The reference keys cache/model dirs off config
# values (reference ``utils.get_cache_dir`` / ``get_model_dir`` (recon)); we
# keep the same scheme: <root>/cache/<category-name>, <root>/model/<model-name>.
# --------------------------------------------------------------------------

def get_root_dir(config: configparser.ConfigParser) -> str:
    return _expand(config.get("config", "root", fallback="~/.yolojax"))


def _category_tag(config: configparser.ConfigParser) -> str:
    return os.path.splitext(os.path.basename(config.get("cache", "category")))[0]


def get_cache_dir(config: configparser.ConfigParser) -> str:
    """Directory holding the pickled dataset caches for the configured category."""
    return os.path.join(get_root_dir(config), "cache", _category_tag(config))


def get_model_dir(config: configparser.ConfigParser) -> str:
    """Directory holding checkpoints for the configured model/category/name."""
    model = config.get("model", "dnn").strip().rsplit(".", 1)[-1]
    name = config.get("model", "name", fallback="yolojax")
    return os.path.join(get_root_dir(config), "model", _category_tag(config), model, name)


def get_eval_db(config: configparser.ConfigParser) -> str:
    return os.path.join(get_model_dir(config), "eval.jsonl")


def get_canvas(config: configparser.ConfigParser) -> int:
    """Host decode-canvas edge (``[data] canvas``), derived when unset/empty.

    The canvas is the per-image host→device payload (C²·3 bytes), so its
    size is the input-pipeline bandwidth knob.  When the key is absent (or
    explicitly emptied to re-enable derivation under a base config that
    sets it), size it to the largest train input plus the one-sided jitter
    crop margin — resolution beyond ``multi_scale_max·(1+jitter)`` only
    feeds the rare two-sided border expansion and is otherwise resized away
    on device — rounded up to a multiple of 32 and capped at the historical
    672 default (which the full 320–608 recipe derives to anyway).
    E.g. a 416-pinned run derives 512: (672/512)² = 1.7× fewer bytes/image.
    """
    raw = config.get("data", "canvas", fallback="").strip()
    if raw:
        return int(raw)
    hi = config.getint("train", "multi_scale_max", fallback=608)
    jitter = config.getfloat("transform", "jitter", fallback=0.2)
    return min(672, -(-int(hi * (1.0 + jitter)) // 32) * 32)


def get_category_path(config: configparser.ConfigParser) -> str:
    """Absolute path of the category (class names) file."""
    path = _expand(config.get("cache", "category"))
    if not os.path.isabs(path):
        path = os.path.join(os.path.dirname(default_config_path()), path)
    return path


def config_digest(config: configparser.ConfigParser, sections: Sequence[str]) -> str:
    """Stable digest of selected sections, for artifact cache invalidation."""
    h = hashlib.sha1()
    for section in sections:
        if config.has_section(section):
            for key, value in sorted(config.items(section)):
                h.update(f"{section}/{key}={value}\n".encode())
    return h.hexdigest()[:12]


def add_config_arguments(parser) -> None:
    """Install the shared ``-c`` / ``-m`` flags on an argparse parser.

    Mirrors the reference CLI surface (SURVEY.md §1: every entry point takes
    config overlays and modifications).
    """
    parser.add_argument(
        "-c", "--config", nargs="+", default=[default_config_path()],
        help="config ini files, later files override earlier ones",
    )
    # action="extend": repeated -m flags accumulate (the plain store action
    # would silently keep only the LAST -m group).  default=None, not [] —
    # extend mutates the default object in place across invocations.
    parser.add_argument(
        "-m", "--modify", nargs="+", action="extend", default=None,
        help="ad-hoc config modifications, section/key=value (repeatable)",
    )
    parser.add_argument("--logging", default="INFO", help="logging level")
