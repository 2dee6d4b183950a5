#!/usr/bin/env python
"""Regenerate tests/fixtures/onnx_tiny_golden.json (the emitted-bytes
stability fixture, VERDICT r2 #8).  Run after an INTENTIONAL exporter change
and commit the updated fixture together with the change:

    python scripts/onnx_fixture.py
"""

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    import jax

    # tests run on CPU (conftest); the fixture bytes must come from the same
    # backend so the BN-fold float ops match bit-for-bit
    jax.config.update("jax_platforms", "cpu")

    from test_onnx_export import _deterministic_blob

    blob = _deterministic_blob()
    fixture = {"sha256": hashlib.sha256(blob).hexdigest(), "length": len(blob)}
    path = os.path.join(REPO, "tests", "fixtures", "onnx_tiny_golden.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(fixture, f, indent=1)
    print(json.dumps(fixture))


if __name__ == "__main__":
    main()
