"""Test configuration: run everything on a virtual 8-device CPU mesh.

Tests never require TPU hardware (SURVEY.md §4 "consequence for the rebuild"):
the CPU backend checks numerics, and 8 virtual host devices exercise the real
sharded code paths (the JAX analog of multi-node-without-a-cluster).

Note: in this image jax is pre-imported by a site hook with
``JAX_PLATFORMS=axon`` already exported, so env-var settings are too late —
the platform must be forced through ``jax.config`` before first backend use.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
