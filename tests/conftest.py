"""Test harness config.

Tests run on a simulated 8-device CPU mesh (SURVEY.md §4 distributed test
strategy): hermetic, fast, and validates multi-chip sharding logic without a
TPU pod. Environment must be set before jax is first imported.
"""

import os

# Hard-set (not setdefault): the machine env pins JAX_PLATFORMS=axon (the
# real-TPU tunnel); tests must run on the simulated 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"


@pytest.fixture(scope="session")
def goldens():
    def load(name):
        path = GOLDEN_DIR / name
        if not path.exists():
            pytest.skip(f"golden file {name} missing — run tools/gen_goldens.py")
        return np.load(path)

    return load
