"""Test harness config.

Tests run on a simulated 8-device CPU mesh (SURVEY.md §4 distributed test
strategy): hermetic, fast, and validates multi-chip sharding logic without a
TPU pod.

IMPORTANT environment quirk: this machine's ``PYTHONPATH`` injects
``/root/.axon_site/sitecustomize.py``, which imports jax at interpreter start
to register the axon (TPU-tunnel) PJRT backend and bakes ``JAX_PLATFORMS=axon``
into jax's config. Setting the env var here is therefore too late — we must
use ``jax.config.update``. ``XLA_FLAGS`` is still read at first backend
initialization, so setting it here (before any jax op runs) works.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

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


def pytest_collection_modifyitems(config, items):
    # Deterministic ordering keeps compile-cache reuse predictable.
    items.sort(key=lambda it: it.nodeid)


def pytest_sessionstart(session):
    # The smoke gate (CLAUDE.md) relies on .git/hooks/pre-commit, which is
    # unversioned state and does NOT survive a fresh clone. Warn loudly so a
    # new session installs it before committing anything.
    import subprocess

    try:
        git_dir = subprocess.run(
            ["git", "rev-parse", "--absolute-git-dir"],
            capture_output=True, text=True, cwd=pathlib.Path(__file__).parent,
        ).stdout.strip()
    except OSError:
        return
    if git_dir and not (pathlib.Path(git_dir) / "hooks" / "pre-commit").exists():
        import warnings

        warnings.warn(
            "smoke gate NOT enforced: .git/hooks/pre-commit is absent — "
            "run 'make install-hooks'",
            stacklevel=1,
        )
