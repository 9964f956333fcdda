"""Test configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip hardware is not
available in CI): the env vars below must be set before jax initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache shared across suite runs (round-2 verdict
# flagged suite cost). Programs <1 s to compile stay uncached (jax default),
# so the cache holds only the expensive ones. The multihost subprocess tests
# deliberately STRIP this var: reloading persisted XLA:CPU AOT executables
# under jax.distributed hits a cpu_aot_loader machine-feature mismatch that
# kills one child (see tests/test_multihost.py).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/okt_test_jax_cache")

import jax  # noqa: E402

# The axon TPU plugin on this machine ignores JAX_PLATFORMS; force via config.
jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def calibration_file():
    return str(REPO_ROOT / "config" / "calibration.yaml")
