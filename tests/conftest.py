"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the TPU-native analog of a fake
backend): the env vars below must be set before jax is first imported.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# hermetic: never attempt checkpoint downloads from tests (the gated
# real-checkpoint tests check for already-present files instead)
os.environ["CDTPU_NO_FETCH"] = "1"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize boot hook force-selects the "axon"
# TPU platform via an explicit config update, which overrides
# JAX_PLATFORMS. Override it back: tests must run on the virtual
# 8-device CPU mesh, never the tunneled real chip.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Persistent compilation cache: the twin-compile tests dominate suite
# wall-clock; cache their executables across runs. Host-scoped like the
# production cache (utils/jit_cache.py): XLA's cache key does not cover
# the CPU feature set, and loading another machine's XLA:CPU AOT
# executable warns about SIGILL-level feature mismatches.
from consistent_depth_tpu.utils.jit_cache import _host_fingerprint  # noqa: E402

_CACHE_DIR = os.environ.get(
    "CDTPU_TEST_CACHE",
    os.path.expanduser(
        "~/.cache/cdtpu_jax_test_cache-" + _host_fingerprint()))
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:  # pragma: no cover - older jax without these flags
    pass

REFERENCE_ROOT = "/root/reference"

import pytest  # noqa: E402


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


@pytest.fixture
def reference_root():
    """Path to the read-only reference checkout (used as a numeric test
    oracle only — never copied). Skips if unavailable."""
    if not has_reference():
        pytest.skip("reference checkout not available")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return REFERENCE_ROOT
