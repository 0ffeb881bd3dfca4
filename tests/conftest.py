"""Test configuration: run everything on a virtual 8-device CPU mesh.

The ambient environment pins JAX_PLATFORMS=axon (a remote TPU tunnel with
remote compilation — far too slow for unit tests) and a sitecustomize hook
imports jax at interpreter startup, so env vars set here are too late for
jax's config defaults. We therefore override the config directly.
"""

import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

# XLA_FLAGS is parsed when the CPU backend is instantiated (later than this),
# so the env route still works for the virtual device count.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the e2e tests compile sizable XLA programs;
# caching them across pytest runs keeps the suite fast.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


# The full suite segfaulted twice (r4) in late-suite XLA CPU compiles: the
# process accumulates every compiled executable across ~200 tests and a
# late compile's large virtual allocation (~135 GB mmap request, dmesg
# __vm_enough_memory) is then refused. Dropping compiled-program caches
# between modules caps the growth; the on-disk compilation cache above
# makes the re-loads cheap.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
