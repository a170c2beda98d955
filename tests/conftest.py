"""Test config: run everything on CPU with 8 virtual devices so mesh/pjit
tests exercise the same sharding code paths as a real TPU slice.

NOTE: merely setting JAX_PLATFORMS=cpu is not enough on hosts where a
sitecustomize registers a TPU plugin and re-forces the platform selection —
we must override the jax config *after* import, before any backend init."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
