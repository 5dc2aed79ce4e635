"""Test configuration: force an 8-device virtual CPU mesh before jax import.

This is the JAX fake-backend equivalent of a multi-node harness — all
multi-chip sharding tests run against 8 virtual CPU devices (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# persistent XLA compile cache: repeated suite runs skip recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache_cpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The machine's sitecustomize registers the axon TPU plugin at interpreter
# start and force-sets jax_platforms="axon,cpu" — override it back to CPU
# so tests are deterministic fp32 and the 8-device virtual mesh exists.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_ROOT = Path("/root/reference")


def has_reference() -> bool:
    return REFERENCE_ROOT.exists()
