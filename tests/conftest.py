"""Test harness: simulate an 8-device TPU mesh on CPU.

The reference has no distributed tests (SURVEY §4); we close that gap by
forcing 8 virtual CPU devices so mesh-parameterized sharding tests run
without hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The image's sitecustomize force-registers the tunneled-TPU ('axon')
# backend and pins jax_platforms="axon,cpu", ignoring JAX_PLATFORMS.
# Unit tests must be hermetic on the virtual 8-device CPU mesh, so
# override the config before any device is touched.
import jax

jax.config.update("jax_platforms", "cpu")
assert all(d.platform == "cpu" for d in jax.devices())
