"""Test harness: run everything on an 8-device virtual CPU mesh.

Mirrors the reference's chex.set_n_cpu_devices pattern (SURVEY.md §4): all
sharding/pjit/collective logic is exercised against a fake 8-device topology
so tests never need TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")
