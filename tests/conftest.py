"""Test harness: run everything on an 8-device virtual CPU mesh.

Mirrors the reference's chex.set_n_cpu_devices pattern (SURVEY.md §4): all
sharding/pjit/collective logic is exercised against a fake 8-device topology
so tests never need TPU hardware.

NOTE: this environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel) and a
sitecustomize imports jax early, so env vars alone don't stick — we must use
jax.config.update before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # belt and braces for subprocesses
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
