"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes (the standard JAX substitute
for a real multi-chip TPU topology, SURVEY.md §4)."""

import os

# force CPU even when the session env points at a TPU platform (e.g. axon)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon sitecustomize force-registers the TPU tunnel platform via
# jax.config; override it back to CPU for the test mesh
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
