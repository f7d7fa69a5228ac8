"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4: distributed logic must be
testable single-process).

This environment's sitecustomize registers an 'axon' TPU PJRT plugin at
interpreter start and pins ``jax_platforms`` to it, so the usual
JAX_PLATFORMS=cpu env var is not enough — the config must be reset after
import, before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# jax's default matmul precision truncates f32 operands to bf16; numerical
# parity tests need real f32 matmuls.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
