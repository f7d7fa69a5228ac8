"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4: distributed logic must be
testable single-process).  Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# jax's default matmul precision truncates f32 operands to bf16; numerical
# parity tests need real f32 matmuls.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")
