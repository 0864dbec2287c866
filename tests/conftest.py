"""Test config: force CPU with an 8-device virtual mesh.

The environment pre-imports jax via sitecustomize (axon TPU tunnel), so the
platform and matmul precision must be set through jax.config, which works as
long as no computation has run yet.  Multi-chip hardware is not available in
CI; sharding/pjit paths are validated on the virtual CPU mesh.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# XLA:CPU may run fp32 matmuls at reduced (bf16-like) precision by default;
# parity tests compare against float64-accumulating numpy/torch.
jax.config.update("jax_default_matmul_precision", "highest")
