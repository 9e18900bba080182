"""Test environment: CPU backend, 8 virtual devices, float64.

The container's sitecustomize force-registers the axon TPU plugin and sets
``jax_platforms="axon,cpu"`` at interpreter start, so the env-var route is
ineffective; we override the config post-import instead.  Multi-device
sharding logic runs without a TPU via XLA's host-platform device-count flag
(the standard JAX fake-backend trick — SURVEY.md section 4).  float64 is
enabled so parity tests against the reference's 1e-10 tolerances are
meaningful; TPU production runs use f32 (see README on precision).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
