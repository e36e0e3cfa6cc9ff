"""Test configuration: run everything on a virtual 8-device CPU mesh with
float64 enabled, so numerics match the reference's double precision and the
multi-chip sharding paths execute without TPU hardware.

Note: the session environment force-registers the axon TPU backend and sets
jax_platforms via config (which overrides the JAX_PLATFORMS env var), so we
must override at the config level after import."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
