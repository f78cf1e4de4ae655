"""Test harness: force CPU with 8 virtual devices (SURVEY.md §4 item 4) so
multi-device shard_map paths are exercised deterministically without a TPU
slice.

NOTE: this machine's sitecustomize registers the 'axon' TPU-tunnel PJRT
plugin at interpreter startup and pins JAX_PLATFORMS=axon — plain env vars
set here are too late and get overridden.  jax.config.update after import
wins, as long as it (and XLA_FLAGS) land before the first backend init.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8
