"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on a virtual 8-device CPU mesh (the same XLA GSPMD partitioner
runs on both backends). This must happen before any JAX backend
initialization, and must override the axon TPU plugin pinned via
sitecustomize.
"""

import os

os.environ['XLA_FLAGS'] = (
    os.environ.get('XLA_FLAGS', '') + ' --xla_force_host_platform_device_count=8'
).strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# Evaluation accumulators benefit from f64 on host CPU; device code uses
# explicit dtypes so this only widens host-side test math.
jax.config.update('jax_enable_x64', True)
