"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64 enabled.

Multi-chip sharding logic is validated on the host mesh
(xla_force_host_platform_device_count), matching how the driver dry-runs the
multichip path; float64 enables near-machine-precision comparison between the
JAX engine and the numpy oracle.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = _flags + ' --xla_force_host_platform_device_count=8'

import jax  # noqa: E402

jax.config.update('jax_enable_x64', True)
