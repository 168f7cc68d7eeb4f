"""Test configuration: force JAX onto a virtual 8-device CPU mesh with x64.

This environment registers a single-tenant TPU PJRT plugin in every Python
process via sitecustomize (PALLAS_AXON_POOL_IPS). Tests must not touch the
real chip — initializing it blocks for minutes on the device claim — so if
the plugin trigger is present we re-exec the interpreter with a cleaned
environment before any JAX backend is initialized. After the re-exec the
sitecustomize hook is inert and JAX runs pure-CPU.

Multi-chip sharding logic is validated on the host mesh
(xla_force_host_platform_device_count=8), matching how the driver dry-runs
the multichip path; float64 enables near-machine-precision comparison
between the JAX engine and the numpy oracle.
"""

import os
import sys

if os.environ.get('PALLAS_AXON_POOL_IPS'):
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env['JAX_PLATFORMS'] = 'cpu'
    flags = env.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in flags:
        env['XLA_FLAGS'] = flags + ' --xla_force_host_platform_device_count=8'
    os.execvpe(sys.executable, [sys.executable, '-m', 'pytest'] + sys.argv[1:], env)

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = _flags + ' --xla_force_host_platform_device_count=8'

import jax  # noqa: E402

jax.config.update('jax_enable_x64', True)
