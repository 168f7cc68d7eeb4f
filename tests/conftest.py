"""Test configuration: force JAX onto a virtual 8-device CPU mesh with x64.

This environment registers a single-tenant TPU PJRT plugin in every Python
process via sitecustomize (PALLAS_AXON_POOL_IPS). Tests must not touch the
real chip — initializing it blocks for minutes on the device claim — so the
axon backend must never be selected. The sitecustomize hook only *registers*
the plugin; the chip is claimed at backend initialization, which is lazy.
At conftest import no backend exists yet, so switching ``jax_platforms`` to
``cpu`` here keeps the plugin inert for the whole test run.

(An earlier version re-exec'd the interpreter with a cleaned environment
instead. That worked, but pytest's global fd-capture is already active when
conftest is imported, so the re-exec'd child inherited fd 1 pointing at the
parent's capture tempfile and the entire test report vanished — exit codes
were right, output was not. The in-process switch keeps stdout intact.)

The environment is also cleaned so subprocesses spawned by tests (the
scheduler's process pool, CLI round-trips) come up pure-CPU without
re-registering the plugin.

Multi-chip sharding logic is validated on the host mesh (8 virtual CPU
devices, matching how the driver dry-runs the multichip path); float64
enables near-machine-precision comparison between the JAX engine and the
numpy oracle.
"""

import os

# Clean the env first: affects this process's lazy config reads and every
# subprocess the tests spawn.
os.environ.pop('PALLAS_AXON_POOL_IPS', None)
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8')

import jax  # noqa: E402

# sitecustomize may have imported jax before this module ran, in which case
# the env vars above were read too early to matter — set the config directly.
# Backend initialization is lazy and nothing has forced it yet (asserted
# below), so this reliably selects pure CPU.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
jax.config.update('jax_enable_x64', True)

assert jax.devices()[0].platform == 'cpu', (
    'tests must run on CPU; the axon TPU backend was initialized before '
    'tests/conftest.py could redirect JAX — check sitecustomize ordering')
