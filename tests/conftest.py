"""Test configuration: force the local CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware (the TPU-world
analogue of a fake-cluster layer; see SURVEY.md §4).

The container's sitecustomize registers a tunnelled TPU ("axon") backend at
interpreter startup and pins ``jax_platforms`` to it; every dispatch then
pays network latency.  Tests must run on the host CPU, so we re-pin the
platform before any backend initialisation.  Best startup latency comes from
also disabling the registration hook:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402  (import after env setup)

# The axon register() hook (sitecustomize) overrides jax_platforms after env
# parsing; override it back before the backend is materialised.
try:
  jax.config.update('jax_platforms', 'cpu')
except Exception:
  pass

jax.config.update('jax_enable_x64', False)


def pytest_configure(config):
  config.addinivalue_line(
      'markers', 'slow: multi-minute end-to-end chains (deselect with '
      "-m 'not slow')")
