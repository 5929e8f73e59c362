#!/bin/bash
# Run the test suite on the host CPU (8 virtual devices for sharding tests).
# The axon/TPU tunnel is bypassed: registration is skipped and the platform
# pinned to cpu (see tests/conftest.py).
cd "$(dirname "$0")"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  exec python -m pytest tests/ -q "$@"
