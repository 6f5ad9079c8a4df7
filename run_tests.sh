#!/bin/bash
# Run the test suite on a clean 8-device virtual CPU mesh (avoids holding the
# single TPU chip during development; the axon sitecustomize hook is disabled
# by unsetting its trigger env vars).
cd "$(dirname "$0")"
# Two xdist workers, grouped by file: separate processes bound the blast
# radius of a rare XLA:CPU compiler segfault that only reproduces hundreds
# of compiles into a single process, and use both host cores.
exec env -u PALLAS_AXON_POOL_IPS PYTHONPATH="$(pwd)" JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  python -m pytest tests/ -q -n 2 --dist loadfile "$@"
