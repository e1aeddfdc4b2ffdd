#!/bin/sh
# Canonical test runner: force local XLA compiles (the axon remote compile
# service targets a different CPU and can wedge; see memory notes) and the
# CPU platform.  First cold run compiles the scan kernels (~tens of
# minutes); the persistent cache makes reruns fast.
cd "$(dirname "$0")/.."
exec env -u PALLAS_AXON_REMOTE_COMPILE python -m pytest tests/ -q "$@"
