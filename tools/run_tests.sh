#!/bin/sh
# Canonical two-tier test runner (VERDICT r4 #10).
#
#   tools/run_tests.sh          # tier 1: fast green gate (~1-2 min)
#   tools/run_tests.sh slow     # tier 2: device-scan / interpret-mode
#                               #   kernels (minutes cold, ~15 min warm
#                               #   via the persistent /tmp/jaxcache-cpu)
#   tools/run_tests.sh all      # both tiers
#
# Compiles are forced local (the axon remote compile service targets a
# different CPU and can wedge; see memory notes) and onto the CPU
# platform (tests/conftest.py pins jax_platforms=cpu + an 8-device
# virtual mesh).
cd "$(dirname "$0")/.."
TIER="${1:-fast}"
shift 2>/dev/null || true
run() {
    env -u PALLAS_AXON_REMOTE_COMPILE python -m pytest tests/ -q "$@"
}
case "$TIER" in
  fast) exec env -u PALLAS_AXON_REMOTE_COMPILE \
        python -m pytest tests/ -q -m "not slow" "$@" ;;
  slow) exec env -u PALLAS_AXON_REMOTE_COMPILE \
        python -m pytest tests/ -q -m "slow" "$@" ;;
  all)  env -u PALLAS_AXON_REMOTE_COMPILE \
        python -m pytest tests/ -q -m "not slow" "$@" || exit 1
        exec env -u PALLAS_AXON_REMOTE_COMPILE \
        python -m pytest tests/ -q -m "slow" "$@" ;;
  *)    echo "usage: run_tests.sh [fast|slow|all] [pytest args...]" >&2
        exit 2 ;;
esac
