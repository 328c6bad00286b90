#!/bin/sh
# Run the ENTIRE test suite (fast + compile-heavy slow tests) file by
# file, sequentially — one jax process at a time (two concurrent
# compiles double each other's wall-clock on small hosts), with
# per-file wall-clock so suite cost is attributable. The persistent
# test compile cache (tests/conftest.py) makes the second run cheap;
# see .claude/skills/verify/SKILL.md for measured cold/warm timings.
#
# Usage: sh tools/run_full_suite.sh [logfile]
log="${1:-/tmp/full_suite.log}"
: > "$log"
total_rc=0
suite_t0=$(date +%s)
for f in tests/test_*.py; do
    t0=$(date +%s)
    timeout 7200 python -m pytest "$f" -q >> "$log" 2>&1
    rc=$?
    dt=$(( $(date +%s) - t0 ))
    echo "[suite] $f rc=$rc ${dt}s" | tee -a "$log"
    [ "$rc" -ne 0 ] && total_rc=1
done
echo "[suite] TOTAL $(( $(date +%s) - suite_t0 ))s rc=$total_rc" | tee -a "$log"
exit $total_rc
