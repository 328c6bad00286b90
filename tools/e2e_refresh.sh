#!/bin/bash
# Round-5 measured end-to-end refresh (VERDICT item 4): one cold-cache
# run + N warm runs of the FULL demo-scale pipeline on the current
# tree, each on a fresh copy of one shared synthetic dataset so stage
# caching can't skip work. The per-stage JSON lines land in
# /tmp/e2e_<tag>.json; PERF.md's "Measured end-to-end" table is the
# median of the warm runs (host stages carry the tunnel's measured ~4x
# variance; see PERF.md).
#
# Usage: bash tools/e2e_refresh.sh [n_warm]
set -e
cd "$(dirname "$0")/.."
N_WARM=${1:-3}
SRC=/tmp/cdtpu_e2e_src
JIT=/tmp/jit_e2e_r5

if [ ! -f "$SRC/frames.txt" ]; then
  python - <<'EOF'
import os, sys, time
sys.path.insert(0, '.')
sys.path.insert(0, 'tests')
sys.path.insert(0, 'tools')
from demo_run import build_dataset
os.makedirs('/tmp/cdtpu_e2e_src', exist_ok=True)
t0 = time.perf_counter()
s, n = build_dataset('/tmp/cdtpu_e2e_src', 244, 224, 384)
print(f'build_dataset: {s:.1f}s, {n} flows, total {time.perf_counter()-t0:.1f}s')
EOF
fi

run_one () {
  tag=$1
  D=/tmp/cdtpu_e2e_$tag
  rm -rf "$D"
  cp -a "$SRC" "$D"
  echo "=== run $tag start $(date -u +%H:%M:%S) ==="
  CDTPU_JIT_CACHE=$JIT python tools/demo_run.py --path "$D" \
    > /tmp/e2e_$tag.json 2> /tmp/e2e_$tag.err
  echo "=== run $tag done $(date -u +%H:%M:%S) ==="
  grep '"stage"' /tmp/e2e_$tag.json | tail -12
  rm -rf "$D"
}

# cold: fresh executable cache (the dataset copy is also fresh)
rm -rf "$JIT"
run_one cold

for i in $(seq 1 "$N_WARM"); do
  run_one warm$i
done
python tools/e2e_summarize.py cold $(seq -f 'warm%g' 1 "$N_WARM")
echo "ALL DONE"
