#!/bin/bash
# Round-3 hardware sweep — run as soon as the TPU tunnel answers.
# Ordered so the most important artifacts land first if the tunnel
# drops again mid-run. Each stage appends to /tmp/r3_sweep.log.
set -u
cd /root/repo
LOG=/tmp/r3_sweep.log
echo "=== r3 hw sweep $(date -u +%FT%TZ) ===" >> "$LOG"

run() {
  echo "--- $1 ---" >> "$LOG"
  shift
  timeout 1800 "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

# 1. kernel correctness on real Mosaic (CPU tests never exercise it)
run "check_tpu" python tools/check_tpu.py

# 2. the headline bench (records setup_s with the new BVH cache; run
#    twice so the second run is warm-cache + warm-XLA)
run "bench cold" python bench.py
run "bench warm" python bench.py

# 3. interactive fps: tile-shape sweep at small scales (the >10 fps bar)
GLAZE_BENCH_SCALES=0.2,0.25 GLAZE_TILE=32x64 run "fps tile 32x64" python tools/bench_interactive.py
GLAZE_BENCH_SCALES=0.2,0.25 run "fps tile 128x16" python tools/bench_interactive.py
GLAZE_BENCH_SCALES=0.2,0.25 GLAZE_TILE=16x128 run "fps tile 16x128" python tools/bench_interactive.py
GLAZE_BENCH_SCALES=0.2,0.25 GLAZE_TILE=64x32 run "fps tile 64x32" python tools/bench_interactive.py

# 3b. window/queue knobs at small frames (the 1080p plateau sweep may
#     not hold when per-packet coherence collapses)
GLAZE_BENCH_SCALES=0.2 GLAZE_TILE=64x32 GLAZE_WINDOW_STEPS=2 run "fps 64x32 S2" python tools/bench_interactive.py
GLAZE_BENCH_SCALES=0.2 GLAZE_TILE=64x32 GLAZE_WINDOW_STEPS=4 run "fps 64x32 S4" python tools/bench_interactive.py

# 4. 1080p tile A/B (make sure squarer tiles don't regress the headline)
GLAZE_BENCH_PHASES=0 GLAZE_BENCH_SHARDED=0 GLAZE_TILE=32x64 run "bench 32x64" python bench.py

# 5. CLI time-to-first-pixel on mattest (VERDICT #3 done-criterion <20 s)
run "cli mattest ttfp" bash -c 'time python -m glaze_tpu.cli /root/reference/resources/mattest.glaze /tmp/mt.png --res 512x512 --spp 1'

echo "=== sweep done ===" >> "$LOG"
