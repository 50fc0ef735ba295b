#!/bin/bash
# Round-5 chip pipeline, part 2 (run after r05_chip_pipeline.sh):
# overflow-free full-recipe train bench with rig-exact window budgets
# (scripts/compute_windows.py on the train rig: stage1 (140,20),
# stage2 (168,32), stage3 (216,56) — rounded up).
cd /root/repo
L=artifacts_r05

echo "=== 8. full-recipe train bench, rig-exact windows ==="
BENCH_TRAIN_SKIP_XLA=1 \
BENCH_TRAIN_SAMPLER_OPTS='{"depth_group": 16, "stage1": {"wb": 144, "band_rows": 20}, "stage2": {"wb": 176, "band_rows": 32}, "stage3": {"wb": 224, "band_rows": 56}}' \
timeout 9000 python scripts/bench_train.py > $L/bench_train_windowed.log 2>&1

echo "=== part-2 done ==="
