#!/bin/bash
# Round-5 chip pipeline: runs the remaining on-chip artifacts in sequence
# (single TPU; one process at a time). Logs under artifacts_r05/.
cd /root/repo
L=artifacts_r05

echo "=== 1. quirk-off accuracy (dense ladder) ==="
timeout 9000 python scripts/e2e_synthetic.py --align_corners --epochs 16 \
  --ndepths 32,16,8 --out ACCURACY_r05_quirkoff.json \
  --workdir /tmp/e2e_qoff_d32 > $L/e2e_quirkoff_d32.log 2>&1

echo "=== 2. quirk-on accuracy (reference-parity sampling) ==="
timeout 9000 python scripts/e2e_synthetic.py --epochs 16 \
  --ndepths 32,16,8 --out ACCURACY_r05_quirkon.json \
  --workdir /tmp/e2e_qon_d32 > $L/e2e_quirkon_d32.log 2>&1

echo "=== 3. export trained weights for the bench ==="
python scripts/export_bench_weights.py /tmp/e2e_qon_d32/ckpt/ckpt_000016 \
  > $L/export_weights.log 2>&1

echo "=== 4. bench candidate A: two-tier serving config ==="
BENCH_ITERS=16 timeout 7000 python bench.py > $L/bench_A_twotier.log 2>&1

echo "=== 5. bench candidate B: r4 single-window serving config ==="
BENCH_SAMPLER_OPTS='{"depth_group": 16, "stage2": {"band_rows": 24}, "stage3": {"band_rows": 49, "wb": 320}}' \
BENCH_ITERS=16 timeout 7000 python bench.py > $L/bench_B_single.log 2>&1

echo "=== 6. kernel parity at the serving config + trained weights ==="
PARITY_CKPT=/tmp/e2e_qon_d32/ckpt/ckpt_000016 PARITY_CLAMP=1 \
PARITY_OUT=KERNEL_PARITY_r05.json \
PARITY_STAGE_OPTS='{"two_tier": true, "depth_group": 16, "stage1": {"narrow_wb": 160, "narrow_band_rows": 12, "wb": 192, "band_rows": 24}, "stage2": {"narrow_wb": 160, "narrow_band_rows": 12, "wb": 224, "band_rows": 32}, "stage3": {"narrow_wb": 160, "narrow_band_rows": 16, "wb": 320, "band_rows": 56}}' \
timeout 7000 python scripts/kernel_parity_onchip.py > $L/kernel_parity_r05.log 2>&1

echo "=== 7. fusion backend bench ==="
timeout 4000 python scripts/bench_fusion.py > $L/bench_fusion.log 2>&1

echo "=== pipeline done ==="
