#!/bin/bash
# Round-5 chip pipeline, revision B: bench/parity first (using the good
# quirk-off dense-ladder checkpoint), quirk-on accuracy rerun (halved LR
# after the lr=1e-3 warmup-peak NaN) last.
cd /root/repo
L=artifacts_r05

echo "=== 3. export trained weights for the bench (quirk-off ckpt) ==="
python scripts/export_bench_weights.py /tmp/e2e_qoff_d32/ckpt/ckpt_000016 \
  > $L/export_weights.log 2>&1

echo "=== 4. bench candidate A: two-tier serving config ==="
BENCH_ITERS=16 timeout 7000 python bench.py > $L/bench_A_twotier.log 2>&1

echo "=== 5. bench candidate B: r4 single-window serving config ==="
BENCH_SAMPLER_OPTS='{"depth_group": 16, "stage2": {"band_rows": 24}, "stage3": {"band_rows": 49, "wb": 320}}' \
BENCH_ITERS=16 timeout 7000 python bench.py > $L/bench_B_single.log 2>&1

echo "=== 6. kernel parity at the serving config + trained weights ==="
PARITY_CKPT=/tmp/e2e_qoff_d32/ckpt/ckpt_000016 PARITY_CLAMP=1 \
PARITY_OUT=KERNEL_PARITY_r05.json \
PARITY_STAGE_OPTS='{"two_tier": true, "depth_group": 16, "stage1": {"narrow_wb": 160, "narrow_band_rows": 12, "wb": 192, "band_rows": 24}, "stage2": {"narrow_wb": 160, "narrow_band_rows": 12, "wb": 224, "band_rows": 32}, "stage3": {"narrow_wb": 160, "narrow_band_rows": 16, "wb": 320, "band_rows": 56}}' \
timeout 7000 python scripts/kernel_parity_onchip.py > $L/kernel_parity_r05.log 2>&1

echo "=== 7. fusion backend bench ==="
timeout 4000 python scripts/bench_fusion.py > $L/bench_fusion.log 2>&1

echo "=== 8. full-recipe train bench, rig-exact windows ==="
BENCH_TRAIN_SKIP_XLA=1 \
BENCH_TRAIN_SAMPLER_OPTS='{"depth_group": 16, "stage1": {"wb": 144, "band_rows": 20}, "stage2": {"wb": 176, "band_rows": 32}, "stage3": {"wb": 224, "band_rows": 56}}' \
timeout 9000 python scripts/bench_train.py > $L/bench_train_windowed.log 2>&1

echo "=== 9. quirk-on accuracy rerun (lr 5e-4) ==="
timeout 9000 python scripts/e2e_synthetic.py --epochs 16 --lr 5e-4 \
  --ndepths 32,16,8 --out ACCURACY_r05_quirkon.json \
  --workdir /tmp/e2e_qon_d32b > $L/e2e_quirkon_d32b.log 2>&1

echo "=== pipeline B done ==="
