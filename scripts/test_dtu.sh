#!/usr/bin/env bash
# DTU test inference + dypcd fusion (parity: reference scripts/test.sh —
# 1152x864, N=5, conf 0.1/0.15/0.9, dist_base 1/4, rel_diff_base 1/1300).
set -eu
DTU_TESTPATH=${DTU_TESTPATH:-/data/dtu/dtu_test}
CKPT=${CKPT:-./checkpoints/dtu/ckpt_000015}
OUTDIR=${OUTDIR:-./outputs/dtu}
mkdir -p "$OUTDIR"
python -m damvsnet_tpu.cli.test \
  --dataset general_eval \
  --testpath "$DTU_TESTPATH" --testlist lists/dtu/test.txt \
  --loadckpt "$CKPT" --outdir "$OUTDIR" \
  --numdepth 192 --interval_scale 1.06 --num_view 5 \
  --max_h 864 --max_w 1152 \
  --ndepths "64,32,8" --filter_method dypcd --conf "0.1,0.15,0.9" \
  "$@" 2>&1 | tee -a "$OUTDIR/log.txt"
