#!/bin/bash
# Round-5 measurement chain (run in background; BENCH/.measuring guards the
# scaling legs). Order: cheapest adjudication first, then the two gated
# scaling attempts in naturally different windows.
set -u
cd /root/repo
echo "[measure] samewindow --queries vs r3-final $(date -Is)"
python scripts/samewindow.py 754f3d6 3 --queries \
  > BENCH/samewindow_r5_queries_vs_r3final.json \
  2> BENCH/samewindow_r5_queries_vs_r3final.log
echo "[measure] scaling attempt 1 $(date -Is)"
python BENCH/scaling.py > BENCH/scaling_r5_attempt1.json 2> BENCH/scaling_r5_attempt1.log
echo "[measure] per-query core-scaling legs $(date -Is)"
python BENCH/queries_scaling.py > BENCH/queries_scaling_r5.json 2> BENCH/queries_scaling_r5.log
echo "[measure] scaling attempt 2 $(date -Is)"
python BENCH/scaling.py > BENCH/scaling_r5_attempt2.json 2> BENCH/scaling_r5_attempt2.log
echo "[measure] done $(date -Is)"
