#!/bin/bash
# Round-5 second measurement chain: grow the cross-attempt scaling-pair
# pool (attempts 3-5; attempt 5 doubles the corpus so each arm is long
# enough to average within-run window luck — r4 verdict #2's second lever),
# and rerun the per-query core-scaling legs on a 16x-replicated documents
# corpus (sf0.1 legs were fixed-cost-dominated at ~1.0x).
set -u
cd /root/repo
echo "[measure5b] scaling attempt 3 $(date -Is)"
python BENCH/scaling.py > BENCH/scaling_r5_attempt3.json 2> BENCH/scaling_r5_attempt3.log
echo "[measure5b] queries_scaling 16x $(date -Is)"
SPARK_GRAFT_SF_DIR=/dev/shm/sf_docs16 python BENCH/queries_scaling.py \
  > BENCH/queries_scaling_r5_16x.json 2> BENCH/queries_scaling_r5_16x.log
echo "[measure5b] scaling attempt 4 $(date -Is)"
python BENCH/scaling.py > BENCH/scaling_r5_attempt4.json 2> BENCH/scaling_r5_attempt4.log
echo "[measure5b] scaling attempt 5 (2x corpus, long arms) $(date -Is)"
SPARK_GRAFT_CRAWL_SCALE=640,20,400,160 SPARK_GRAFT_SCALING_REPS=2 \
  python BENCH/scaling.py > BENCH/scaling_r5_attempt5.json 2> BENCH/scaling_r5_attempt5.log
echo "[measure5b] done $(date -Is)"
