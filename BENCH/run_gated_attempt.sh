#!/bin/bash
# Strict-gate launcher for a round-5 scaling attempt (generalization of
# run_r5_attempt5_gated.sh — same protocol, parameterized attempt tag).
#
# Usage: ATTEMPT=6 [SCALE=640,20,400,160] [REPS=2] [GATE_MAX_WAIT_S=14400] \
#        bash BENCH/run_gated_attempt.sh
#
# Protocol (see BENCH/BASELINE.md): scaling.py's own window gate launches
# anyway when its wait budget expires (r5 attempt 4 burned 80 min in a dead
# window that way); this wrapper instead requires TWO consecutive sane
# probes (memcpy 4p/1p ratio >= 2.2, 60 s apart — single probes blip) AND a
# quiet loadavg (our own bench/pytest runs depress BOTH probe arms and can
# fake a sane ratio), and EXITS WITHOUT RUNNING if no such window appears
# before the deadline. A doomed measurement is worse than a missing one: it
# pollutes the pair pool.
set -u
cd /root/repo
: "${ATTEMPT:?set ATTEMPT=<n>}"
SCALE=${SCALE:-640,20,400,160}
REPS=${REPS:-2}
OUT="BENCH/scaling_r5_attempt${ATTEMPT}.json"
LOG="BENCH/scaling_r5_attempt${ATTEMPT}.log"
DEADLINE=$(( $(date +%s) + ${GATE_MAX_WAIT_S:-14400} ))
probe() {
  python - <<'EOF'
import sys
sys.path.insert(0, 'BENCH')
from scaling import bandwidth_probe
bw1, bw4 = bandwidth_probe(1), bandwidth_probe(4)
print(f"{bw4 / max(bw1, 0.1):.2f}")
EOF
}
sane=0
while true; do
  if pgrep -f "pytest" > /dev/null; then
    echo "[gate] pytest running; holding $(date -Is)"; sane=0; sleep 120; continue
  fi
  load=$(cut -d' ' -f1 /proc/loadavg)
  if python -c "import sys; sys.exit(0 if float('$load') > 1.5 else 1)"; then
    echo "[gate] loadavg $load > 1.5; holding $(date -Is)"; sane=0; sleep 120; continue
  fi
  r=$(probe)
  echo "[gate] window ratio $r (consecutive sane: $sane) $(date -Is)"
  if python -c "import sys; sys.exit(0 if float('$r') >= 2.2 else 1)"; then
    sane=$((sane + 1))
    if [ "$sane" -ge 2 ]; then break; fi
    sleep 60
  else
    sane=0
    if [ "$(date +%s)" -gt "$DEADLINE" ]; then
      echo "[gate] no sane window before deadline; NOT running"; exit 3
    fi
    sleep 120
  fi
done
echo "[gate] two consecutive sane probes; launching attempt ${ATTEMPT} $(date -Is)"
SPARK_GRAFT_CRAWL_SCALE="$SCALE" SPARK_GRAFT_SCALING_REPS="$REPS" \
  SPARK_GRAFT_WINDOW_WAIT=600 \
  python BENCH/scaling.py > "$OUT" 2> "$LOG"
echo "[gate] done $(date -Is)"
