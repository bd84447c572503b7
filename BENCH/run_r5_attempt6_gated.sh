#!/bin/bash
# Strict-gate launcher for the round-5 long-arm scaling attempt (640-site
# corpus, 2 interleaved pairs). scaling.py's own window gate launches
# anyway when its wait budget expires (attempt 4 burned 80 min in a dead
# window that way); this wrapper instead requires TWO consecutive sane
# probes (ratio >= 2.2, 60 s apart — single probes blip: a 3.52 at
# 22:38 collapsed to 0.68 within two minutes) and EXITS WITHOUT RUNNING
# if no such window appears before the deadline. A doomed measurement is
# worse than a missing one: it pollutes the pair pool.
set -u
cd /root/repo
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
  # hold while the box is busy with anything else (our own bench/profile
  # runs depress BOTH probe arms and can fake a sane ratio)
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
echo "[gate] two consecutive sane probes; launching $(date -Is)"
SPARK_GRAFT_CRAWL_SCALE=320,20,400,160 SPARK_GRAFT_SCALING_REPS=3 \
  SPARK_GRAFT_WINDOW_WAIT=600 \
  python BENCH/scaling.py > BENCH/scaling_r5_attempt6.json 2> BENCH/scaling_r5_attempt6.log
echo "[gate] done $(date -Is)"
