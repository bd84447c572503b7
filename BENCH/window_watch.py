"""Continuous host-window probe logger for round-4 opportunistic scaling runs.

Logs one JSON line per probe to BENCH/window_probe_r4.jsonl: aggregate memcpy
GB/s at 1 and 4 processes and their ratio. The scaling measurement
(BENCH/scaling.py) is launched manually when this log shows a sane window
(ratio >= ~1.5); this watcher itself never launches Spark, so it is safe to
leave running while tests run (each probe costs ~2 s and ~256 MB).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from scaling import bandwidth_probe  # noqa: E402

LOG = Path(__file__).resolve().parent / "window_probe_r4.jsonl"
INTERVAL_S = 180


def main() -> None:
    while True:
        one = bandwidth_probe(1)
        four = bandwidth_probe(4)
        import os

        rec = {
            "t": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "gbps_1": one,
            "gbps_4": four,
            "ratio": round(four / max(one, 0.1), 2),
            # loadavg > ~2 means OUR OWN Spark runs are loading the box:
            # the 1-proc probe then competes worse than the 4-proc one and
            # the ratio reads high — only trust quiet-period rows
            "load1": round(os.getloadavg()[0], 1),
        }
        with LOG.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        time.sleep(INTERVAL_S)


if __name__ == "__main__":
    main()
