"""Layered summary of the cross-attempt scaling-pair pool.

Prints, from ``BENCH/scaling_pairs_pool.jsonl``:

* **primary** — the pre-registered pooled estimator (median of per-pair
  efficiencies over every pair whose 4N-arm *launch* probe met the window
  gate, ratio >= 2.2) — identical to ``scaling.pooled_summary``;
* **secondary (exploratory)** — the same median restricted to pairs whose
  4N arm ALSO ended in a sane window (``probe_4n_post_ratio`` >= 2.2).
  Post-run probes exist only for pairs measured after they were added
  (2026-08-19 19:59 onward), so this subset is smaller and is reported as
  context, never as the headline — the launch gate is the only gate that
  was fixed before the data came in;
* per-attempt medians and how many independent median-of-REPS attempts
  cleared the 0.8 bar (the r4 verdict's "two independent gated attempts"
  criterion);
* a per-scale breakdown (320- vs 640-site corpora), since the 640 corpus
  doubles per-run work W while the fixed driver cost F stays constant,
  raising the efficiency ceiling (W+F)/(W+4F);
* the **normalized layer** (round-5 bracketed pairs only): median
  eff_norm / ceiling_eff, split into low-drift pairs (kernel brackets
  moved < 15% across the arm — the pairs whose normalization is
  trustworthy) and all bracketed pairs;
* an **engine-version split**: pairs measured after the zero-copy
  bucket-slice writer landed (commit 1f5c9c8, 2026-08-21 ~03:50) run a
  different engine than earlier pairs and are summarized separately.

Run: python BENCH/pool_analysis.py
"""

from __future__ import annotations

import json
import statistics
from pathlib import Path

POOL = Path(__file__).resolve().parent / "scaling_pairs_pool.jsonl"
GATE = 2.2


def _med(effs: list[float]) -> float | None:
    return round(statistics.median(effs), 3) if effs else None


def main() -> None:
    pairs = [json.loads(ln) for ln in POOL.read_text().splitlines() if ln.strip()]
    gated = [p for p in pairs if p["probe_4n_ratio"] >= GATE]
    both = [p for p in gated if "probe_4n_post_ratio" in p]
    validated = [p for p in both if p["probe_4n_post_ratio"] >= GATE]

    by_attempt: dict[str, list[float]] = {}
    for p in gated:
        by_attempt.setdefault(p["attempt_ts"], []).append(p["efficiency"])
    attempt_medians = {ts: _med(effs) for ts, effs in sorted(by_attempt.items())}

    by_scale: dict[str, list[float]] = {}
    for p in gated:
        by_scale.setdefault(p["scale"], []).append(p["efficiency"])

    print(json.dumps({
        "pairs_total": len(pairs),
        "primary_launch_gated": {
            "n": len(gated),
            "median": _med([p["efficiency"] for p in gated]),
            "effs": sorted(p["efficiency"] for p in gated),
        },
        "secondary_launch_and_post_validated": {
            "n_with_post_probe": len(both),
            "n_validated": len(validated),
            "median": _med([p["efficiency"] for p in validated]),
            "effs": sorted(p["efficiency"] for p in validated),
        },
        "attempt_medians": attempt_medians,
        "attempts_passing_0_8": [ts for ts, m in attempt_medians.items()
                                 if m is not None and m >= 0.8],
        "by_scale": {s: {"n": len(e), "median": _med(e)}
                     for s, e in sorted(by_scale.items())},
        "normalized_layer": _normalized(gated),
        "engine_versions": _engine_split(gated),
    }, indent=2))


#: first attempt_ts measured on the post-1f5c9c8 engine (zero-copy
#: bucket-slice writer); earlier pairs measured the older writer
ENGINE_V2_SINCE = "2026-08-21T03:50:00"


def _normalized(gated: list[dict]) -> dict | None:
    br = [p for p in gated if p.get("eff_norm") is not None]
    if not br:
        return None
    low_drift = [p for p in br
                 if p.get("drift_n", 1) < 0.15 and p.get("drift_4n", 1) < 0.15]
    return {
        "bracketed_pairs": len(br),
        "median_eff_norm": _med([p["eff_norm"] for p in br]),
        "median_ceiling_eff": _med([p["ceiling_eff"] for p in br]),
        "low_drift": {
            "n": len(low_drift),
            "median_raw": _med([p["efficiency"] for p in low_drift]),
            "median_eff_norm": _med([p["eff_norm"] for p in low_drift]),
            "pairs": [{k: p[k] for k in
                       ("attempt_ts", "rep", "efficiency", "eff_norm",
                        "ceiling_eff", "drift_n", "drift_4n", "scale")}
                      for p in low_drift],
        },
    }


def _engine_split(gated: list[dict]) -> dict:
    v2 = [p for p in gated if p["attempt_ts"] >= ENGINE_V2_SINCE]
    v1 = [p for p in gated if p["attempt_ts"] < ENGINE_V2_SINCE]
    return {
        "pre_slice_writer": {"n": len(v1),
                             "median": _med([p["efficiency"] for p in v1])},
        "post_slice_writer": {"n": len(v2),
                              "median": _med([p["efficiency"] for p in v2]),
                              "median_eff_norm": _med(
                                  [p["eff_norm"] for p in v2
                                   if p.get("eff_norm") is not None])},
    }


if __name__ == "__main__":
    main()
