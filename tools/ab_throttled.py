"""Interleaved A/B replay benchmark: current repo vs a pinned prior commit.

When the shared host is memory-bandwidth-throttled for days (see BENCH.md),
absolute scaling legs say nothing about the code. This produces the next-best
evidence: the SAME 64M-event replay alternated A,B,A,B between two checkouts
in one window, with a host-health probe between legs — drift cancels across
the interleave, so the ratio is attributable to the code.

Usage: python tools/ab_throttled.py <other_checkout_dir> [n_events] [rounds]
Writes one JSON line; caller curates into BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_leg(checkout: str, n_events: int, cpus: int) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_CPUS": str(cpus),
            "AQ_BENCH_EVENTS": str(n_events),
            "AQ_BENCH_ONLY_REPLAY": "1",
            "AQ_BENCH_NO_CALIBRATE": "1",
            "AQ_BENCH_NO_HEALTH": "1",
            "PYTHONPATH": checkout,
        }
    )
    out = subprocess.run(
        [sys.executable, os.path.join(checkout, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600, cwd=checkout,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)["cdc_replay"]


def main():
    other = sys.argv[1]
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 64_000_000
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    cpus = int(os.environ.get("AQ_AB_CPUS", "16"))
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from host_health import probe

    legs = []
    for r in range(rounds):
        for tag, checkout in (("current", REPO), ("other", other)):
            h = probe()
            res = run_leg(checkout, n_events, cpus)
            legs.append(
                {
                    "round": r,
                    "which": tag,
                    "events_per_sec": res["events_per_sec"],
                    "sec": res["sec"],
                    "membw_16p_before": h["membw_16p_GBs"],
                }
            )
            print(json.dumps(legs[-1]), file=sys.stderr, flush=True)
    cur = max(l["events_per_sec"] for l in legs if l["which"] == "current")
    oth = max(l["events_per_sec"] for l in legs if l["which"] == "other")
    print(
        json.dumps(
            {
                "metric": f"interleaved A/B replay, {n_events} events, local[{cpus}]",
                "current_best_events_per_sec": cur,
                "other_best_events_per_sec": oth,
                "ratio_current_over_other": round(cur / oth, 3),
                "legs": legs,
            }
        )
    )


if __name__ == "__main__":
    main()
