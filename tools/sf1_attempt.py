"""Append ONE sf1 scaling attempt (10M events, 40/20/1-file modes, with
the same-window sha2 ceiling pair) to BENCH/sf1_r3.json without paying
for the full bench sweep — the per-attempt path bench.py's
_sf1_evidence() takes when SPARK_GRAFT_BENCH_SF1=1, extracted so extra
attempts for a new engine era cost ~15 min each instead of ~60.

Run: python tools/sf1_attempt.py   (exclusive host — nothing else
running; the quiet gate inside replay_at/sha2_ceiling still applies).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["SPARK_GRAFT_BENCH_SF1"] = "1"

import bench


def main() -> None:
    warm_dir = bench.ensure_event_log(50_000, html_repeat=4)
    out = bench._sf1_evidence(warm_dir, 1, 4)
    print(
        json.dumps(
            {
                "attempts": len(out.get("attempts", [])),
                "headline": out.get("multi_batch_40_files"),
                "current_engine": out.get("current_engine"),
            }
        )
    )


if __name__ == "__main__":
    main()
