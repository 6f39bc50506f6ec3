"""One-shot audit: time the Python-side DataFrame CONSTRUCTION of every
declared query (fn(spark, sf_dir), no action). Guide §1 measurement for
the r12 finding that driver-side plan building (py4j round trips, eager
count()s, eager checkpoints) can dwarf stage wall time.

Queries whose build runs eager jobs (fixpoints, memoized counts) are
reported as-is; run twice and read the WARM column for those.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audios_to_dataset_spark.plans import all_queries  # noqa: E402
from audios_to_dataset_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or sorted(all_queries())
    queries = all_queries()
    rows = []
    for name in names:
        fn = queries[name]
        try:
            t0 = time.perf_counter()
            fn(spark, sf_dir)
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            fn(spark, sf_dir)
            warm = time.perf_counter() - t0
        except Exception as exc:
            print(f"{name}: BUILD ERROR {exc!r}")
            continue
        rows.append((warm, cold, name))
    rows.sort(reverse=True)
    print(f"{'warm_s':>8} {'cold_s':>8}  query  (top 40 by warm build)")
    for warm, cold, name in rows[:40]:
        print(f"{warm:8.3f} {cold:8.3f}  {name}")
    tot = sum(r[0] for r in rows)
    print(f"[{len(rows)} queries; warm build sum {tot:.1f} s]")


if __name__ == "__main__":
    main()
