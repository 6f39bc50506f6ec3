"""One-shot audit: find declared queries whose PHYSICAL plan evaluates
the same Python UDF expression more than once (guide §4.4 duplication:
an optimizer-inferred or user filter referencing a UDF-computed column
gets pushed below an Exchange and re-evaluates the UDF).

Prints, per query, ArrowEvalPython/BatchEvalPython argument signatures
seen >1x. Plan-only (no execution).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audios_to_dataset_spark.plans import all_queries  # noqa: E402
from audios_to_dataset_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or sorted(all_queries())
    queries = all_queries()
    hits = 0
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
        except Exception as exc:
            print(f"{name}: PLAN ERROR {exc!r}")
            continue
        # Collect the Arguments line following each Python-eval node header
        sigs = []
        lines = txt.splitlines()
        for i, ln in enumerate(lines):
            if re.match(r"^\(\d+\) (ArrowEvalPython|BatchEvalPython)", ln):
                for j in range(i + 1, min(i + 5, len(lines))):
                    if lines[j].startswith("Arguments:"):
                        # strip result expr-ids so the same UDF call
                        # compares equal across the two eval sites
                        sig = re.sub(r"#\d+", "#", lines[j])
                        sig = re.sub(r"\[pythonUDF\d+#\]", "", sig)
                        sigs.append(sig)
                        break
        dup = {s for s in sigs if sigs.count(s) > 1}
        if dup:
            hits += 1
            print(f"{name}: {len(sigs)} python-eval nodes, DUPES:")
            for s in sorted(dup):
                print(f"    {sigs.count(s)}x {s[:160]}")
    print(f"[{hits} queries with duplicated python-eval]")


if __name__ == "__main__":
    main()
