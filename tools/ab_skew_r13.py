"""Hot-src straggler micro-bench for the candidate repartition keying
(VERDICT r12 item 7 done-criterion: "a constructed hot-src ×10
micro-bench shows no single straggler task > 4× median").

Isolates exactly the exchange the verdict flagged: a candidate (src,
dst) frame with one ULTRA-HOT src (one id owning half of all candidate
rows — the worst case for hashpartitioning(src), which puts every one
of them in a single task), pushed through

  r12:  repartition(P, "src")         .distinct() + scoring + window
  r13:  repartition(P, "src", "dst")  .distinct() + scoring + window

with the same interpreted per-pair dot-product cost the real knn/LSH
scoring stage pays. Straggler evidence comes from the Spark UI REST
taskSummary of the scoring stage (median vs max executorRunTime), the
same source tools/profile_r12.py uses.

Usage: python tools/ab_skew_r13.py [--hot 2000000] [--bg 2000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from audios_to_dataset_spark.operators.similarity import (  # noqa: E402
    _dot,
)
from audios_to_dataset_spark.session import tune  # noqa: E402


def get_ui_session():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("ab_skew_r13")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4051")
        .getOrCreate()
    )
    return tune(spark)


def _rest(path: str):
    url = f"http://localhost:4051/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def scoring_stage_skew(t0_ms: float, t1_ms: float) -> dict:
    """max/median task runtime of the heaviest stage in the window."""
    apps = _rest("applications")
    app_id = apps[0]["id"]
    stages = _rest(f"applications/{app_id}/stages?status=complete")

    def _ms(iso):
        return (
            time.mktime(time.strptime(iso[:19], "%Y-%m-%dT%H:%M:%S"))
            * 1000
            + float(iso[20:23] or 0)
        )

    best = None
    for s in stages:
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        if not sub or not s.get("completionTime"):
            continue
        ts = _ms(sub)
        if not (t0_ms - 1000 <= ts <= t1_ms + 1000):
            continue
        if best is None or s["executorRunTime"] > best["executorRunTime"]:
            best = s
    if best is None:
        return {"error": "no stage found"}
    q = _rest(
        f"applications/{app_id}/stages/{best['stageId']}/"
        f"{best['attemptId']}/taskSummary?quantiles=0.0,0.5,1.0"
    )
    lo, med, hi = q["executorRunTime"]
    return {
        "stage": best["stageId"],
        "tasks": best["numCompleteTasks"],
        "task_ms_median": med,
        "task_ms_max": hi,
        "max_over_median": round(hi / med, 1) if med else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hot", type=int, default=2_000_000)
    ap.add_argument("--bg", type=int, default=2_000_000)
    args = ap.parse_args()

    spark = get_ui_session()
    spark.sparkContext.setLogLevel("ERROR")
    sc_p = spark.sparkContext.defaultParallelism

    n_ids = 100_000
    # one hot src (id 0) with `hot` distinct dsts; background uniform
    hot = spark.range(args.hot).select(
        F.lit(0).alias("src"), (F.col("id") % n_ids + 1).alias("dst")
    )
    bg = spark.range(args.bg).select(
        (F.pmod(F.xxhash64("id"), F.lit(n_ids)) + n_ids).alias("src"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_ids)) + 1).alias(
            "dst"
        ),
    )
    cand0 = hot.unionByName(bg).localCheckpoint(eager=True)
    # deterministic 32-dim unit-ish vectors per id
    ids = spark.range(-1, 2 * n_ids + 2).select(
        F.col("id").alias("vid"),
        F.transform(
            F.sequence(F.lit(1), F.lit(32)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id") * i), F.lit(1000)).cast(
                    "double"
                )
                / 1000.0
            ),
        ).alias("u"),
    ).localCheckpoint(eager=True)
    va = ids.select(F.col("vid").alias("src"), F.col("u").alias("ua"))
    vb = ids.select(F.col("vid").alias("dst"), F.col("u").alias("ub"))

    from pyspark.sql import Window

    w = Window.partitionBy("src").orderBy(F.col("cos").desc(), "dst")

    def run(keys: list[str], tag: str) -> None:
        spark.sparkContext.setJobDescription(tag)
        t0 = time.time() * 1000
        tw = time.perf_counter()
        out = (
            cand0.repartition(sc_p, *[F.col(k) for k in keys])
            .distinct()
            .join(F.broadcast(va), "src")
            .join(F.broadcast(vb), "dst")
            .withColumn("cos", _dot(F.col("ua"), F.col("ub")))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("src", "dst", "cos")
        )
        out.write.mode("overwrite").format("noop").save()
        wall = round(time.perf_counter() - tw, 3)
        t1 = time.time() * 1000
        print(
            {
                "variant": "+".join(keys),
                "wall_s": wall,
                "scoring_stage": scoring_stage_skew(t0, t1),
            },
            flush=True,
        )

    for rep in range(2):  # first run is warmup-ish; print both
        run(["src"], f"r12 src-keyed #{rep}")
        run(["src", "dst"], f"r13 pair-keyed #{rep}")


if __name__ == "__main__":
    main()
