"""Round-12 optimization profiler (guide §1: measure first).

Times declared queries through the noop sink on a UI-enabled session and
attributes wall-clock to stages via the Spark UI REST API, so "which
Exchange / which scoring stage dominates" is answered by measurement
instead of plan-reading guesswork.

Usage:
  python tools/profile_r12.py q_knn_graph q_dbscan          # time + stage dump
  python tools/profile_r12.py --explain before q_knn_graph  # write plans/r12/<q>_before.txt
  python tools/profile_r12.py --explain after q_knn_graph   # write plans/r12/<q>_after.txt
  python tools/profile_r12.py --runs 3 q_dbscan             # min-of-3

Stage attribution: each query runs under its own job group; afterwards
/api/v1/applications/<id>/stages is filtered to stages submitted in the
query's time window (the REST store keeps everything in-process).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audios_to_dataset_spark.plans import all_queries  # noqa: E402
from audios_to_dataset_spark.session import tune  # noqa: E402


def get_ui_session():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("profile_r12")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.sql.autoBroadcastJoinThreshold",
                str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4050")
        .getOrCreate()
    )
    return tune(spark)


def _rest(path: str):
    url = f"http://localhost:4050/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def stage_dump(t_start_ms: float, t_end_ms: float, top: int = 12):
    try:
        apps = _rest("applications")
        app_id = apps[0]["id"]
        stages = _rest(f"applications/{app_id}/stages?status=complete")
    except Exception as exc:  # pragma: no cover
        print(f"  [stage dump unavailable: {exc!r}]")
        return
    def _ms(iso):
        return time.mktime(
            time.strptime(iso[:19], "%Y-%m-%dT%H:%M:%S")) * 1000 + float(
            iso[20:23] or 0)

    rows = []
    for s in stages:
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        done = s.get("completionTime")
        if not sub or not done:
            continue
        ts = _ms(sub)
        if not (t_start_ms - 1000 <= ts <= t_end_ms + 1000):
            continue
        wall = _ms(done) - ts
        rows.append((
            wall, s["executorRunTime"], s["stageId"],
            s["numCompleteTasks"],
            s.get("shuffleReadBytes", 0), s.get("shuffleWriteBytes", 0),
            s.get("inputBytes", 0), (s.get("name") or "")[:60],
        ))
    rows.sort(reverse=True)
    print("  top stages by wall ms (run = summed executor ms):")
    tot_wall = sum(r[0] for r in rows)
    for wall, rt, sid, nt, srd, swr, inb, name in rows[:top]:
        print(f"    wall={wall:>7.0f} run={rt:>8} stage={sid:>4} "
              f"tasks={nt:>3} shufR={srd:>9} shufW={swr:>9} "
              f"in={inb:>9}  {name}")
    print(f"  [{len(rows)} stages in window; wall sum {tot_wall:.0f} ms"
          " (stages can overlap)]")


def main() -> None:
    args = [a for a in sys.argv[1:]]
    explain_tag = None
    runs = 2
    if "--explain" in args:
        i = args.index("--explain")
        explain_tag = args[i + 1]
        del args[i:i + 2]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i:i + 2]
    plans_sub = "r12"
    if "--dir" in args:
        i = args.index("--dir")
        plans_sub = args[i + 1]
        del args[i:i + 2]
    stages = "--stages" in args
    if stages:
        args.remove("--stages")
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_ui_session()
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # small warmup to absorb session/codegen startup
    spark.range(2_000_000).selectExpr("sum(id) as s").collect()

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", plans_sub)
    os.makedirs(plans_dir, exist_ok=True)

    for name in names:
        fn = queries[name]
        if explain_tag:
            df = fn(spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            path = os.path.join(plans_dir, f"{name}_{explain_tag}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"{name}: wrote {path} ({len(txt.splitlines())} lines)")
            continue
        ts = []
        t_first = None
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"{name} run{r}")
            t0 = time.perf_counter()
            w0 = time.time() * 1000
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            w1 = time.time() * 1000
            ts.append(round(time.perf_counter() - t0, 3))
            if r == runs - 1 and stages:
                stage_dump(w0, w1)
            if t_first is None:
                t_first = (w0, w1)
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: runs={ts} min={min(ts)}")


if __name__ == "__main__":
    main()
