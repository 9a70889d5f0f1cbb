"""Per-query profiling harness for the optimization rounds.

For each headline query (or the names given on argv) it measures, at
$SPARK_GRAFT_SF_DIR scale with the bench's session and layout:

  * build_s    — Python DataFrame-construction time (driver only)
  * explain_s  — analysis+optimization time (first explain("formatted"))
  * run_s      — min over reps of the noop-sink execution (bench method)
  * jobs/stages — Spark job & stage counts of one execution (scheduler
                  overhead is stage-count-bound at local scale)

and writes the formatted plan to plans/r12/<name>_<tag>.txt.

Usage:
    python tools/profile_bench.py <tag> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from creek_spark.operators.cachereg import release_caches
    from creek_spark.session import get_spark
    from creek_spark.sources.layout import optimize_layout

    catalog = entry._catalog()
    sf_dir = optimize_layout(sf_dir)
    spark = get_spark(app_name="creek_spark_profile")
    sc = spark.sparkContext

    runs = [(q.name, q.fn) for q in catalog.values() if q.headline]
    from pyspark.sql import functions as F

    from creek_spark.operators.similarity import cosine_topk_fast
    from creek_spark.sources import read_table

    runs.append(
        (
            "similarity_topk_fast",
            lambda s, d: cosine_topk_fast(
                read_table(s, d, "embeddings"),
                read_table(s, d, "embeddings").where(F.col("vec_id") < 10),
                k=5,
            ),
        )
    )
    if only:
        runs = [(n, f) for n, f in runs if n in only]

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    os.makedirs(plans_dir, exist_ok=True)

    # warmup: run each once untimed so codegen/JIT and page cache settle
    for name, fn in runs:
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:
            print(f"WARMUP FAILED {name}: {e}", file=sys.stderr)
        release_caches()
        spark.catalog.clearCache()

    tracker = sc.statusTracker()
    results = {}
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    for name, fn in runs:
        sc.setJobDescription(f"profile:{name}")
        try:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            build_s = time.perf_counter() - t0

            t0 = time.perf_counter()
            jvm = spark.sparkContext._jvm
            plan = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            explain_s = time.perf_counter() - t0
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
            release_caches()
            spark.catalog.clearCache()

            best = float("inf")
            jobs = stages = 0
            for i in range(reps):
                jobs_before = len(tracker.getJobIdsForGroup(None) or [])
                t0 = time.perf_counter()
                d2 = fn(spark, sf_dir)
                d2.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                if dt < best:
                    best = dt
                release_caches()
                spark.catalog.clearCache()
            # job/stage counts from one dedicated run in its own group
            group = f"prof_{name}"
            sc.setJobGroup(group, name)
            d3 = fn(spark, sf_dir)
            d3.write.format("noop").mode("overwrite").save()
            job_ids = tracker.getJobIdsForGroup(group) or []
            jobs = len(job_ids)
            stages = sum(
                len(tracker.getJobInfo(j).stageIds)
                for j in job_ids
                if tracker.getJobInfo(j)
            )
            release_caches()
            spark.catalog.clearCache()
            sc.setLocalProperty("spark.jobGroup.id", None)

            results[name] = {
                "build_s": round(build_s, 3),
                "explain_s": round(explain_s, 3),
                "run_s": round(best, 3),
                "jobs": jobs,
                "stages": stages,
            }
            print(f"{name:32s} build={build_s:6.3f} explain={explain_s:6.3f} "
                  f"run={best:6.3f} jobs={jobs} stages={stages}", flush=True)
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"FAILED {name}: {e}", file=sys.stderr, flush=True)

    out = os.path.join(plans_dir, f"profile_{tag}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
