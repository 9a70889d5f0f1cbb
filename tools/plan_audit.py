"""Whole-catalog physical-plan audit — the automated form of SURVEY §9's
shuffle inventory.  For every catalog query it records the scale-shape
facts the plan gates assert piecemeal:

  * exchanges:   hashpartitioning key-lists (corpus shuffles; the first
                 key tells you what the shuffle is bounded by)
  * windows:     windowspecdefinition partition prefixes — any entry
                 with an empty partition list is an ordered walk of a
                 summary (legitimate) or a scale bug (the gates decide;
                 this report makes them reviewable)
  * broadcasts:  BroadcastExchange / BroadcastHashJoin counts
  * python:      whether anything leaves the JVM
  * scans/imts:  parquet scans + InMemoryTableScans (cache reuse)

Writes PLAN_AUDIT.json at the repo root.  Run once per round:

    python tools/plan_audit.py [sf_dir]    # default /root/testdata/sf0.001
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as entrymod
    from creek_spark.session import get_spark

    spark = get_spark()
    cat = entrymod._catalog()
    out = {}
    for name in sorted(cat):
        try:
            df = cat[name].fn(spark, sf_dir)
            jqe = df._jdf.queryExecution()
            plan = jqe.executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — audit must cover the rest
            out[name] = {"err": f"{type(e).__name__}: {e}"[:300]}
            continue
        exchanges = [
            m.group(1).split(", ")
            for m in re.finditer(
                r"Exchange hashpartitioning\(([^)]*?), \d+\)", plan
            )
        ]
        ex_keys = sorted(
            {
                tuple(k.split("#")[0] for k in e if "#" in k)
                for e in exchanges
            }
        )
        windows = []
        for sp in re.finditer(r"windowspecdefinition\((.{0,200})", plan):
            txt = sp.group(1)
            head = txt.split(" ASC")[0].split(" DESC")[0]
            parts = [c.strip() for c in head.split(",")[:-1]]
            windows.append(
                tuple(p.split("#")[0] for p in parts if "#" in p)
            )
        out[name] = {
            "exchange_keys": [list(k) for k in ex_keys],
            "n_exchanges": len(exchanges),
            "window_partitions": sorted({list(w).__repr__() for w in windows}),
            "n_broadcast": plan.count("BroadcastExchange"),
            "python_stage": ("BatchEvalPython" in plan)
            or ("ArrowEvalPython" in plan)
            or ("FlatMapGroupsInPandas" in plan)
            or ("MapInPandas" in plan),
            "n_scans": plan.count("FileScan parquet") or plan.count("Scan parquet"),
            "n_imts": plan.count("InMemoryTableScan"),
        }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLAN_AUDIT.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    n_py = sum(1 for v in out.values() if v.get("python_stage"))
    n_err = sum(1 for v in out.values() if "err" in v)
    print(
        json.dumps(
            {
                "n_queries": len(out),
                "n_err": n_err,
                "n_python_stage": n_py,
                "total_exchanges": sum(
                    v.get("n_exchanges", 0) for v in out.values()
                ),
            }
        )
    )
    return 0 if n_err == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
