"""Log-level gate for the WindowExec "No Partition Defined" warning.

Round-9 verdict item: the bounded summary walkers (segment offsets,
calendar-day cumulatives, grand-total histogram folds) used to run as
genuinely unpartitioned windows — correct and cheap by construction, but
their 187 warnings per full-catalog run drowned the one signal that
matters at scale.  They now carry `const_partition` keys, so a clean run
must log ZERO such warnings and any occurrence is a real unbounded
global window.

The gate runs in a SUBPROCESS with its own SparkSession: log4j writes to
the fds the JVM inherited at spawn, so in-process capfd capture is
order-dependent (it only works in whichever test happened to spawn the
JVM).  A subprocess owns its JVM for the test's whole life — the capture
is deterministic, and the same run proves the canary (a deliberately
unpartitioned window DOES log the warning), so a green gate can't be
vacuous.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # subprocess/fuzz/e2e tier - see pytest.ini

import os
import subprocess
import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

_SCRIPT = r"""
import sys
from creek_spark.session import get_spark
from pyspark.sql import Window
from pyspark.sql import functions as F
import __spark_entry__ as entrymod

SF_DIR = sys.argv[1]
spark = get_spark(app_name="window_warning_gate", shuffle_partitions=8)
spark.sparkContext.setLogLevel("WARN")

# ROUND-10 (verdict item 6): the WHOLE registry, not 8 representative
# walkers — the empty-allow-list invariant ("any WindowExec warning is
# a real unbounded global window") is enforced at every catalog site.
cat = entrymod._catalog()
failed = []
for name, q in sorted(cat.items()):
    try:
        q.fn(spark, SF_DIR).collect()
    except Exception as e:  # surfaced as a hard failure below
        failed.append(f"{name}: {type(e).__name__}: {e}")
for f in failed:
    print("QUERY_FAILED", f, flush=True)
print(f"WALKERS_DONE n={len(cat)} failed={len(failed)}", flush=True)

# canary: this MUST warn, or the whole capture is vacuous
df = spark.range(100).select((F.col("id") % 7).alias("k"))
w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
df.withColumn("c", F.count(F.lit(1)).over(w)).collect()
print("CANARY_DONE", flush=True)
spark.stop()
"""


def test_full_catalog_logs_no_global_window_warning():
    """One subprocess drives EVERY registered catalog query at sf0.001
    and asserts the JVM logged zero `WindowExec: No Partition Defined`
    warnings — then the canary (a deliberately unpartitioned window)
    proves the capture isn't vacuous.  Any query that fails to run is a
    hard failure too: a gate that skips broken queries gates nothing."""
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, SF_DIR],
        capture_output=True,
        text=True,
        timeout=2700,
        env=env,
    )
    log = proc.stdout + proc.stderr
    assert proc.returncode == 0, log[-3000:]
    assert "CANARY_DONE" in log, log[-3000:]
    assert "QUERY_FAILED" not in log, [
        line for line in log.splitlines() if "QUERY_FAILED" in line
    ]
    walkers_log = log.split("WALKERS_DONE")[0]
    canary_log = log.split("WALKERS_DONE")[1]
    assert " failed=0" in log, log[-3000:]
    # zero warnings across the FULL catalog (empty allow-list) ...
    assert "No Partition Defined" not in walkers_log, (
        [l for l in walkers_log.splitlines() if "WindowExec" in l][:5]
    )
    # ... while the canary proves the warning IS logged and captured
    assert "No Partition Defined" in canary_log, canary_log[-3000:]


def test_const_partition_is_bitwise_noop(spark):
    """const_partition changes the LOG, never the RESULT: running sums
    and grand totals over NULL-bearing keys equal the empty-spec form."""
    from creek_spark.operators.distributed import const_partition

    df = spark.range(200).select(
        F.when(F.col("id") % 11 == 0, None)
        .otherwise(F.col("id") % 13)
        .alias("k"),
        F.lit(1).alias("one"),
    )
    s = df.groupBy("k").agg(F.sum("one").alias("n"))
    w0 = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    w1 = (
        Window.partitionBy(const_partition("k"))
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    a = s.withColumn("c", F.sum("n").over(w0)).orderBy("k").collect()
    b = s.withColumn("c", F.sum("n").over(w1)).orderBy("k").collect()
    assert a == b
    t0 = s.withColumn("t", F.sum("n").over(Window.partitionBy())).orderBy("k")
    t1 = s.withColumn(
        "t", F.sum("n").over(Window.partitionBy(const_partition("k")))
    ).orderBy("k")
    assert t0.collect() == t1.collect()


def test_const_partition_survives_optimizer(spark):
    """The key must REACH WindowExec's partition spec — plain lit(0)
    and x*0 over non-nullable x constant-fold out of the spec (measured
    on Spark 4.1), which would silently resurrect the warning."""
    import re

    from creek_spark.operators.distributed import const_partition

    df = spark.range(50).select((F.col("id") % 5).alias("k"))
    s = df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy(const_partition("k"))
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    q = s.withColumn("c", F.sum("n").over(w))
    plan = q._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"windowspecdefinition\((.{0,60})", plan)
    assert m is not None, plan
    head = m.group(1).split(" ASC")[0]
    # a partition attribute (contains #) precedes the ordering column
    assert "," in m.group(1) and "#" in head, plan
