"""Ingest-time layout optimization: the mirror must be a pure re-layout —
identical rows, schema, and values — with real row-group fan-out and a
working (mtime, size) cache key."""

from __future__ import annotations

import os

from creek_spark.sources.layout import optimize_layout
from tests.conftest import SF_DIR


def test_mirror_is_value_identical_and_chunked(tmp_path):
    import pyarrow.parquet as pq

    mirror = optimize_layout(
        SF_DIR, cache_root=str(tmp_path), target_groups=8
    )
    assert mirror != SF_DIR
    for t in ("lineitem", "orders", "events"):
        src = pq.read_table(os.path.join(SF_DIR, f"{t}.parquet"))
        dst_path = os.path.join(mirror, f"{t}.parquet")
        dst = pq.read_table(dst_path)
        assert src.schema == dst.schema
        assert src.equals(dst)  # byte-level value equality, order preserved
        if src.num_rows >= 8192 * 2:
            assert pq.ParquetFile(dst_path).metadata.num_row_groups > 1


def test_mirror_cache_hit_and_invalidation(tmp_path):
    mirror = optimize_layout(SF_DIR, cache_root=str(tmp_path))
    p = os.path.join(mirror, "lineitem.parquet")
    mtime = os.stat(p).st_mtime_ns
    # second call: cache hit, no rewrite
    optimize_layout(SF_DIR, cache_root=str(tmp_path))
    assert os.stat(p).st_mtime_ns == mtime
    # poke the marker to simulate the driver regenerating the source
    marker = p + ".src.json"
    with open(marker, "w") as f:
        f.write('{"mtime_ns": 0, "size": 0, "target_groups": 32}')
    optimize_layout(SF_DIR, cache_root=str(tmp_path))
    assert os.stat(p).st_mtime_ns != mtime  # rebuilt


def test_embeddings_multifile_capped_others_single_file(tmp_path):
    """Only the heavy-per-row-compute table (embeddings → the decimal
    PQ-encode folds) is cut into multiple files, capped at MULTIFILE_CAP
    — the round-12 blanket fan-out of every sub-4MB table anti-scaled at
    local[32] (9 headline rows regressed; the driver's 8-core run of the
    same tree beat the 32-core run 1.9×).  The cut must stay
    value-identical and order-preserving; every OTHER small table must
    stay a single file (one split — their per-row work is µs-cheap, so
    extra scan tasks are pure scheduler/GC overhead)."""
    import pyarrow.parquet as pq

    from creek_spark.sources.layout import MULTIFILE_CAP

    mirror = optimize_layout(SF_DIR, cache_root=str(tmp_path))
    src = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
    dst_path = os.path.join(mirror, "embeddings.parquet")
    assert os.path.isdir(dst_path), dst_path
    parts = [p for p in os.listdir(dst_path) if p.endswith(".parquet")]
    assert 1 < len(parts) <= MULTIFILE_CAP, parts
    assert src.equals(pq.read_table(dst_path))
    for t in ("documents", "orders", "events", "customer", "part"):
        dst = os.path.join(mirror, f"{t}.parquet")
        assert os.path.isfile(dst), dst  # single file = single split
        assert pq.read_table(os.path.join(SF_DIR, f"{t}.parquet")).equals(
            pq.read_table(dst)
        )
