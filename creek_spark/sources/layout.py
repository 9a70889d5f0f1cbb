"""Ingest-time scan-layout optimization (the local OPTIMIZE analog).

The driver's testdata parquet ships ONE row group per file; parquet scans
cannot split below a row group, so every scan decodes on a single core no
matter how many executor threads exist.  Real deployments fix this at
ingest: data lands in the engine's preferred layout (bounded row groups →
parallel decode; see also sources/compaction.py and operators/zorder.py
for the maintenance-time variants).

`optimize_layout` mirrors a testdata directory into a cache with row
groups sized for the session's parallelism.  It is a pure re-layout —
pyarrow table in, pyarrow table out, zero value transformation; schema
and row contents are byte-identical — and it is CACHED keyed on the
source file's (mtime, size), so the driver regenerating testdata
invalidates the mirror automatically.  bench.py runs it untimed in
warmup and reports it in the output JSON; correctness paths always read
the raw driver parquet.
"""

from __future__ import annotations

import json
import os
import shutil

# cache inside the repo (gitignored) — the sandbox contract reserves
# paths outside it; override with CREEK_LAYOUT_CACHE
_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
DEFAULT_CACHE_ROOT = os.environ.get(
    "CREEK_LAYOUT_CACHE", os.path.join(_REPO_ROOT, ".layout_cache")
)

TABLES_DEFAULT = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# below this BYTE size a second row group would not pay for its footer.
# The floor is byte-based, not row-based (round 12): an 8192-row floor
# pinned the small-row wide tables (embeddings: 2000 rows × 64 doubles,
# documents: 5000 text rows) to ONE row group, so every scan — and all
# the per-row compute stacked on it (PQ encode, text shingling, media
# synth) — ran on a single core regardless of session parallelism.
MIN_GROUP_BYTES = 32 * 1024
# tables smaller than the openCost floor are written one-file-per-group
MULTIFILE_BELOW = 4 * 1024 * 1024
# Round 13: the round-12 form fanned EVERY sub-4MB table into up to 32
# files, and the driver's own local[32] bench showed the blanket fan-out
# anti-scales: 9 headline rows regressed 1.4–4.7× (25.2 s @32 cores vs
# 13.6 s @8 on the same tree — concurrent tiny-task waves turned excess
# cores into scheduler/GC overhead), while the SAME pipelines at 8-way
# concurrency ran at-or-better than their round-11 times.  So the
# multifile cut now applies ONLY to the table whose scans feed heavy
# per-row compute (embeddings → the BigDecimal PQ-encode folds), capped
# at the 8-way concurrency the driver's own c8 run proved out; every
# other small table goes back to one file = one split (their per-row
# work is hash/compare — µs-cheap — so extra scan tasks are pure
# overhead at any core count).  Media-decode parallelism does not need
# the layout at all: queries._fan_out repartitions the id column before
# the decode stages (round-12 wave 8).
MULTIFILE_TABLES = ("embeddings",)
MULTIFILE_CAP = 8
_LAYOUT_VERSION = 5  # bump to invalidate mirrors cut with the old rule


def optimize_layout(
    sf_dir: str,
    *,
    cache_root: str = DEFAULT_CACHE_ROOT,
    tables=TABLES_DEFAULT,
    target_groups: int = 32,
) -> str:
    """Mirror ``sf_dir`` into a multi-row-group layout; returns the mirror
    directory (or ``sf_dir`` unchanged if pyarrow is unavailable)."""
    try:
        import pyarrow.parquet as pq
    except Exception:
        return sf_dir

    mirror = os.path.join(
        cache_root, os.path.basename(os.path.normpath(sf_dir))
    )
    os.makedirs(mirror, exist_ok=True)
    for t in tables:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        st = os.stat(src)
        key = {"mtime_ns": st.st_mtime_ns, "size": st.st_size,
               "target_groups": target_groups, "v": _LAYOUT_VERSION}
        dst = os.path.join(mirror, f"{t}.parquet")
        marker = dst + ".src.json"
        try:
            with open(marker) as f:
                if json.load(f) == key and os.path.exists(dst):
                    continue  # cache hit
        except (OSError, ValueError):
            pass
        tbl = pq.read_table(src)
        n_groups = max(1, min(target_groups, tbl.nbytes // MIN_GROUP_BYTES))
        rows_per_group = max(1, -(-tbl.num_rows // n_groups))
        n_files = min(n_groups, MULTIFILE_CAP)
        if (
            t in MULTIFILE_TABLES
            and n_files > 1
            and st.st_size < MULTIFILE_BELOW
        ):
            # A table whose WHOLE on-disk size sits under the 4 MB
            # openCost floor is invisible to Spark's split planning —
            # one partition no matter how many row groups it carries —
            # and the per-row compute stacked on THIS table's scans
            # (the decimal PQ-encode folds) is the heaviest in the
            # engine.  One FILE per slice makes Spark's default packing
            # give each file its own partition, without touching the
            # split sizing that governs real-sized scans (lowering
            # openCostInBytes globally was measured to hurt the
            # explode-amplified lineitem shapes — see session.py).
            # Capped at MULTIFILE_CAP files: the driver's local[32] c8
            # run showed these decimal pipelines run FASTER at 8-way
            # concurrency than at 17–32-way in one JVM (GC pressure).
            rows_per_file = max(1, -(-tbl.num_rows // n_files))
            tmpd = dst + ".tmpdir"
            shutil.rmtree(tmpd, ignore_errors=True)
            os.makedirs(tmpd)
            for i in range(n_files):
                sl = tbl.slice(i * rows_per_file, rows_per_file)
                if sl.num_rows == 0:
                    break
                pq.write_table(
                    sl,
                    os.path.join(tmpd, f"part-{i:05d}.parquet"),
                    row_group_size=rows_per_file,
                )
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            elif os.path.exists(dst):
                os.remove(dst)
            os.replace(tmpd, dst)
        else:
            tmp = dst + ".tmp"
            pq.write_table(tbl, tmp, row_group_size=rows_per_group)
            if os.path.isdir(dst):
                shutil.rmtree(dst)  # stale multi-file mirror from a prior cut
            os.replace(tmp, dst)
        with open(marker, "w") as f:
            json.dump(key, f)
    return mirror
