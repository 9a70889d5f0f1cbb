"""Postgres LSN handling.

The reference orders and resumes streams by the pg `XXX/XXX` hex LSN,
parsed as (upper<<32)|lower (client.go:786-800).  We keep the string form in
the envelope (`source.lsn`) and derive a monotonically comparable LongType
`lsn_num` for ordering/windowing — per-key ordering then survives any degree
of parallelism (SURVEY.md §4 constraint #1).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lsn_num(col: Column | str) -> Column:
    """`XXX/XXX` hex LSN → comparable bigint: (upper<<32) | lower.

    Parity: parseLSN, client.go:786-800."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, "/")
    # F.get tolerates malformed input (no '/', null) → null, not an error
    valid = F.size(parts) == 2
    upper = F.conv(F.get(parts, 0), 16, 10).cast("long")
    lower = F.conv(F.get(parts, 1), 16, 10).cast("long")
    return F.when(valid, F.shiftleft(upper, 32) + lower).alias("lsn_num")


def lsn_str(col: Column | str) -> Column:
    """Inverse of lsn_num: bigint → canonical `XXX/XXX` upper-hex form."""
    c = F.col(col) if isinstance(col, str) else col
    # cast to long first: a 32-bit input would wrap the shift amount
    # (shiftrightunsigned(int, 32) is a no-op — shift is taken mod 32)
    c = c.cast("long")
    upper = F.upper(F.hex(F.shiftrightunsigned(c, 32)))
    lower = F.upper(F.hex(c.bitwiseAND(F.lit(0xFFFFFFFF))))
    return F.concat_ws("/", upper, lower)
