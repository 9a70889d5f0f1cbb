from creek_spark.operators.asof import asof_join
from creek_spark.operators.cdc import latest_state, wal_from

__all__ = ["asof_join", "latest_state", "wal_from"]
