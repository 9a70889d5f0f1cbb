"""Schema registry: fingerprint → schema, persisted + LRU-cached.

Parity: the reference persists `_creek.avro_schemas(fingerprint PK, schema,
source, at)` (internal/dao/init.go:77-84; internal/dao/schemas.go:84-91) and
both sides keep a 256-entry LRU of parsed schemas (client.go:76,
internal/dao/schemas.go:16).  Here the store is a JSON-lines directory
(cheap, append-only, parquet-convertible) and the cache an OrderedDict LRU.
On a cluster the loaded registry dict is broadcast to executors.

Filesystem note: like streaming/tables.py's control files (and unlike
the data-plane sinks, which route state through creek_spark.fsio),
this store is deliberately driver-local POSIX — it appends one JSONL
line per new schema, and append is the operation object stores don't
offer.  It stands in for the reference's `_creek.avro_schemas` Postgres
table; a production deployment points this class at a shared/NFS path
or swaps in its durable registry service, both behind the same API.
"""

from __future__ import annotations

import datetime
import json
import os
from collections import OrderedDict

from pyspark.sql import types as T

from creek_spark.types.fingerprint import fingerprint_schema

LRU_SIZE = 256  # parity: client.go:76 / internal/dao/schemas.go:16


class SchemaRegistry:
    def __init__(self, store_dir: str | None = None):
        self.store_dir = store_dir
        self._lru: OrderedDict[str, T.StructType] = OrderedDict()
        # (fingerprint, source) pairs already persisted.  The reference
        # never hits this ambiguity — its Avro record name embeds the
        # table name so two tables cannot share a fingerprint — but our
        # fingerprint hashes the StructType only, so identical row shapes
        # from different sources must still each get a store row (else
        # last_for_source misses the second table).
        self._persisted: set[tuple[str, str]] = set()
        if store_dir:
            os.makedirs(store_dir, exist_ok=True)
            if os.path.exists(self._store_path()):
                with open(self._store_path()) as f:
                    for line in f:
                        rec = json.loads(line)
                        self._persisted.add((rec["fingerprint"], rec["source"]))

    def _store_path(self) -> str:
        return os.path.join(self.store_dir, "schemas.jsonl")

    def put(self, schema: T.StructType, source: str = "") -> str:
        """Persist a schema; returns its fingerprint.  Analog of
        PersistSchemaFromRelation (internal/dao/schemas.go:42-113)."""
        fp = fingerprint_schema(schema)
        if fp in self._lru and (
            not self.store_dir or (fp, source) in self._persisted
        ):
            return fp
        self._cache(fp, schema)
        if self.store_dir and (fp, source) not in self._persisted:
            self._persisted.add((fp, source))
            rec = {
                "fingerprint": fp,
                "schema": schema.json(),
                "source": source,
                "created_at": datetime.datetime.now(
                    datetime.timezone.utc
                ).isoformat(),
            }
            with open(self._store_path(), "a") as f:
                f.write(json.dumps(rec) + "\n")
        return fp

    def get(self, fingerprint: str) -> T.StructType | None:
        """fingerprint → schema, LRU first then store — the schema
        request-reply analog (internal/mq/schemas.go:50-71,
        client.go:745-782)."""
        if fingerprint in self._lru:
            self._lru.move_to_end(fingerprint)
            return self._lru[fingerprint]
        if self.store_dir and os.path.exists(self._store_path()):
            with open(self._store_path()) as f:
                for line in f:
                    rec = json.loads(line)
                    if rec["fingerprint"] == fingerprint:
                        schema = T.StructType.fromJson(json.loads(rec["schema"]))
                        self._cache(fingerprint, schema)
                        return schema
        return None

    def last_for_source(self, source: str) -> tuple[str, T.StructType] | None:
        """Latest schema for a table — GetLastSchema (client.go:192-219)."""
        if not (self.store_dir and os.path.exists(self._store_path())):
            return None
        best = None
        with open(self._store_path()) as f:
            for line in f:
                rec = json.loads(line)
                if rec["source"] == source:
                    best = rec
        if best is None:
            return None
        return best["fingerprint"], T.StructType.fromJson(
            json.loads(best["schema"])
        )

    def _cache(self, fp: str, schema: T.StructType) -> None:
        self._lru[fp] = schema
        self._lru.move_to_end(fp)
        while len(self._lru) > LRU_SIZE:
            self._lru.popitem(last=False)
