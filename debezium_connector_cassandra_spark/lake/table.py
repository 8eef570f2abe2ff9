"""Mini copy-on-write lakehouse table format (the Iceberg stand-in).

No Iceberg/Delta jars ship in this environment, so the engine carries its own
minimal ACID table layer with the four properties the CDC pipeline needs:

1. **Atomic commits / snapshot isolation** — every commit writes an immutable
   manifest ``_manifests/v{N}.json`` listing the exact data files of every
   bucket, then atomically swings the ``_current`` pointer via
   ``os.replace`` (POSIX-atomic). Readers resolve the pointer once and see a
   consistent snapshot; a crash mid-commit leaves the old version intact.
2. **Bucketed layout + pruned copy-on-write** — rows are hash-bucketed on the
   partition key (``bucket = pmod(xxhash64(conv_id), n_buckets)``, a pure
   function, never stored). A MERGE that touches a subset of conv_ids
   rewrites only those buckets; untouched buckets are carried forward by
   reference in the new manifest. At 100 TB / thousands of buckets this is
   what keeps per-batch write amplification proportional to the touched key
   range, not the table size.
3. **Schema evolution** — ``add_column`` commits a manifest with the widened
   schema; old data files simply lack the column and the Parquet reader
   fills NULLs (read-schema projection), mirroring Iceberg's add-column and
   the reference's SchemaHolder update flow
   (Cassandra4SchemaChangeListener.java:114-260).
4. **Time travel** — any retained manifest version is readable
   (``read(version=...)``), which the resume/idempotence tests use.

Single-writer per table, like the reference's file-locked offset writer
(FileOffsetWriter.java:191-206); multi-writer coordination would sit above
this layer (a real catalog) and is out of scope.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

BUCKET_COL = "_bucket"
# bucket id for small driver-side appends that skip hash-bucketing; pruned
# reads always include it (bounded in size by compaction)
UNBUCKETED = -1

_PA_TYPES = {
    T.StringType(): pa.string(),
    T.LongType(): pa.int64(),
    T.IntegerType(): pa.int32(),
    T.BooleanType(): pa.bool_(),
    T.DoubleType(): pa.float64(),
    T.TimestampType(): pa.timestamp("us"),
}


def _pa_schema(schema: T.StructType) -> pa.Schema:
    return pa.schema([(f.name, _PA_TYPES[f.dataType]) for f in schema.fields])


def bucket_expr(key_col: str, n_buckets: int) -> F.Column:
    """Pure bucket function — recomputable anywhere, never persisted."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


class LakeTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- paths -------------------------------------------------------------
    @property
    def _manifest_dir(self) -> str:
        return os.path.join(self.path, "_manifests")

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_current")

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._manifest_dir, f"v{version}.json")

    # -- lifecycle ---------------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        key_col: str = "conv_id",
        n_buckets: int = 16,
    ) -> "LakeTable":
        t = cls(spark, path)
        os.makedirs(t._manifest_dir, exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        manifest = {
            "version": 0,
            "parent": None,
            "created_ms": int(time.time() * 1000),
            "schema": json.loads(schema.json()),
            "key_col": key_col,
            "n_buckets": n_buckets,
            "buckets": {},
            "props": {},
        }
        t._write_manifest(manifest)
        return t

    @classmethod
    def exists(cls, path: str) -> bool:
        return os.path.exists(os.path.join(path, "_current"))

    # -- manifest plumbing -------------------------------------------------
    def _write_manifest(self, manifest: dict) -> None:
        v = manifest["version"]
        mp = self._manifest_path(v)
        with open(mp + ".tmp", "w") as f:
            json.dump(manifest, f)
        os.replace(mp + ".tmp", mp)
        with open(self._pointer + ".tmp", "w") as f:
            f.write(str(v))
        os.replace(self._pointer + ".tmp", self._pointer)  # the atomic commit

    def current_version(self) -> int:
        with open(self._pointer) as f:
            return int(f.read().strip())

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        with open(self._manifest_path(v)) as f:
            return json.load(f)

    def schema(self, version: int | None = None) -> T.StructType:
        return T.StructType.fromJson(self.manifest(version)["schema"])

    def is_empty(self, version: int | None = None) -> bool:
        """Metadata-only emptiness check (no Spark job)."""
        return not any(self.manifest(version)["buckets"].values())

    # -- read --------------------------------------------------------------
    def read(self, buckets: list[int] | None = None, version: int | None = None) -> DataFrame:
        """Snapshot read; ``buckets`` prunes to the given bucket ids."""
        m = self.manifest(version)
        schema = T.StructType.fromJson(m["schema"])
        files: list[str] = []
        for b, fs in m["buckets"].items():
            if buckets is not None and int(b) not in buckets and int(b) != UNBUCKETED:
                continue
            files.extend(os.path.join(self.path, f) for f in fs)
        if not files:
            return self.spark.createDataFrame([], schema)
        # explicit read schema => old files missing newly-added columns
        # project as NULL (schema evolution)
        return self.spark.read.schema(schema).parquet(*files)

    # -- write -------------------------------------------------------------
    def _write_files(self, df: DataFrame, key_col: str, n_buckets: int) -> dict[int, list[str]]:
        """Write df into per-bucket Parquet files under a fresh commit dir;
        returns bucket -> relative file paths."""
        commit_id = uuid.uuid4().hex[:12]
        rel_dir = os.path.join("data", f"commit-{commit_id}")
        out_dir = os.path.join(self.path, rel_dir)
        (
            df.withColumn(BUCKET_COL, bucket_expr(key_col, n_buckets))
            .repartition(F.col(BUCKET_COL))
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(out_dir)
        )
        added: dict[int, list[str]] = {}
        for entry in sorted(os.listdir(out_dir)):
            if not entry.startswith(f"{BUCKET_COL}="):
                continue
            b = int(entry.split("=", 1)[1])
            bdir = os.path.join(out_dir, entry)
            rel_files = [
                os.path.join(rel_dir, entry, f)
                for f in sorted(os.listdir(bdir))
                if f.endswith(".parquet")
            ]
            added[b] = rel_files
        return added

    def overwrite_buckets(self, df: DataFrame, bucket_ids: list[int]) -> int:
        """COW commit: replace the named buckets with df's rows (df must only
        contain rows hashing into ``bucket_ids``); all other buckets carry
        forward untouched. Returns the new version."""
        m = self.manifest()
        added = self._write_files(df, m["key_col"], m["n_buckets"])
        new_buckets = {b: fs for b, fs in m["buckets"].items() if int(b) not in set(bucket_ids)}
        for b, fs in added.items():
            new_buckets[str(b)] = fs
        return self._commit(m, new_buckets)

    def overwrite_all(self, df: DataFrame) -> int:
        m = self.manifest()
        added = self._write_files(df, m["key_col"], m["n_buckets"])
        return self._commit(m, {str(b): fs for b, fs in added.items()})

    def append(self, df: DataFrame) -> int:
        """Append-only commit (used by the offsets/lineage/metrics/tombstone
        bookkeeping tables — the analog of the reference's properties-file
        offset flush, FileOffsetWriter.java:96-119, made atomic)."""
        m = self.manifest()
        added = self._write_files(df, m["key_col"], m["n_buckets"])
        new_buckets = {b: list(fs) for b, fs in m["buckets"].items()}
        for b, fs in added.items():
            new_buckets.setdefault(str(b), []).extend(fs)
        return self._commit(m, new_buckets)

    # one-small-file-per-batch appends compact when the UNBUCKETED slot
    # exceeds this many files (bounds manifest size AND recovery-read fan-in
    # over unbounded batch counts)
    COMPACT_THRESHOLD = 64

    # optional pandas-level rewrite applied during compaction (e.g. the
    # offsets table keeps only per-partition watermarks — superseded rows
    # are dead weight, exactly like the reference's offset file which holds
    # only CURRENT values, FileOffsetWriter.java:96-119)
    compaction_transform = None

    def append_small(self, rows: list[dict]) -> int:
        """Driver-side append of a handful of rows, no Spark job: one Parquet
        file written with pyarrow into the UNBUCKETED slot. This is the
        direct analog of the reference's offset flush — a tiny synchronous
        write on the driver (FileOffsetWriter.flush), made atomic by the
        manifest pointer swap. Used by the offsets/lineage/metrics tables
        and small tombstone batches; bucket-pruned reads always include the
        unbucketed slot. Auto-compacts past COMPACT_THRESHOLD files."""
        if not rows:
            return self.current_version()
        m = self.manifest()
        schema = T.StructType.fromJson(m["schema"])
        commit_id = uuid.uuid4().hex[:12]
        rel_dir = os.path.join("data", f"commit-{commit_id}")
        os.makedirs(os.path.join(self.path, rel_dir), exist_ok=True)
        rel_file = os.path.join(rel_dir, "unbucketed.parquet")
        names = [f.name for f in schema.fields]
        table = pa.table(
            {n: [r.get(n) for r in rows] for n in names}, schema=_pa_schema(schema)
        )
        pq.write_table(table, os.path.join(self.path, rel_file))
        new_buckets = {b: list(fs) for b, fs in m["buckets"].items()}
        new_buckets.setdefault(str(UNBUCKETED), []).append(rel_file)
        v = self._commit(m, new_buckets)
        if len(new_buckets[str(UNBUCKETED)]) > self.COMPACT_THRESHOLD:
            v = self.compact_unbucketed()
        return v

    def compact_unbucketed(self) -> int:
        """Merge every UNBUCKETED small file into ONE parquet file (driver-
        side pyarrow — the files are offset-flush grain, no Spark job),
        applying ``compaction_transform`` (pandas -> pandas) when set. Keeps
        bookkeeping reads O(1) files regardless of batch count."""
        m = self.manifest()
        files = m["buckets"].get(str(UNBUCKETED), [])
        if len(files) <= 1:
            return m["version"]
        schema = T.StructType.fromJson(m["schema"])
        tables = [pq.read_table(os.path.join(self.path, f)) for f in files]
        merged = pa.concat_tables(tables)
        if self.compaction_transform is not None:
            import pandas as pd  # noqa: F401

            df = self.compaction_transform(merged.to_pandas())
            merged = pa.Table.from_pandas(df, schema=_pa_schema(schema), preserve_index=False)
        commit_id = uuid.uuid4().hex[:12]
        rel_dir = os.path.join("data", f"commit-{commit_id}")
        os.makedirs(os.path.join(self.path, rel_dir), exist_ok=True)
        rel_file = os.path.join(rel_dir, "compacted.parquet")
        pq.write_table(merged, os.path.join(self.path, rel_file))
        new_buckets = {b: list(fs) for b, fs in m["buckets"].items()}
        new_buckets[str(UNBUCKETED)] = [rel_file]
        return self._commit(m, new_buckets)

    def _commit(self, base_manifest: dict, new_buckets: dict, schema: T.StructType | None = None) -> int:
        new_m = dict(base_manifest)
        new_m["version"] = base_manifest["version"] + 1
        new_m["parent"] = base_manifest["version"]
        new_m["created_ms"] = int(time.time() * 1000)
        new_m["buckets"] = new_buckets
        if schema is not None:
            new_m["schema"] = json.loads(schema.json())
        self._write_manifest(new_m)
        return new_m["version"]

    # -- schema evolution --------------------------------------------------
    def add_column(self, name: str, dtype: T.DataType) -> int:
        """Iceberg-style ADD COLUMN: metadata-only commit; existing files are
        untouched and read back NULL for the new column."""
        m = self.manifest()
        schema = T.StructType.fromJson(m["schema"])
        if name in schema.fieldNames():
            return m["version"]
        schema = T.StructType(schema.fields + [T.StructField(name, dtype, True)])
        return self._commit(m, m["buckets"], schema=schema)

    # safe metadata-only type widenings (verified against this Spark
    # version's parquet reader: old int32/float files read back under the
    # widened schema without rewrite — Iceberg's type-promotion rules)
    _WIDENINGS = {  # keys/values are DataType.simpleString() names
        "tinyint": {"smallint", "int", "bigint", "double"},
        "smallint": {"int", "bigint", "double"},
        "int": {"bigint", "double"},
        "float": {"double"},
    }

    def alter_column_type(self, name: str, dtype: T.DataType) -> int:
        """Iceberg-style ALTER COLUMN TYPE: metadata-only commit for safe
        widenings (int->long, int->double, float->double, ...); existing
        files are read under the widened schema by parquet type promotion.
        Raises for narrowing / unsupported pairs."""
        m = self.manifest()
        schema = T.StructType.fromJson(m["schema"])
        if name not in schema.fieldNames():
            raise ValueError(f"no such column: {name!r}")
        old = schema[name].dataType
        if old == dtype:
            return m["version"]
        if dtype.simpleString() not in self._WIDENINGS.get(old.simpleString(), set()):
            raise ValueError(
                f"unsupported type change {old.simpleString()} -> "
                f"{dtype.simpleString()} for column {name!r} (only safe "
                "widenings are metadata-only; others would need a rewrite)"
            )
        new_schema = T.StructType(
            [
                T.StructField(name, dtype, f.nullable) if f.name == name else f
                for f in schema.fields
            ]
        )
        return self._commit(m, m["buckets"], schema=new_schema)

    # -- maintenance -------------------------------------------------------
    def buckets_for_keys(self, keys_df: DataFrame, key_col: str | None = None) -> list[int]:
        """Distinct bucket ids a key relation touches (drives COW pruning).
        The result is at most n_buckets integers — safe to collect."""
        m = self.manifest()
        kc = key_col or m["key_col"]
        rows = (
            keys_df.select(bucket_expr(kc, m["n_buckets"]).alias("b"))
            .distinct()
            .collect()
        )
        return sorted(r["b"] for r in rows)
