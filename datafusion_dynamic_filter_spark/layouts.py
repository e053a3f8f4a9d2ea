"""Point-lookup table layouts: the standing partition-keyed copy that lets
prepared statements prune their scan.

The reference's headline mechanism pushes the current parameter into the
scan of ONE reusable physical plan (src/physical.rs:247-255), so repeated
lookups never re-read data the filter excludes.  Spark's twin needs the
exclusion to be expressible to the SCAN, which on parquet means a partition
key: ``ensure_point_layout`` maintains a copy of the table hash-partitioned
on ``pmod(key, buckets)``.  Prepared point lookups over the layout then
prune statically (literal bind: the bucket predicate is augmented in and
Catalyst prunes at planning time) or dynamically (params-as-data bind:
Dynamic Partition Pruning inserts the runtime partition filter while the
plan stays byte-identical across parameter batches).

At 100 TB this copy is not a cache but the table's standing layout —
write-once, fingerprint-invalidated here only because the test corpus is
regenerated in place between rounds.
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

_ROOT = os.path.join(tempfile.gettempdir(), "ddf_spark_layouts")

_INTEGRAL = (ByteType, ShortType, IntegerType, LongType)


@dataclass(frozen=True)
class PointLayout:
    """A bucket-partitioned copy of a table, keyed for point lookups."""

    table: str
    key: str  # the lookup column the layout is bucketed on
    bucket_col: str  # partition column name in the copy
    buckets: int
    path: str  # parquet root of the partitioned copy

    def bucket_of(self, value) -> int | None:
        """Partition a key value lands in (None for non-integral values —
        callers fall back to an unaugmented filter, which stays correct)."""
        if isinstance(value, bool) or not isinstance(value, int):
            return None
        return value % self.buckets


def parquet_row_count(path: str) -> int:
    """Exact row count of a parquet file-or-directory from FOOTER metadata
    only — O(#files) driver-side reads, no Spark job (the layout dirs are
    ``buckets`` small files).  Feeds plan-build-time policy decisions
    (e.g. the prepared-template expression-codegen gate), mirroring the
    operators' ``_documents_row_count`` pattern."""
    import glob

    import pyarrow.parquet as pq

    files = (
        sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        if os.path.isdir(path)
        else [path]
    )
    return sum(pq.read_metadata(f).num_rows for f in files)


def source_fingerprint(path: str) -> str:
    """size+mtime fingerprint of a parquet file-or-directory, for
    invalidating derived layouts when the base data is regenerated in
    place."""
    entries = []
    if os.path.isdir(path):
        for root, _, files in os.walk(path):
            for f in sorted(files):
                st = os.stat(os.path.join(root, f))
                entries.append(f"{f}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.exists(path):
        st = os.stat(path)
        entries.append(f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}")
    return ";".join(entries)


def layout_stale(sink_path: str, source_path: str) -> bool:
    if not os.path.exists(os.path.join(sink_path, "_SUCCESS")):
        return True
    marker = os.path.join(sink_path, "_SOURCE_FINGERPRINT")
    if not os.path.exists(marker):
        return True
    with open(marker) as fh:
        return fh.read() != source_fingerprint(source_path)


def write_layout_marker(sink_path: str, source_path: str) -> None:
    with open(os.path.join(sink_path, "_SOURCE_FINGERPRINT"), "w") as fh:
        fh.write(source_fingerprint(source_path))


def ensure_point_layout(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    source_path: str,
    key: str,
    *,
    buckets: int = 64,
    bucket_col: str = "pk_bucket",
    dest_path: str | None = None,
) -> PointLayout:
    """Create (or adopt, if fresh) the bucket-partitioned copy of ``df``.

    The key column must be integral — the bucket is ``pmod(key, buckets)``
    and the literal-bind path recomputes it driver-side per parameter, so
    both sides must agree on the arithmetic exactly."""
    dtype = df.schema[key].dataType
    if not isinstance(dtype, _INTEGRAL):
        raise ValueError(
            f"point layout requires an integral key column; {table}.{key} "
            f"is {dtype.simpleString()}"
        )
    if bucket_col in df.columns:
        raise ValueError(f"{table} already has a column named {bucket_col!r}")
    if dest_path is None:
        dest_path = os.path.join(
            _ROOT, os.path.basename(os.path.normpath(os.path.dirname(source_path))),
            f"{table}_by_{bucket_col}",
        )
    if layout_stale(dest_path, source_path):
        (
            df.withColumn(bucket_col, F.pmod(F.col(key), F.lit(buckets)).cast("int"))
            .write.mode("overwrite")
            .partitionBy(bucket_col)
            .parquet(dest_path)
        )
        write_layout_marker(dest_path, source_path)
    return PointLayout(
        table=table, key=key, bucket_col=bucket_col, buckets=buckets, path=dest_path
    )
