"""Partitioned Parquet I/O + keyed upsert writer.

Replaces the reference's manual path math + read-merge-dedup-rewrite cycle
(src/s3_io/s3_client.py:102-145, src/data_collectors/*_collector.py:28-51)
with Spark-native equivalents:

- reads: ``spark.read.parquet`` — Catalyst does the partition pruning /
  column pruning / predicate pushdown the reference's README teaches users
  to do by hand (README.md:121-167).
- writes: ``partitionBy("year","month")`` Hive layout, identical on-disk
  shape to the reference (README.md:43-60).
- upsert: dynamic-partition-overwrite of only the partitions present in the
  incoming batch, after union + keyed window dedup. At 100 TB this touches
  O(changed partitions), not O(table).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators.dedup import dedup_keep_latest

PARTITION_COLS = ("year", "month")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in names}


def with_partition_cols(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """Derive Hive partition columns from the event-time column.

    Reference: manual f-string path construction
    (odds_data_collector.py:28, team_rankings_data_collector.py:32).
    """
    return (df
            .withColumn("year", F.year(ts_col))
            .withColumn("month", F.month(ts_col)))


def write_partitioned(df: DataFrame, path: str, ts_col: str = "timestamp",
                      mode: str = "overwrite") -> None:
    """Snappy Parquet, Hive year/month layout (s3_client.py:116-121 analog).

    One output file per partition matches the reference's small-file policy;
    at scale drop the coalesce and let a compaction job handle file counts.
    """
    (with_partition_cols(df, ts_col)
     .repartition(*[F.col(c) for c in PARTITION_COLS])
     .write.mode(mode)
     .partitionBy(*PARTITION_COLS)
     .parquet(path, compression="snappy"))


def upsert_partitioned(spark: SparkSession, new_df: DataFrame, path: str,
                       key_cols: list[str] | None, ts_col: str = "timestamp",
                       tiebreak_cols: list[str] | None = None) -> None:
    """Keyed upsert into a year/month-partitioned Parquet table.

    Semantics of the reference's read-concat-dedup-rewrite
    (team_rankings_data_collector.py:34-50):
      * ``key_cols=None``  -> full-row dedup (odds idempotency guard,
        odds_data_collector.py:40-44)
      * ``key_cols=[...]`` -> keep the newest ``ts_col`` per key (rankings
        upsert, team_rankings_data_collector.py:41-45)

    Implementation is Spark-native: read ONLY the partitions the new batch
    touches (partition-pruned by the year/month IN-list predicate), union,
    window-dedup, and dynamic-partition-overwrite exactly those partitions.
    Idempotent: running the same batch twice is a fixed point.
    """
    new_part = with_partition_cols(new_df, ts_col)
    touched = [tuple(r) for r in
               new_part.select(*PARTITION_COLS).distinct().collect()]
    merged = new_part
    if _table_exists(path):
        existing = spark.read.parquet(path)
        pred = F.lit(False)
        for (y, m) in touched:
            pred = pred | ((F.col("year") == y) & (F.col("month") == m))
        existing = existing.filter(pred).select(*new_part.columns)
        merged = existing.unionByName(new_part)
    if key_cols is None:
        merged = merged.dropDuplicates()
    else:
        # tiebreak_cols pin the winner at equal ts (see dedup_keep_latest);
        # pass them whenever the key's max-ts uniqueness isn't guaranteed
        merged = dedup_keep_latest(merged, key_cols, ts_col, tiebreak_cols)
    # partitionOverwriteMode=dynamic (session.py) -> only touched partitions
    # are replaced; untouched history is never read or written.
    (merged
     .repartition(*[F.col(c) for c in PARTITION_COLS])
     .write.mode("overwrite")
     .partitionBy(*PARTITION_COLS)
     .parquet(path, compression="snappy"))


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int = 32, sort_cols: list[str] | None = None,
                   mode: str = "overwrite", path: str | None = None) -> None:
    """Bucketed parquet table: pre-shuffle the data ONCE at write time so
    every later join/aggregation on ``bucket_cols`` is exchange-free.

    The 100 TB pattern for hot join keys (e.g. facts repeatedly joined on
    the same key): both sides bucketed with the same count join with zero
    runtime shuffle — the one-time write shuffle is amortized over every
    subsequent query. ``sort_cols`` additionally pre-sorts within buckets,
    removing the sort from sort-merge joins. Requires the session catalog
    (saveAsTable); warehouse location is configured in session.py.
    ``path`` makes the table external at that location — use it when the
    session may run with a default (cwd-relative) warehouse dir.
    """
    w = (df.write.mode(mode).format("parquet")
         .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def morton_key(a, b, bits: int = 16):
    """Z-order (Morton) key: interleave the low ``bits`` bits of two
    non-negative integer columns into one clustering key. Pure builtin
    bit ops (shiftleft/or) — codegen-friendly, no UDF. Columns are first
    clamped into [0, 2^bits) by masking; callers with arbitrary ranges
    should rank/quantize first (see write_zordered)."""
    mask = (1 << bits) - 1
    a = (F.col(a) if isinstance(a, str) else a).cast("long").bitwiseAND(mask)
    b = (F.col(b) if isinstance(b, str) else b).cast("long").bitwiseAND(mask)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (z
             .bitwiseOR(F.shiftleft(F.shiftright(a, i).bitwiseAND(1), 2 * i))
             .bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(1),
                                    2 * i + 1)))
    return z


def quantile_cells(col: str, cuts: list[float], bits: int = 8):
    """Map a numeric column to an equal-population cell in [0, 2^bits)
    given quantile cut points: raw cell = #cuts <= value, via a builtin
    higher-order filter over the (small, broadcast-as-literal) cut array.
    Pure JVM expression — O(|cuts|) comparisons per row inside codegen, no
    UDF, no window, no extra shuffle. NULLs land in cell 0 (the comparison
    is null -> filtered out), deterministically.

    Low-cardinality columns yield few DISTINCT cuts; the raw cell index is
    stretched to the full [0, 2^bits) range so the column still occupies
    the HIGH interleave bits of the Morton key — otherwise a 10-distinct-
    value column would vary only in the low z bits and every z-range file
    would span its whole domain (no pruning on that column)."""
    uniq = sorted(set(cuts))
    arr = F.array(*[F.lit(float(c)) for c in uniq])
    v = F.col(col).cast("double")
    cell = F.size(F.filter(arr, lambda c: c <= v))
    n_cells = 1 << bits
    return (cell * (n_cells - 1) / max(len(uniq), 1)).cast("int")


def write_zordered(df: DataFrame, path: str, col_a: str, col_b: str,
                   num_files: int = 32, bits: int = 8,
                   rel_err: float | None = None) -> None:
    """Z-order-clustered parquet: co-locate rows that are close in BOTH
    ``col_a`` and ``col_b`` so parquet row-group min/max stats prune scans
    filtered on EITHER column (or both) — the multi-dimensional layout
    single-column sorting can't give (sorting by a prunes a, scatters b).

    Each column is quantized to an equal-population cell in [0, 2^bits)
    using ``approxQuantile`` cut points — a distributed Greenwald-Khanna
    sketch pass, NO global sort/window anywhere in the job (an ntile rank
    would funnel the whole table through one task — a non-starter for a
    function whose purpose is laying out 100 TB fact tables). The cell
    ranks are Morton-interleaved and the frame is range-partitioned +
    sorted by the z-key before writing. 2^bits cells per dimension only
    needs to comfortably exceed the file count for file-level pruning, so
    the default 256 cells (65k z-cells) resolves layouts up to thousands
    of files; the per-row cell mapping is an O(2^bits) codegen'd filter
    over the literal cut array, so keep bits <= ~10. The Delta/Iceberg
    OPTIMIZE ZORDER equivalent expressed with stock Spark.
    """
    keyed = zorder_keyed(df, col_a, col_b, bits, rel_err)
    (keyed.repartitionByRange(num_files, F.col("__z"))
     .sortWithinPartitions("__z")
     .drop("__z")
     .write.mode("overwrite").parquet(path, compression="snappy"))


def zorder_keyed(df: DataFrame, col_a: str, col_b: str, bits: int = 8,
                 rel_err: float | None = None) -> DataFrame:
    """The z-key derivation of write_zordered, exposed so tests can assert
    its plan shape (no Window, no single-partition exchange)."""
    n_cells = 1 << bits
    if rel_err is None:
        # half-a-cell rank error: cell boundaries may shift by ~0.5 cells
        # of population, which only blurs file edges, never correctness
        rel_err = 0.5 / n_cells
    probs = [i / n_cells for i in range(1, n_cells)]
    cuts_a, cuts_b = df.stat.approxQuantile([col_a, col_b], probs, rel_err)
    return df.withColumn(
        "__z", morton_key(quantile_cells(col_a, cuts_a, bits),
                          quantile_cells(col_b, cuts_b, bits), bits))


def compact_partitions(spark: SparkSession, path: str,
                       target_files_per_partition: int = 1,
                       partitions: list[tuple] | None = None) -> None:
    """Small-file compaction (the §4 'needs our policy' gap).

    Incremental appends (streaming sink, repeated upserts) accumulate files
    per partition; scans then pay per-file open cost. This rewrites each
    partition down to ``target_files_per_partition`` files. ``partitions``
    limits the rewrite to the listed (year, month) tuples — the periodic
    compaction job passes the recently-written ones; None compacts the whole
    table (reference-scale only; at 100 TB always pass the touched set).

    Safe with dynamic partition overwrite: only the partitions present in
    the rewritten frame are replaced, atomically per partition.
    """
    df = spark.read.parquet(path)
    if partitions is not None:
        pred = F.lit(False)
        for (y, m) in partitions:
            pred = pred | ((F.col("year") == y) & (F.col("month") == m))
        df = df.filter(pred)
    part_cols = [F.col(c) for c in PARTITION_COLS]
    if target_files_per_partition <= 1:
        shuffled = df.repartition(*part_cols)
    else:
        # hash-salt within the partition key: k salt values -> k shuffle
        # groups -> k files per table partition
        salt = F.abs(F.hash(*df.columns)) % target_files_per_partition
        shuffled = (df.withColumn("__salt", salt)
                    .repartition(*part_cols, F.col("__salt"))
                    .drop("__salt"))
    (shuffled
     .write.mode("overwrite")
     .partitionBy(*PARTITION_COLS)
     .parquet(path, compression="snappy"))


def _table_exists(path: str) -> bool:
    if not os.path.isdir(path):
        return False
    for root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False
