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
    merged = new_part
    if _table_exists(path):
        # the touched-partition scan of the batch is only needed to build
        # the pruning predicate over EXISTING data — a first write (no
        # table yet) skips the whole batch scan + collect (one fewer job
        # and one fewer pass over the batch; round-13 profile)
        touched = [tuple(r) for r in
                   new_part.select(*PARTITION_COLS).distinct().collect()]
        existing = spark.read.parquet(path)
        pred = F.lit(False)
        for (y, m) in touched:
            pred = pred | ((F.col("year") == y) & (F.col("month") == m))
        existing = existing.filter(pred).select(*new_part.columns)
        merged = existing.unionByName(new_part)
    part_cols = [F.col(c) for c in PARTITION_COLS]
    if key_cols is None:
        # Full-row dedup rides the LAYOUT exchange (guide §2.4 — two
        # operations keyed compatibly share one shuffle): identical rows
        # have identical (year, month), so the layout repartition already
        # co-locates every duplicate group, and because the partition
        # columns are a subset of the dedup key (= all columns) Spark's
        # EnsureRequirements accepts hash(year, month) as satisfying the
        # aggregation's clustered distribution — dropDuplicates after the
        # repartition plans with NO second exchange and preserves the
        # (year, month) partitioning into the write. One full-row shuffle
        # instead of two (measured: the all-columns dedup exchange +
        # layout exchange each moved every byte of the batch). Dedup
        # parallelism = touched-partition count — exactly the bound the
        # one-file-per-partition write policy already imposes.
        merged = merged.repartition(*part_cols).dropDuplicates()
    else:
        # tiebreak_cols pin the winner at equal ts (see dedup_keep_latest);
        # pass them whenever the key's max-ts uniqueness isn't guaranteed.
        # The keyed window must see each key GLOBALLY (a key's rows can
        # span months), so this path keeps its own exchange on key_cols
        # and the layout repartition after it.
        merged = (dedup_keep_latest(merged, key_cols, ts_col, tiebreak_cols)
                  .repartition(*part_cols))
    # partitionOverwriteMode=dynamic (session.py) -> only touched partitions
    # are replaced; untouched history is never read or written.
    (merged
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


def morton_key_multi(cols, bits: int = 8):
    """Z-order (Morton) key over N columns: interleave the low ``bits``
    bits of each non-negative integer column into one clustering key
    (column j contributes bit i at position N*i + j). Pure builtin bit
    ops (shiftleft/or) — codegen-friendly, no UDF. Columns are first
    clamped into [0, 2^bits) by masking; callers with arbitrary ranges
    should rank/quantize first (see write_zordered). N*bits must stay
    under 63 (long key)."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds the long z-key")
    mask = (1 << bits) - 1
    cs = [(F.col(c) if isinstance(c, str) else c).cast("long")
          .bitwiseAND(mask) for c in cols]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(1), n * i + j))
    return z


def morton_key(a, b, bits: int = 16):
    """Two-column Morton key (a in even bit positions, b in odd)."""
    return morton_key_multi([a, b], bits)


def quantile_cells(col: str, cuts: list[float], bits: int = 8):
    """Map a numeric column to an equal-population cell in [0, 2^bits)
    given quantile cut points: raw cell = #cuts <= value, evaluated as a
    BALANCED nested-when binary-search tree over the sorted distinct cut
    points — O(log |cuts|) comparisons per row on the one taken branch,
    whole-stage-codegen'd as nested if/else. (A higher-order
    filter/aggregate over the cut array would be O(|cuts|) AND
    interpreted per element — measured 5x slower than even the old
    global-ntile layout at sf0.1; the same Catalyst-HOF trap SCALE.md
    documents for the SRP sketch.) NULL and NaN land in cell 0 via an
    explicit guard: Arrow's pandas conversion collapses null and NaN
    into one NaN, so cell(NULL) == cell(NaN) is forced — and without
    the guard Spark's NaN-is-greatest SQL ordering would send NaN to
    the TOP cell here while the kernel sent it to 0.

    Low-cardinality columns yield few DISTINCT cuts; the raw cell index is
    stretched to the full [0, 2^bits) range so the column still occupies
    the HIGH interleave bits of the Morton key — otherwise a 10-distinct-
    value column would vary only in the low z bits and every z-range file
    would span its whole domain (no pruning on that column)."""
    uniq = sorted(set(cuts))
    v = F.col(col).cast("double")

    def tree(lo: int, hi: int):
        # invariant: cuts[:lo] are known <= v, cuts[hi:] known > v;
        # returns #cuts <= v as a literal once the range is empty
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return (F.when(F.lit(float(uniq[mid])) <= v, tree(mid + 1, hi))
                .otherwise(tree(lo, mid)))

    cell = F.when(v.isNull() | F.isnan(v), F.lit(0)) \
        .otherwise(tree(0, len(uniq)))
    n_cells = 1 << bits
    return (cell * (n_cells - 1) / max(len(uniq), 1)).cast("int")


def _quantile_cells_arrow(cuts: list[float], bits: int = 8):
    """Arrow kernel twin of quantile_cells: numpy searchsorted over the
    broadcast cut array — vectorized O(log |cuts|) per row, cost CONSTANT
    in |cuts| (measured at sf0.1: 0.55 s for 600k rows at 255 cuts vs
    3.2 s for the codegen when-tree, whose cost grows with tree SIZE).
    Returns identical cells: side='right' == #cuts <= v, NaN/null -> raw
    cell 0, same floor-scaling to [0, 2^bits). The expression form stays
    available for SQL-only/no-Python contexts; the layout job defaults to
    this kernel (same boundary SCALE.md documents for the SRP sketch —
    Catalyst expression trees are the wrong tool for wide per-row
    numerics)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    arr = np.array(sorted({float(c) for c in cuts}), dtype=np.float64)
    m = max(len(arr), 1)
    n_cells = 1 << bits

    def cell(v):
        x = v.to_numpy(dtype=np.float64, na_value=np.nan)
        raw = np.searchsorted(arr, x, side="right")
        raw[np.isnan(x)] = 0
        return pd.Series((raw * (n_cells - 1) // m).astype(np.int32))

    # real (non-string) annotations: this module's `from __future__ import
    # annotations` would otherwise stringify hints and break inference
    cell.__annotations__ = {"v": pd.Series, "return": pd.Series}
    return pandas_udf(cell, "int")


def write_zordered(df: DataFrame, path: str, *cols: str,
                   num_files: int = 32, bits: int = 8,
                   rel_err: float | None = None) -> None:
    """Z-order-clustered parquet: co-locate rows that are close in ALL of
    ``cols`` (two or three hot filter columns) so parquet row-group
    min/max stats prune scans filtered on ANY of them (or several) — the
    multi-dimensional layout single-column sorting can't give (sorting by
    a prunes a, scatters the rest).

    Each column is quantized to an equal-population cell in [0, 2^bits)
    using ``approxQuantile`` cut points — a distributed Greenwald-Khanna
    sketch pass, NO global sort/window anywhere in the job (an ntile rank
    would funnel the whole table through one task — a non-starter for a
    function whose purpose is laying out 100 TB fact tables). The cell
    ranks are Morton-interleaved and the frame is range-partitioned +
    sorted by the z-key before writing. 2^bits cells per dimension only
    needs to comfortably exceed the file count for file-level pruning, so
    the default 256 cells per dimension resolves layouts up to thousands
    of files; the per-row cell mapping is the Arrow searchsorted kernel
    (cost constant in the cut count — see _quantile_cells_arrow), and the
    real bits ceiling is the Morton key's N*bits <= 62 long budget. The
    Delta/Iceberg OPTIMIZE ZORDER equivalent expressed with stock Spark.
    """
    keyed = zorder_keyed(df, list(cols), bits, rel_err)
    (keyed.repartitionByRange(num_files, F.col("__z"))
     .sortWithinPartitions("__z")
     .drop("__z")
     .write.mode("overwrite").parquet(path, compression="snappy"))


def zorder_keyed(df: DataFrame, cols: list[str], bits: int = 8,
                 rel_err: float | None = None) -> DataFrame:
    """The z-key derivation of write_zordered, exposed so tests can assert
    its plan shape (no Window, no single-partition exchange)."""
    if len(cols) < 2:
        raise ValueError("z-ordering needs at least two columns")
    n_cells = 1 << bits
    if rel_err is None:
        # half-a-cell rank error: cell boundaries may shift by ~0.5 cells
        # of population, which only blurs file edges, never correctness
        rel_err = 0.5 / n_cells
    probs = [i / n_cells for i in range(1, n_cells)]
    cuts = df.stat.approxQuantile(list(cols), probs, rel_err)
    # cells come from the Arrow searchsorted kernel (see
    # _quantile_cells_arrow for the measured numbers), materialized as
    # their own columns BEFORE interleaving so the Morton expression
    # references plain ints, not a duplicated kernel per bit
    keyed, cell_cols = df, []
    for idx, (c, cs) in enumerate(zip(cols, cuts)):
        name = f"__zcell{idx}"
        kern = _quantile_cells_arrow(cs, bits)
        keyed = keyed.withColumn(name, kern(F.col(c).cast("double")))
        cell_cols.append(name)
    return (keyed.withColumn("__z", morton_key_multi(cell_cols, bits))
            .drop(*cell_cols))


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
