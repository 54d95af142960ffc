"""Indexed table layout: the engine's sink (S6) and scan (S1) conventions.

GeoWave's write path turns every entry into SFC-keyed KV rows so the scan
path can prune by key range (`AccumuloIndexWriter`, `AccumuloRowId` —
SURVEY.md §2.2).  The Spark translation: the *storage layout* is the index —

    write: partition by `tier`, sort within files by `cell`
    scan:  cell-range predicates prune partitions (tier dirs) and row groups
           (parquet min/max on the sorted cell column)

`write_indexed` / `read_indexed` implement that contract for parquet;
`iceberg_ddl` emits the equivalent Iceberg table spec (this sandbox has no
Iceberg runtime, so the DDL is generated + unit-tested as text — the layout
maps 1:1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from geowave_spark.operators.indexing import with_insertion_cells, with_point_cells


def iceberg_runtime_available(spark: SparkSession) -> bool:
    """True when an Iceberg Spark runtime jar is on the session classpath
    (the `iceberg-spark-runtime` artifact provides SparkCatalog)."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_indexed(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    files_per_tier: int | None = None,
    geometry_codec: str | None = None,
    wkt_col: str = "geom_wkt",
    stats: bool = False,
    format: str = "parquet",
    split_strategy: str = "hash",
) -> None:
    """Write an indexed table: tier partition dirs, cell-sorted files.

    `sortWithinPartitions` (not global orderBy) keeps the write shuffle-free
    beyond the optional coalesce; parquet stores per-row-group min/max of
    `cell`, which is what the scan path prunes on.

    ``geometry_codec="wkb"`` stores the geometry column as OGC WKB binary
    (`geometry/wkb.py`) instead of WKT text — the reference's storage form
    (GeometryUtils WKBWriter), ~2-5x narrower for areal geometries; readers
    decode back with ``wkb_to_wkt`` bit-exactly.

    ``format="iceberg"`` writes the same layout through an Iceberg catalog
    (``path`` is then a table identifier, e.g. ``cat.db.points``): tier
    partition column + per-file cell sort order, the DDL twin of
    :func:`iceberg_ddl`.  It REQUIRES the ``iceberg-spark-runtime`` jar on
    the cluster; this sandbox ships none and has no network to fetch one
    (checked again this round — Maven Central unresolvable), so the request
    fails fast with a clear error instead of Spark's opaque
    ClassNotFoundException mid-write."""
    if format not in ("parquet", "iceberg"):
        raise ValueError(f"unsupported indexed-table format {format!r}")
    out = df
    if geometry_codec == "wkb" and wkt_col in df.columns:
        from geowave_spark.geometry.wkb import wkt_to_wkb

        out = out.withColumn("geom_wkb", wkt_to_wkb(out[wkt_col])).drop(wkt_col)
    if files_per_tier is not None:
        out = split_partitions(out, files_per_tier, split_strategy)
    out = out.sortWithinPartitions("tier", "cell")
    if format == "iceberg":
        spark = df.sparkSession
        if not iceberg_runtime_available(spark):
            raise RuntimeError(
                "write_indexed(format='iceberg') needs the iceberg-spark-runtime "
                "jar on the Spark classpath and a configured catalog; this "
                "environment has neither (offline sandbox). Use format='parquet' "
                "(identical layout semantics) or apply iceberg_ddl() on a "
                "cluster with an Iceberg catalog."
            )
        # identical layout through the catalog: tier partitioning; the
        # within-file cell order comes from the sortWithinPartitions above
        # (v2 writes preserve task-local row order), matching iceberg_ddl's
        # WRITE ORDERED BY clause.  The call chain executes FROM the frozen
        # spec so the golden-pinned contract IS the code path.
        spec = iceberg_write_spec(path)
        writer = out.writeTo(spec["table"]).using(spec["using"])
        writer = writer.partitionedBy(*[out[c] for c in spec["partitioned_by"]])
        getattr(writer, spec["finish"])()
        return
    out.write.mode(mode).partitionBy("tier").parquet(path)
    if stats:
        # ingest-time row-range statistics (RowRangeHistogramStatistics
        # analog): the key-space histogram persists beside the table so
        # query planning (plans/index_select) is pure driver arithmetic —
        # no per-query full scans.  Built from the just-WRITTEN parquet (a
        # cheap columnar scan of one column), not the pre-write plan, which
        # would re-execute every upstream UDF/sort two more times.
        import json

        from geowave_spark.plans.index_select import build_range_histogram

        spark = df.sparkSession
        h = build_range_histogram(spark.read.parquet(path).select("cell"), "cell")
        _fs_write_text(
            spark,
            f"{path}/_stats.json",
            json.dumps({"bounds": h.bounds.tolist(), "total_rows": h.total_rows}),
        )


def _fs_write_text(spark: SparkSession, uri: str, text: str) -> None:
    """Write a small sidecar through the Hadoop FileSystem API so every
    scheme the table itself supports (s3a://, hdfs://, local) works —
    pathlib would silently mangle URIs into bogus local paths."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(uri)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    stream = fs.create(jpath, True)
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()


def _fs_read_text(spark: SparkSession, uri: str) -> str:
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(uri)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    stream = fs.open(jpath)
    try:
        return bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream)).decode("utf-8")
    finally:
        stream.close()


def read_index_stats(spark: SparkSession, path: str):
    """Load the ingest-time key histogram written by write_indexed(stats=True)
    (any Hadoop-supported scheme)."""
    import json

    import numpy as np

    from geowave_spark.plans.index_select import RangeHistogram

    m = json.loads(_fs_read_text(spark, f"{path}/_stats.json"))
    return RangeHistogram(np.array(m["bounds"], dtype=np.float64), m["total_rows"])


def read_indexed(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def ingest_points(
    df: DataFrame, path: str, lon_col: str = "lon", lat_col: str = "lat", **kw
) -> None:
    """Point ingest: encode finest-tier cells, write indexed layout."""
    write_indexed(with_point_cells(df, lon_col, lat_col), path, **kw)


def ingest_extents(
    df: DataFrame, path: str, bbox_cols=("minx", "miny", "maxx", "maxy"), **kw
) -> None:
    """Extent ingest (lines/polygons): K1 tiered insertion cells (<=4 rows
    per entry, `num_duplicates` carried for F5 dedup semantics)."""
    write_indexed(with_insertion_cells(df, bbox_cols), path, **kw)


def iceberg_write_spec(table: str) -> dict:
    """The exact DataFrameWriterV2 call chain ``write_indexed(format=
    'iceberg')`` executes once a runtime jar is present, frozen as data:
    ``df.writeTo(table).using('iceberg').partitionedBy(tier)
    .createOrReplace()`` over a ``sortWithinPartitions('tier', 'cell')``
    input.  The spec is what the pytest golden pins (the catalog jar is
    absent offline, so the chain itself can't run here) AND what the write
    path executes — one source of truth, so a future environment with the
    jar needs zero code change."""
    return {
        "api": "DataFrameWriterV2",
        "table": table,
        "using": "iceberg",
        "partitioned_by": ["tier"],
        "within_file_order": ["tier", "cell"],
        "finish": "createOrReplace",
        "ddl_twin": "iceberg_ddl",
    }


def iceberg_ddl(table: str, schema_cols: dict[str, str]) -> str:
    """Equivalent Iceberg DDL for the indexed layout.

    TEXT CONTRACT ONLY — explicitly unsupported at runtime here: this
    sandbox ships no Iceberg runtime jar (pyspark/jars and the ivy cache
    were checked) and has no network to fetch one, so no ``writeTo``
    round-trip test exists and none is claimed.  What IS exercised end to
    end is the physical layout this DDL encodes — partition by tier,
    write-ordered by (tier, cell) — via the parquet path in
    :func:`write_indexed`; on a cluster with an Iceberg catalog this DDL is
    the one-line swap."""
    cols = ",\n  ".join(f"{c} {t}" for c, t in schema_cols.items())
    return (
        f"CREATE TABLE {table} (\n  {cols}\n)\n"
        "USING iceberg\n"
        "PARTITIONED BY (tier)\n"
        "TBLPROPERTIES ('write.distribution-mode'='hash')\n"
        f";\nALTER TABLE {table} WRITE ORDERED BY (tier, cell);"
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    path: str | None = None,
    key_col: str = "cell",
    mode: str = "overwrite",
) -> None:
    """Write a cell-BUCKETED table: hash-bucketed + bucket-sorted on the key.

    Partition-dir layout (:func:`write_indexed`) serves single-table scans —
    range pruning on the sorted key.  Bucketing serves repeated JOINS: two
    tables bucketed on the same key with the same bucket count co-locate
    matching keys in matching files, so every later equi-join on the key
    (the engine's cell-bucketed PIP/distance/dedup joins) runs with ZERO
    exchange on either side — at 100 TB that deletes the dominant shuffle
    from every query against a reference layer ingested once.  This is the
    storage-level analog of the reference pre-splitting tablets by key so
    scans land on co-located ranges (`AccumuloMRUtils.getSplits`), and the
    literal "bucketing for co-located joins" technique Spark offers.

    Bucketed tables must go through the session catalog (``saveAsTable``);
    ``path`` makes it an external table so the files live where every other
    table lives.  Readers use :func:`read_bucketed`, and Catalyst uses the
    bucket spec automatically — no reader-side hint needed.

    The pre-write ``repartition(n_buckets, key)`` uses the same hash the
    bucket spec does, so every bucket lands in exactly ONE file — without
    it each upstream task writes its own file per bucket (task x bucket
    file explosion), and a multi-file bucket forfeits the sort: readers
    must re-sort before every merge join, keeping the only cost bucketing
    is supposed to delete besides the shuffle."""
    w = (
        df.repartition(n_buckets, df[key_col])
        .write.mode(mode)
        .bucketBy(n_buckets, key_col)
        .sortBy(key_col)
    )
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed table THROUGH the catalog — ``spark.read.parquet`` on
    the same files would drop the bucket spec and re-shuffle every join."""
    return spark.table(table)


def split_partitions(df: DataFrame, n: int, strategy: str = "hash") -> DataFrame:
    """Choose how rows land in the ``n`` write splits — the reference's
    Accumulo split-strategy family (`AccumuloSplitsOperationCLIProvider.java`,
    `AccumuloUtils.java:801-1040`), where tablet split points come from the
    key distribution:

    - ``"hash"``: hash-repartition on (tier, cell) — presplitpartitionid's
      uniform-by-partition-id analog; even file sizes regardless of key
      skew, but a key-range scan touches every file.
    - ``"quantile"``: range-repartition on (tier, cell) — splitquantile:
      boundaries from sampled key quantiles, so every file covers an equal
      ROW share of contiguous key space; range scans prune to few files
      even under skew.  The scale default for read-mostly tables.
    - ``"equal_interval"``: contiguous equal-WIDTH key intervals —
      splitequalinterval: boundaries at fixed key strides (one min/max agg,
      then arithmetic).  Files map 1:1 to uniform grid regions (useful when
      downstream work is per-region), but skewed data skews file sizes.

    Contract note for multi-tier tables: ``"hash"`` scatters EVERY tier
    across the ``n`` partitions (so a tier-partitioned write yields up to n
    files PER tier — the historical ``files_per_tier`` behavior), while the
    two contiguous strategies produce ``n`` partitions TOTAL ordered by
    (tier, cell) — a tier then spans roughly its row share of the n files.
    Contiguity across the whole key space is the point of those strategies
    (matching Accumulo tablets, which are global ranges), so callers sizing
    per-tier file counts should use ``"hash"``.
    """
    if strategy == "hash":
        return df.repartition(n, "tier", "cell")
    if strategy == "quantile":
        return df.repartitionByRange(n, "tier", "cell")
    if strategy == "equal_interval":
        from pyspark.sql import functions as F

        lo, hi = df.agg(F.min("cell"), F.max("cell")).collect()[0]
        if lo is None:  # empty input: nothing to stride over
            return df.repartition(n, "tier", "cell")
        width = max((int(hi) - int(lo) + n) // n, 1)
        bucket = F.least(
            F.lit(n - 1), ((F.col("cell") - F.lit(int(lo))) / F.lit(width)).cast("int")
        )
        return (
            df.withColumn("_split", bucket)
            .repartitionByRange(n, "tier", "_split")
            .drop("_split")
        )
    raise ValueError(f"unknown split strategy {strategy!r} "
                     "(hash | quantile | equal_interval)")
