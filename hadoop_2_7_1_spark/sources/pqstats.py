"""Parquet footer statistics audit: distributed row-group min/max scan.

The scan-pruning half of what the reference's CombineFileInputFormat /
FileInputFormat.getSplits machinery decides from file sizes alone
(MRC/lib/input/FileInputFormat.java:200 getSplits): modern columnar scans
skip whole ROW GROUPS from footer min/max before any I/O on the pages. This
module reads those footers distributively and turns them into an audit
table — which row groups a predicate can skip, how tight the stats are —
the tool you run before blaming a slow 100 TB scan on the engine.

Shape: one task per FILE (footers are KiB-sized regardless of data size);
the page data is never read. At 100 TB with ~100k files this is a
100k-element parallelize + a metadata-only map — seconds, not a scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def parquet_rowgroup_stats(
    spark: SparkSession, paths: list[str], column: str
) -> DataFrame:
    """Per-(file, row_group) footer stats for ``column``: num_rows,
    min/max (as int64 — the caller picks an integer column), null_count.

    Footer decode uses pyarrow inside mapInPandas (Python IS the point:
    this reads parquet METADATA, which no Spark SQL expression exposes);
    each task opens only its files' footers.
    """
    import pandas as pd

    files = spark.createDataFrame([(p,) for p in sorted(paths)], "path string")

    def read_footers(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for path in pdf["path"]:
                md = pq.ParquetFile(path).metadata
                names = {md.schema.column(i).name: i for i in range(md.num_columns)}
                ci = names[column]
                for rg in range(md.num_row_groups):
                    col = md.row_group(rg).column(ci)
                    st = col.statistics
                    rows.append(
                        {
                            "file": path.rsplit("/", 1)[-1],
                            "row_group": rg,
                            "num_rows": md.row_group(rg).num_rows,
                            "min_v": int(st.min),
                            "max_v": int(st.max),
                            "null_count": int(st.null_count),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file",
                    "row_group",
                    "num_rows",
                    "min_v",
                    "max_v",
                    "null_count",
                ],
            )

    return files.mapInPandas(
        read_footers,
        "file string, row_group bigint, num_rows bigint, "
        "min_v bigint, max_v bigint, null_count bigint",
    )


def write_fixture(
    df_pandas, path: str, sort_cols: list[str], row_group_size: int
) -> None:
    """Deterministic parquet fixture: rows total-ordered by ``sort_cols``,
    row groups of EXACTLY ``row_group_size`` rows (pyarrow honors the row
    count exactly), so the footer stats are a pure function of the data —
    replayable in SQL as floor(rank/row_group_size) group mins/maxes.

    Driver-side (takes a pandas frame) — unit-test scale only; the
    registered query uses :func:`write_fixture_distributed`."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ordered = df_pandas.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    pq.write_table(pa.Table.from_pandas(ordered), path, row_group_size=row_group_size)


def write_fixture_distributed(
    df: DataFrame, path: str, sort_cols: list[str], row_group_size: int
) -> int:
    """Single-writer DISTRIBUTED fixture write (the copybook-encoder
    pattern): the table is globally ordered into ONE partition and the
    parquet file is written by THAT executor task through a streaming
    ParquetWriter — row data never reaches the driver, and writer memory
    is bounded by ~row_group_size rows + one Arrow batch (Spark's external
    sorter spills the sort; Arrow batches stream into Python
    incrementally). Same deterministic contract as :func:`write_fixture`:
    total order by ``sort_cols`` (the callers' key sets are unique, so the
    order is unambiguous), row groups of EXACTLY ``row_group_size`` rows.
    Returns the row count written (the count IS the action that runs the
    job). At cluster scale ``path`` must be shared storage; on local[N]
    executor and driver share the filesystem.

    The Arrow schema is derived ONCE from the Spark schema on the driver
    and pinned on every batch (ADVICE r10): per-chunk inference would let
    a batch whose pandas dtypes drift (nulls flipping int64 to float64)
    crash the writer with a schema mismatch, and a zero-row input must
    still produce a footer-scannable empty file — the writer is created
    and closed even when no batch arrives (parity with the driver-side
    :func:`write_fixture`, which always writes the file)."""
    import pandas as pd
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(df.schema)

    def write_one(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq

        writer = None
        buf: list[pd.DataFrame] = []
        buffered = 0
        written = 0

        def flush(force: bool) -> None:
            nonlocal writer, buf, buffered, written
            while buffered >= row_group_size or (force and buffered > 0):
                take = min(buffered, row_group_size)
                pdf = pd.concat(buf, ignore_index=True) if len(buf) > 1 else buf[0]
                chunk, rest = pdf.iloc[:take], pdf.iloc[take:]
                tbl = pa.Table.from_pandas(
                    chunk.reset_index(drop=True),
                    schema=arrow_schema,
                    preserve_index=False,
                )
                if writer is None:
                    writer = pq.ParquetWriter(path, arrow_schema)
                writer.write_table(tbl, row_group_size=row_group_size)
                written += take
                buf = [rest] if len(rest) else []
                buffered -= take

        for pdf in batches:
            if len(pdf):
                buf.append(pdf)
                buffered += len(pdf)
                flush(force=False)
        flush(force=True)
        if writer is None:
            writer = pq.ParquetWriter(path, arrow_schema)  # zero-row input
        writer.close()
        yield pd.DataFrame({"rows_written": [written]})

    ordered = df.repartition(1).sortWithinPartitions(*sort_cols)
    out = ordered.mapInPandas(write_one, "rows_written bigint").collect()
    if not out:
        # Catalyst can fold an empty input to an empty-relation plan whose
        # task never runs write_one; the file must still exist for footer
        # scans, so emit it here — schema-only, zero row data on the driver.
        import pyarrow.parquet as pq

        pq.ParquetWriter(path, arrow_schema).close()
        return 0
    return int(sum(r["rows_written"] for r in out))


def oracle_rowgroup_stats(
    table: str,
    file_name: str,
    key_col: str,
    tiebreak_col: str,
    row_group_size: int,
    skip_pred_min: int,
) -> str:
    """DuckDB twin: reconstruct the fixture's row groups logically —
    total-order by (key, tiebreak), chunk by row_group_size — and derive
    the same min/max/skip columns the footer scan reports."""
    return f"""
    WITH ordered AS (
      SELECT {key_col} AS k,
             (row_number() OVER (ORDER BY {key_col}, {tiebreak_col}) - 1)
               // {row_group_size} AS rg
      FROM {table}
    ),
    g AS (
      SELECT rg, CAST(count(*) AS BIGINT) AS num_rows,
             CAST(min(k) AS BIGINT) AS min_v, CAST(max(k) AS BIGINT) AS max_v
      FROM ordered GROUP BY rg
    )
    SELECT '{file_name}' AS file, CAST(rg AS BIGINT) AS row_group, num_rows,
           min_v, max_v, CAST(0 AS BIGINT) AS null_count,
           (max_v < {skip_pred_min}) AS can_skip
    FROM g
    """
