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
    replayable in SQL as floor(rank/row_group_size) group mins/maxes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ordered = df_pandas.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    pq.write_table(pa.Table.from_pandas(ordered), path, row_group_size=row_group_size)


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
