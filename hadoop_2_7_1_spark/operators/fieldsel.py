"""FieldSelection operators (SURVEY.md §2.2).

FieldSelectionHelper (mapreduce/lib/fieldsel/FieldSelectionHelper.java:60-68)
parses "cut"-style specs: a field-list of single indices and ranges, where a
trailing ``-`` range means "to end of record" — e.g. ``"6,5,1-3:0-"`` is a
key spec (``6,5,1-3``) and a value spec (``0-``) separated by ``:``.
FieldSelectionMapper splits each line on a separator and emits the selected
fields joined by the same separator.

Here the spec compiles to a JVM-side Column over ``split(line, sep)`` —
whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OPEN_END = -1  # marker for "through last field"


def parse_field_list(spec: str) -> list[tuple[int, int]]:
    """Parse ``"6,5,1-3,0-"`` into [(6,6),(5,5),(1,3),(0,OPEN_END)] (0-based,
    inclusive), preserving order (selection order matters, like cut -f)."""
    out: list[tuple[int, int]] = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "-" in part:
            lo_s, hi_s = part.split("-", 1)
            lo = int(lo_s) if lo_s else 0
            hi = int(hi_s) if hi_s else OPEN_END
            out.append((lo, hi))
        else:
            i = int(part)
            out.append((i, i))
    return out


def parse_spec(spec: str) -> tuple[list[tuple[int, int]], list[tuple[int, int]]]:
    """Split a full ``keyspec:valuespec`` string."""
    if ":" in spec:
        k, v = spec.split(":", 1)
    else:
        k, v = spec, ""
    return parse_field_list(k), parse_field_list(v)


def _select_expr(fields_col: str, ranges: list[tuple[int, int]], sep: str) -> Column:
    """Build array of selected fields (Spark arrays are 1-based in slice)."""
    parts = []
    for lo, hi in ranges:
        if hi == OPEN_END:
            parts.append(f"slice({fields_col}, {lo + 1}, size({fields_col}) - {lo})")
        elif hi >= lo:
            parts.append(f"slice({fields_col}, {lo + 1}, {hi - lo + 1})")
    if not parts:
        return F.lit("")
    return F.expr(f"array_join(concat({', '.join(parts)}), '{sep}')")


def field_select(
    df: DataFrame,
    line_col: str,
    spec: str,
    sep: str = "\t",
    key_name: str = "key",
    value_name: str = "value",
) -> DataFrame:
    """FieldSelectionMapper: split ``line_col`` on ``sep``, emit (key, value)
    strings per the spec."""
    import re

    key_ranges, value_ranges = parse_spec(spec)
    fields = F.split(F.col(line_col), re.escape(sep))
    df = df.withColumn("__fields", fields)
    out = df.select(
        _select_expr("__fields", key_ranges, sep).alias(key_name),
        _select_expr("__fields", value_ranges, sep).alias(value_name),
    )
    return out
