"""Text-analysis operators for corpus curation (north-star additions).

All pure Column expressions — language ID, quality scoring, token counting
and fingerprinting run inside whole-stage codegen at full scan speed; there
is no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import WS, WS_SQL, oracle_hash32, sql_regex

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol.
SUBTOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "es": ["el", "los", "las", "y", "es", "una"],
}
_LANG_PRIORITY = ["en", "de", "fr", "es"]  # deterministic tie-break order


def _tok_array(text_col: str) -> str:
    # Spark SQL fragment: note WS_SQL (backslashes doubled for SQL literals).
    return f"filter(split(trim({text_col}), '{WS_SQL}'), t -> t <> '')"


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_chars, n_tokens, n_subtokens): whitespace + BPE-ish counts."""
    toks = _tok_array(text_col)
    return df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.length(text_col).cast("bigint").alias("n_chars"),
        F.expr(f"cast(size({toks}) as bigint)").alias("n_tokens"),
        F.expr(
            f"cast(size(regexp_extract_all({text_col}, '{sql_regex(SUBTOKEN_RE)}', 0)) as bigint)"
        ).alias("n_subtokens"),
    )


def oracle_token_stats(table: str, id_col: str, text_col: str) -> str:
    return f"""
    SELECT CAST({id_col} AS BIGINT) AS id,
           CAST(length({text_col}) AS BIGINT) AS n_chars,
           CAST(len(list_filter(regexp_split_to_array(trim({text_col}), '{WS}'), t -> t <> ''))
                AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all({text_col}, '{SUBTOKEN_RE}')) AS BIGINT) AS n_subtokens
    FROM {table}
    """


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic doc quality: alpha/punct/stopword ratios + mean token length.

    score = alpha_ratio * (1 - punct_ratio) * min(1, n_tokens/20) —
    the standard cheap pre-filter shape (length-normalized, symbol-penalized)
    used before expensive model-based scoring.
    """
    toks = _tok_array(text_col)
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.expr(
            f"cast(length(regexp_replace({text_col}, '[^A-Za-z]', '')) as double)"
            f" / greatest(length({text_col}), 1)"
        ).alias("alpha_ratio"),
        F.expr(
            f"cast(length(regexp_replace({text_col}, '[A-Za-z0-9\\\\s]', '')) as double)"
            f" / greatest(length({text_col}), 1)"
        ).alias("punct_ratio"),
        F.expr(
            f"cast(size(filter({toks}, t -> t in ({en}))) as double)"
            f" / greatest(size({toks}), 1)"
        ).alias("stopword_ratio"),
        F.expr(
            f"cast(aggregate({toks}, 0L, (acc, t) -> acc + length(t)) as double)"
            f" / greatest(size({toks}), 1)"
        ).alias("mean_tok_len"),
    ).withColumn(
        "quality",
        (
            F.col("alpha_ratio")
            * (1 - F.col("punct_ratio"))
            * F.least(F.lit(1.0), F.expr("stopword_ratio * 10"))
        ).cast("double"),
    )


def oracle_quality_score(table: str, id_col: str, text_col: str) -> str:
    toks = f"list_filter(regexp_split_to_array(trim({text_col}), '{WS}'), t -> t <> '')"
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return f"""
    WITH base AS (
      SELECT CAST({id_col} AS BIGINT) AS id,
             CAST(length(regexp_replace({text_col}, '[^A-Za-z]', '', 'g')) AS DOUBLE)
               / greatest(length({text_col}), 1) AS alpha_ratio,
             CAST(length(regexp_replace({text_col}, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
               / greatest(length({text_col}), 1) AS punct_ratio,
             CAST(len(list_filter({toks}, t -> t IN ({en}))) AS DOUBLE)
               / greatest(len({toks}), 1) AS stopword_ratio,
             CAST(list_sum(list_transform({toks}, t -> length(t))) AS DOUBLE)
               / greatest(len({toks}), 1) AS mean_tok_len
      FROM {table}
    )
    SELECT id, alpha_ratio, punct_ratio, stopword_ratio,
           coalesce(mean_tok_len, 0.0) AS mean_tok_len,
           CAST(alpha_ratio * (1 - punct_ratio) * least(1.0, stopword_ratio * 10) AS DOUBLE)
             AS quality
    FROM base
    """


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-vote language ID: argmax over per-language hit counts,
    priority order breaks ties, zero hits → 'unknown'."""
    toks = _tok_array(text_col)
    scores = {
        lang: F.expr(
            f"size(filter({toks}, t -> t in ({', '.join(repr(w) for w in ws)})))"
        )
        for lang, ws in STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("unknown")
    for lang in reversed(_LANG_PRIORITY):
        pred = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return df.select(
        F.col(id_col).cast("bigint").alias("id"), pred.alias("pred_lang")
    )


def oracle_lang_id(table: str, id_col: str, text_col: str) -> str:
    toks = f"list_filter(regexp_split_to_array(trim({text_col}), '{WS}'), t -> t <> '')"
    score_sql = {
        lang: f"len(list_filter({toks}, t -> t IN ({', '.join(repr(w) for w in ws)})))"
        for lang, ws in STOPWORDS.items()
    }
    best = f"greatest({', '.join(score_sql[lang] for lang in _LANG_PRIORITY)})"
    # Build the same priority chain: first lang in priority order hitting max.
    chain = "'unknown'"
    for lang in reversed(_LANG_PRIORITY):
        chain = (
            f"CASE WHEN {score_sql[lang]} = {best} AND {best} > 0 "
            f"THEN '{lang}' ELSE {chain} END"
        )
    return f"SELECT CAST({id_col} AS BIGINT) AS id, {chain} AS pred_lang FROM {table}"


def fingerprint(df: DataFrame, id_col: str, text_col: str, ngram: int = 8, keep: int = 4) -> DataFrame:
    """Document fingerprint: the ``keep`` smallest 32-bit hashes of the doc's
    character n-grams (a min-k sketch ≈ winnowing), joined as a stable string.

    Identical fingerprints ⇒ near-identical content; the sketch is tiny and
    join-friendly at corpus scale.
    """
    grams = (
        f"CASE WHEN length({text_col}) >= {ngram} THEN "
        f"transform(sequence(1, length({text_col}) - {ngram - 1}),"
        f" i -> substring({text_col}, i, {ngram})) ELSE array() END"
    )
    hashes = (
        f"transform({grams}, g -> cast(conv(substring(md5(g), 1, 8), 16, 10) as bigint))"
    )
    return df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.expr(
            f"array_join(transform(slice(array_sort(array_distinct({hashes})), 1, {keep}),"
            f" x -> cast(x as string)), ',')"
        ).alias("fp"),
    )


def oracle_fingerprint(table: str, id_col: str, text_col: str, ngram: int = 8, keep: int = 4) -> str:
    h = oracle_hash32("g")
    grams = (
        f"list_transform(range(1, greatest(length({text_col}) - {ngram - 1}, 0) + 1),"
        f" i -> substr({text_col}, i, {ngram}))"
    )
    hashes = f"list_transform({grams}, g -> {h})"
    return f"""
    SELECT CAST({id_col} AS BIGINT) AS id,
           array_to_string(list_sort(list_distinct({hashes}))[1:{keep}], ',') AS fp
    FROM {table}
    """


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

REDACT_PATTERNS: dict[str, str] = {
    # order matters: emails before bare domains would, e.g., double-redact
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "PHONE": r"\+?\d{3}[-. ]\d{3,4}[-. ]\d{4}",
    "SSN": r"\b\d{3}-\d{2}-\d{4}\b",
}


def redact(df: DataFrame, text_col: str, out_col: str | None = None) -> DataFrame:
    """Replace common PII shapes with ``[TAG]`` placeholders.

    Chained ``regexp_replace`` — stays in codegen, one pass over the string
    per pattern. The pattern registry is deliberately conservative (high
    precision); recall-oriented NER belongs in a Pandas-UDF stage.
    """
    out_col = out_col or text_col
    expr = F.col(text_col)
    for tag, pat in REDACT_PATTERNS.items():
        expr = F.regexp_replace(expr, pat, f"[{tag}]")
    return df.withColumn(out_col, expr)


def oracle_redact(text_expr: str) -> str:
    """DuckDB regexp_replace chain matching :func:`redact` ('g' = all hits)."""
    expr = text_expr
    for tag, pat in REDACT_PATTERNS.items():
        sql_pat = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{sql_pat}', '[{tag}]', 'g')"
    return expr
