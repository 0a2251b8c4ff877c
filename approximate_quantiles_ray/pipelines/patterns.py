"""Regex pattern extraction and redaction over document corpora.

The training-data use-case is PII scrubbing: find and mask emails /
IPv4s / phone numbers / card-like digit runs before a corpus ships.
The operator is a generic named-pattern engine: every pattern runs as
an Arrow RE2 kernel (`count_substring_regex` / `replace_substring_regex`
— vectorized, no Python row loop), and DuckDB shares the RE2 dialect,
so per-source match counts and redaction deltas are SQL-oracle-able
bit-for-bit (`regexp_extract_all` / `regexp_replace(..., 'g')`).

The synthetic corpus contains no real PII, so alongside the PII set we
ship "corpus-active" patterns that do fire on it — the oracle then
pins nonzero counts AND the PII zero-counts in one query.

Scale shape: one streaming map_batches pass over (source, text), KB of
partial rows per block, one tiny grouped fold. Redaction writes
per-shard Parquet via `jobs.py scrub` — never materialized.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from approximate_quantiles_ray.sources.read import read_parquet_sized

# RE2-compatible (Arrow AND DuckDB): no backreferences, no lookaround.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\b\+?\d{1,2}[-. ]?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b",
    "card": r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}\b",
}

# patterns that DO fire on the synthetic vocabulary corpus — they keep
# the oracle comparison nonzero-valued (PII counts alone would pin only
# zeros there)
ACTIVE_PATTERNS: dict[str, str] = {
    "ow_words": r"\b\w*ow\b",          # row / slow / window
    "vowel_pair": r"[aeiou]{2}",       # stream / query / join ...
    "s_words": r"\bs\w{3,}\b",         # scan / slow / sort / stream ...
}

# PII first: masking order matters for redaction — an ACTIVE pattern
# (e.g. vowel_pair) firing inside an email/phone would otherwise break
# the later PII match and leave PII-shaped spans partially intact. The
# SQL twins derive from this dict, so both sides stay in lockstep.
ALL_PATTERNS: dict[str, str] = {**PII_PATTERNS, **ACTIVE_PATTERNS}

REDACT_MASK = "[REDACTED]"


def pattern_count_partials(
    tbl: pa.Table,
    patterns: dict[str, str],
    text_col: str = "text",
    group_col: str = "source",
) -> pa.Table:
    """Per-(group) partial rows: total match count + docs-with-match
    per pattern, plus doc count. One RE2 sweep per pattern per batch."""
    text = tbl.column(text_col).combine_chunks()
    cols: dict = {group_col: tbl.column(group_col)}
    for name, pat in patterns.items():
        n = pc.count_substring_regex(text, pattern=pat)
        cols[f"n_{name}"] = pc.cast(n, pa.int64())
        cols[f"docs_{name}"] = pc.cast(pc.greater(n, 0), pa.int64())
    cols["n_docs"] = pa.array([1] * tbl.num_rows, pa.int64())
    flat = pa.table(cols)
    keys = [c for c in flat.column_names if c != group_col]
    agg = flat.group_by([group_col]).aggregate([(c, "sum") for c in keys])
    return agg.rename_columns([group_col] + keys)


def redact_batch(
    tbl: pa.Table,
    patterns: dict[str, str],
    text_col: str = "text",
    mask: str = REDACT_MASK,
) -> pa.Table:
    """Replace every match of every pattern with ``mask`` (all
    occurrences, pattern order = dict order — mirrored in the SQL
    twin by nesting regexp_replace in the same order)."""
    text = tbl.column(text_col).combine_chunks()
    for pat in patterns.values():
        text = pc.replace_substring_regex(text, pattern=pat, replacement=mask)
    return tbl.set_column(tbl.column_names.index(text_col), text_col, text)


def docs_pattern_counts(sf_dir: str) -> pd.DataFrame:
    """Per-source regex audit (oracle-matched): total matches and
    docs-with-match for each PII + corpus-active pattern."""
    from approximate_quantiles_ray.engine.folds import adaptive_grouped_agg

    ds = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    part = ds.map_batches(
        lambda t: pattern_count_partials(t, ALL_PATTERNS),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    val_cols = [f"n_{p}" for p in ALL_PATTERNS] + [f"docs_{p}" for p in ALL_PATTERNS]
    out = adaptive_grouped_agg(
        part, ["source"], {c: "sum" for c in val_cols + ["n_docs"]}
    )
    return out.sort_values("source").reset_index(drop=True)


def docs_redact_stats(sf_dir: str) -> pd.DataFrame:
    """Per-source redaction delta (oracle-matched): doc count, docs
    changed, total chars before/after masking every pattern."""
    from approximate_quantiles_ray.engine.folds import adaptive_grouped_agg

    ds = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["source", "text"])

    def partials(tbl: pa.Table) -> pa.Table:
        before = pc.cast(pc.utf8_length(tbl.column("text").combine_chunks()), pa.int64())
        red = redact_batch(tbl, ALL_PATTERNS)
        after = pc.cast(pc.utf8_length(red.column("text").combine_chunks()), pa.int64())
        flat = pa.table(
            {
                "source": tbl.column("source"),
                "n_docs": pa.array([1] * tbl.num_rows, pa.int64()),
                "docs_changed": pc.cast(pc.not_equal(before, after), pa.int64()),
                "chars_before": before,
                "chars_after": after,
            }
        )
        keys = ["n_docs", "docs_changed", "chars_before", "chars_after"]
        return flat.group_by(["source"]).aggregate(
            [(c, "sum") for c in keys]
        ).rename_columns(["source"] + keys)

    part = ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    out = adaptive_grouped_agg(
        part,
        ["source"],
        {c: "sum" for c in ["n_docs", "docs_changed", "chars_before", "chars_after"]},
    )
    return out.sort_values("source").reset_index(drop=True)


def _sql_counts() -> str:
    n_cols = ",\n       ".join(
        f"CAST(SUM(length(regexp_extract_all(text, '{p}'))) AS BIGINT) AS n_{name}"
        for name, p in ALL_PATTERNS.items()
    )
    d_cols = ",\n       ".join(
        f"CAST(SUM(CASE WHEN regexp_matches(text, '{p}') THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS docs_{name}"
        for name, p in ALL_PATTERNS.items()
    )
    return f"""
SELECT source,
       {n_cols},
       {d_cols},
       COUNT(*) AS n_docs
FROM documents
GROUP BY source
ORDER BY source
"""


def _sql_redact() -> str:
    expr = "text"
    for p in ALL_PATTERNS.values():
        expr = f"regexp_replace({expr}, '{p}', '{REDACT_MASK}', 'g')"
    return f"""
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN length(text) <> length({expr}) THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_changed,
       CAST(SUM(length(text)) AS BIGINT) AS chars_before,
       CAST(SUM(length({expr})) AS BIGINT) AS chars_after
FROM documents
GROUP BY source
ORDER BY source
"""


ORACLE_SQL = {
    "docs_pattern_counts": _sql_counts(),
    "docs_redact_stats": _sql_redact(),
}

QUERIES = {
    "docs_pattern_counts": docs_pattern_counts,
    "docs_redact_stats": docs_redact_stats,
}
