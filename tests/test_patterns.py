"""Regex pattern extraction / PII redaction: Arrow-RE2 vs DuckDB-RE2
oracle agreement, redact_batch semantics on planted PII, and the scrub
CLI job end to end."""

from __future__ import annotations

import json

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from approximate_quantiles_ray.pipelines import patterns

SF_DIR = "/root/testdata/sf0.001"

PII_TEXTS = [
    "contact me at alice@example.com or bob.smith+x@corp.co.uk thanks",
    "server at 10.0.42.7 went down, card 4111-1111-1111-1111 leaked",
    "call +1 (555) 123-4567 tomorrow",
    "nothing sensitive here at all",
]


def test_pattern_queries_match_duckdb(ray_session):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    for name in ("docs_pattern_counts", "docs_redact_stats"):
        got = patterns.QUERIES[name](SF_DIR)
        exp = con.sql(patterns.ORACLE_SQL[name]).df()
        cols = sorted(got.columns)
        pd.testing.assert_frame_equal(
            got[cols].sort_values(cols).reset_index(drop=True),
            exp[cols].sort_values(cols).reset_index(drop=True),
            check_exact=True,
        )
    # the corpus-active patterns must actually fire (a zero-only oracle
    # comparison would prove nothing)
    counts = patterns.docs_pattern_counts(SF_DIR)
    assert counts["n_ow_words"].sum() > 0
    assert counts["n_vowel_pair"].sum() > 0
    # and the PII patterns must be exercised as zeros on clean text
    assert counts["n_email"].sum() == 0


def test_redact_batch_masks_planted_pii():
    tbl = pa.table({"doc_id": list(range(len(PII_TEXTS))), "text": PII_TEXTS})
    red = patterns.redact_batch(tbl, patterns.PII_PATTERNS)
    out = red.column("text").to_pylist()
    joined = "\n".join(out)
    assert "alice@example.com" not in joined
    assert "10.0.42.7" not in joined
    assert "4111-1111-1111-1111" not in joined
    assert "123-4567" not in joined
    assert out[3] == PII_TEXTS[3]  # clean row untouched
    assert all(patterns.REDACT_MASK in t for t in out[:3])


def test_redact_agrees_with_duckdb_on_planted_pii():
    """Same nested-replace order in Arrow and DuckDB → identical text."""
    tbl = pa.table({"text": PII_TEXTS})
    got = patterns.redact_batch(tbl, patterns.PII_PATTERNS).column("text").to_pylist()
    expr = "text"
    for p in patterns.PII_PATTERNS.values():
        expr = f"regexp_replace({expr}, '{p}', '{patterns.REDACT_MASK}', 'g')"
    con = duckdb.connect()
    exp = con.sql(
        f"SELECT {expr} AS t FROM (SELECT unnest(?) AS text)", params=[PII_TEXTS]
    ).df()["t"].tolist()
    assert got == exp


def test_scrub_cli(ray_session, tmp_path, capsys):
    from approximate_quantiles_ray import jobs

    src = tmp_path / "in.parquet"
    pq.write_table(
        pa.table({"doc_id": list(range(4)), "text": PII_TEXTS}), src
    )
    out = str(tmp_path / "scrubbed")
    jobs.main(["scrub", "--input", str(src), "--output", out,
               "--pattern", "shout=[A-Z]{4,}"])
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["rows"] == 4
    assert rep["docs_changed"] == 3
    assert "shout" in rep["patterns"] and "email" in rep["patterns"]
    import pyarrow.dataset as pads

    res = pads.dataset(out).to_table().sort_by("doc_id")
    texts = res.column("text").to_pylist()
    assert "alice@example.com" not in texts[0]
    assert res.column("_scrub_changed").to_pylist() == [1, 1, 1, 0]


def test_redaction_masks_pii_before_active_patterns():
    """ADVICE r3 item 5: PII patterns run before the corpus-active demo
    patterns, so a vowel pair inside an email can't break the email
    match and leave PII-shaped fragments behind."""
    import pyarrow as pa

    from approximate_quantiles_ray.pipelines.patterns import (
        ALL_PATTERNS,
        PII_PATTERNS,
        redact_batch,
    )

    assert list(ALL_PATTERNS)[: len(PII_PATTERNS)] == list(PII_PATTERNS)
    tbl = pa.table({"text": pa.array(["contact aeio.doe@mail.example.com now"])})
    out = redact_batch(tbl, ALL_PATTERNS).column("text").to_pylist()[0]
    assert "example" not in out and "@" not in out and "doe" not in out
