"""Unit tests for the text-analysis stages (vectorized kernels)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from approximate_quantiles_ray.pipelines.textstats import (
    LanguageID,
    QualityScorer,
    fingerprint_batch,
    token_count_stats,
)


def _tbl(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_token_counts():
    t = token_count_stats(_tbl(["hello world", "  a  b   c ", "", "x,y.z"]))
    assert t.column("n_tokens").to_pylist() == [2, 3, 0, 1]
    assert t.column("n_word_tokens").to_pylist() == [2, 3, 0, 5]
    assert t.column("n_alpha").to_pylist() == [10, 3, 0, 3]


def test_quality_scorer_ranks_real_text_above_junk():
    good = "the quick brown fox jumps over the lazy dog and runs into the forest"
    junk = "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"
    t = QualityScorer()(_tbl([good, junk, ""]))
    scores = t.column("quality_score").to_pylist()
    assert scores[0] > scores[1] > 0
    assert scores[2] == 0.0 or scores[2] < scores[0]
    ratios = t.column("alpha_ratio").to_pylist()
    assert 0 <= ratios[0] <= 1 and ratios[1] == 1.0


def test_language_id_on_crafted_sentences():
    texts = [
        "the cat and the dog sat in the house for a while",
        "el perro y el gato de la casa que corre por los campos",
        "der Hund und die Katze von dem Haus ist im Garten mit den Kindern",
        "le chien et le chat de la maison que les enfants du village",
        "这是一个中文句子用来测试语言识别的功能",
        "1234 5678 !!!",
    ]
    t = LanguageID()(_tbl(texts))
    assert t.column("lang_pred").to_pylist() == ["en", "es", "de", "fr", "zh", "unknown"]


def test_fingerprint_deterministic_and_content_sensitive():
    a = fingerprint_batch(_tbl(["abc", "abd", "abc"])).column("fingerprint").to_pylist()
    assert a[0] == a[2] and a[0] != a[1]
    b = fingerprint_batch(_tbl(["abc"])).column("fingerprint").to_pylist()
    assert b[0] == a[0]  # partition-independent


def test_distinctive_terms_empty_when_uniform(ray_session, tmp_path):
    """A perfectly uniform corpus has no over-represented tokens — the
    result must be EMPTY with the declared schema (the sf0.1 shape),
    and DuckDB must agree dtype-for-dtype on the empty frame."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from approximate_quantiles_ray.pipelines import textstats as ts

    tbl = pa.table(
        {
            "source": ["s0", "s1", "s2", "s3"],
            "text": ["alpha beta gamma"] * 4,
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = ts.docs_distinctive_terms(str(tmp_path))
    assert len(got) == 0
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    exp = con.sql(ts.ORACLE_SQL["docs_distinctive_terms"]).df()
    assert len(exp) == 0
    assert [str(t) for t in got.dtypes] == [str(t) for t in exp.dtypes]
    assert list(got.columns) == list(exp.columns)


def test_distinctive_terms_planted_skew(ray_session, tmp_path):
    """A token concentrated in one source must surface for that source
    with exact tf/gtf, rank 1."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from approximate_quantiles_ray.pipelines import textstats as ts

    rows = []
    for s in range(4):
        for _ in range(5):
            rows.append((f"s{s}", "common words here"))
    rows += [("s0", "zebra zebra zebra common")] * 3
    tbl = pa.table(
        {
            "source": [r[0] for r in rows],
            "text": [r[1] for r in rows],
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = ts.docs_distinctive_terms(str(tmp_path))
    z = got[got["token"] == "zebra"]
    assert len(z) == 1
    assert z.iloc[0]["source"] == "s0"
    assert z.iloc[0]["n"] == 9 and z.iloc[0]["gtf"] == 9
    assert z.iloc[0]["rnk"] == 1


def test_per_doc_reports_sink_variant(ray_session, tmp_path, monkeypatch):
    """VERDICT r3 item 4: with output_path= the per-doc report queries
    stream to Parquet and return a bounded summary — no full-corpus
    to_pandas on the driver. Oracle (no-sink) shape unchanged."""
    import pyarrow.dataset as pads

    from approximate_quantiles_ray.pipelines import textstats as ts

    sf = "/root/testdata/sf0.001"
    fams = [
        ts.docs_token_stats,
        ts.docs_quality_report,
        ts.docs_lang_id,
        ts.docs_fingerprints,
        ts.docs_quality_features,
        ts.docs_lang_stopword_hits,
        ts.docs_quality_ratios,
        ts.docs_content_ids,
    ]
    n_docs = len(ts.docs_token_stats(sf))

    # sink path must never call Dataset.to_pandas
    import ray.data

    def boom(self, *a, **k):
        raise AssertionError("sink variant materialized the corpus on the driver")

    for i, fn in enumerate(fams):
        out_dir = str(tmp_path / f"rep{i}")
        monkeypatch.setattr(ray.data.Dataset, "to_pandas", boom)
        try:
            summary = fn(sf, output_path=out_dir)
        finally:
            monkeypatch.undo()
        assert list(summary.columns) == ["rows_written", "output_path"]
        assert int(summary["rows_written"].iloc[0]) == n_docs
        sunk = pads.dataset(out_dir, format="parquet")
        assert sunk.count_rows() == n_docs
        assert "doc_id" in sunk.schema.names
