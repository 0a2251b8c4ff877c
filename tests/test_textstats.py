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
