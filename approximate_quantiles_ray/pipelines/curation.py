"""The end-to-end corpus-curation funnel as a library function and an
oracle-matched query.

``curation_funnel`` is the engine behind the ``jobs curate`` CLI:
exact dedup → benchmark decontamination → repetition/quality filter →
temperature mixing sample → (optional) seeded shard export, every
stage the same deterministic arithmetic as its standalone
oracle-matched query twin. ``docs_curation_report`` runs the funnel
WITHOUT writing and returns the stage counts as one row — and because
every stage is exact integer/hash arithmetic, the ENTIRE pipeline has
a single DuckDB SQL twin (dedup by text equality, string 5-gram
contamination, trigram ratios, isqrt mixing rates, hash32 sampling
mask), so the driver's hash gate verifies the composed funnel
end-to-end, not just its parts.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from approximate_quantiles_ray.functions.hashing import splitmix64
from approximate_quantiles_ray.sources.read import read_any

QUERIES: dict = {}
ORACLE_SQL: dict = {}


def curation_funnel(
    input_path: str,
    output: str | None = None,
    seed: int = 42,
    bench_mod: int = 50,
    max_dup_permille: int = 200,
    min_tokens: int = 5,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Run the full curation funnel; write shards only when ``output``
    is given. Returns the per-stage survivor counts (plus the mixing
    rates). See module docstring for the plan; scale notes live on the
    standalone operator twins (dedup.exact_dedup, docs_decontaminate,
    docs_repetition_stats, docs_mixing_plan, jobs shuffle-export).
    """
    import ray
    import ray.data as rd

    from approximate_quantiles_ray.engine.folds import (
        adaptive_grouped_agg,
        adaptive_grouped_agg_ds,
    )
    from approximate_quantiles_ray.functions.hashing import hash_strings
    from approximate_quantiles_ray.pipelines.dedup import (
        _word_shingle_hashes_flat,
        exact_dedup,
    )
    from approximate_quantiles_ray.pipelines.sampling import bernoulli_mask

    ds = read_any(input_path).materialize()
    n_input = ds.count()

    # stage 1: exact dedup (keep MIN id per content hash), ADAPTIVE:
    # per-block (text_hash, min id) partials fold on the driver under
    # the cap and the keep-id set broadcasts into the flag pass (no
    # join operator, no extra materialization — the Ray hash-agg +
    # left_semi pair costs ~10 s of fixed stage latency that dwarfs a
    # small corpus); above the cap the distributed groupby + semi join
    # is the 100 TB path, identical semantics (path-agreement tested).
    def dedup_partials(tbl: pa.Table) -> pa.Table:
        h = hash_strings(tbl.column(text_col).combine_chunks())
        t = pa.table(
            {
                "text_hash": pa.array(h.view(np.int64)),
                id_col: tbl.column(id_col),
            }
        )
        agg = t.group_by(["text_hash"]).aggregate([(id_col, "min")])
        return agg.rename_columns(["text_hash", id_col])

    folded, keep_is_ds = adaptive_grouped_agg_ds(
        ds.map_batches(dedup_partials, batch_format="pyarrow", zero_copy_batch=True),
        ["text_hash"], {id_col: "min"},
    )
    n_parts = max(8, int(ray.cluster_resources().get("CPU", 8)))
    if keep_is_ds:
        # over-cap: distributed keep-set + semi join (the scale path)
        keep = (
            exact_dedup(ds, id_col=id_col, text_col=text_col)
            .select_columns([id_col])
            .repartition(n_parts)
            .materialize()
        )
        s1 = ds.join(keep, "left_semi", num_partitions=n_parts, on=(id_col,))
        keep_ref = None
    else:
        s1 = ds  # dedup applied as a broadcast mask inside the flag pass
        keep_ref = ray.put(np.sort(folded[id_col].to_numpy(np.int64)))

    # stage 2 prep: benchmark shingle-hash set from the ORIGINAL corpus
    def block_bench(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)
        bench = tbl.filter(pa.array(ids % bench_mod == 0))
        flat, _ = _word_shingle_hashes_flat(bench.column(text_col), 5)
        return pa.table({"h": pa.array(np.unique(flat), pa.uint64())})

    bench_sorted = np.unique(
        ds.map_batches(block_bench, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()["h"]
        .to_numpy(np.uint64)
    )
    bench_ref = ray.put(bench_sorted)

    # stages (1+)2+3: flag columns in one pass
    def flag_fn(tbl: pa.Table) -> pa.Table:
        bench_arr = ray.get(bench_ref)
        ids = tbl.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)
        if keep_ref is not None:
            keep_sorted = ray.get(keep_ref)
            pos_k = np.searchsorted(keep_sorted, ids)
            pos_k[pos_k >= len(keep_sorted)] = 0
            kept_mask = (
                keep_sorted[pos_k] == ids if len(keep_sorted)
                else np.zeros(len(ids), bool)
            )
            tbl = tbl.filter(pa.array(kept_mask))
            ids = ids[kept_mask]
        is_bench = ids % bench_mod == 0
        g5, c5 = _word_shingle_hashes_flat(tbl.column(text_col), 5)
        doc5 = np.repeat(np.arange(len(c5), dtype=np.int64), c5)
        pos = np.searchsorted(bench_arr, g5)
        pos[pos >= len(bench_arr)] = 0
        hit = bench_arr[pos] == g5 if len(bench_arr) else np.zeros(len(g5), bool)
        contaminated = np.zeros(tbl.num_rows, bool)
        contaminated[np.unique(doc5[hit])] = True
        g3, c3 = _word_shingle_hashes_flat(tbl.column(text_col), 3)
        doc3 = np.repeat(np.arange(len(c3), dtype=np.int64), c3)
        n_tri = c3.astype(np.int64)
        if len(g3):
            o = np.lexsort((g3, doc3))
            d_s, h_s = doc3[o], g3[o]
            first = np.concatenate(
                [[True], (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])]
            )
            distinct = np.bincount(d_s[first], minlength=tbl.num_rows).astype(np.int64)
        else:
            distinct = np.zeros(tbl.num_rows, np.int64)
        dup_pm = np.zeros(tbl.num_rows, np.int64)
        nz = n_tri > 0
        dup_pm[nz] = 1000 * (n_tri[nz] - distinct[nz]) // n_tri[nz]
        n_tok = n_tri + 2
        n_tok[~nz] = 0
        lowqual = (dup_pm >= max_dup_permille) | (n_tok < min_tokens)
        return (
            tbl.append_column("is_bench", pa.array(is_bench))
            .append_column("contaminated", pa.array(contaminated & ~is_bench))
            .append_column("lowqual", pa.array(lowqual & ~is_bench & ~contaminated))
        )

    flagged = s1.map_batches(
        flag_fn, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_dedup = flagged.count()
    sums = flagged.sum(["is_bench", "contaminated", "lowqual"])
    n_bench = int(sums["sum(is_bench)"])
    n_contam = int(sums["sum(contaminated)"])
    n_lowqual = int(sums["sum(lowqual)"])

    def keep_only(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.and_(
            pc.and_(
                pc.invert(tbl.column("is_bench")), pc.invert(tbl.column("contaminated"))
            ),
            pc.invert(tbl.column("lowqual")),
        )
        return tbl.filter(m).drop_columns(["is_bench", "contaminated", "lowqual"])

    clean = flagged.map_batches(
        keep_only, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_clean = clean.count()

    # stage 4: mixing plan over SURVIVOR char totals (exact Python ints)
    def block_chars(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lens = pc.cast(pc.utf8_length(tbl.column(text_col)), pa.int64())
        agg = (
            tbl.select(["source"]).append_column("c", lens)
            .group_by(["source"]).aggregate([("c", "sum")])
        )
        return agg.rename_columns(["source", "c"])

    totals = adaptive_grouped_agg(
        clean.map_batches(block_chars, batch_format="pyarrow", zero_copy_batch=True),
        ["source"], {"c": "sum"},
    )
    cs = {s: int(c) for s, c in zip(totals["source"], totals["c"])}
    ws = {s: math.isqrt(c) for s, c in cs.items()}
    B, W = sum(cs.values()) // 2, sum(ws.values())
    rates = {
        s: min(1000, (1000 * B * ws[s]) // (W * cs[s])) if cs[s] else 0 for s in cs
    }

    # stage 5: sample + seeded shard assignment (+ optional export)
    def sample_assign(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)
        src = tbl.column("source").combine_chunks().to_numpy(zero_copy_only=False)
        rate = pd.Series(src).map(rates).to_numpy(np.int64)
        kept = tbl.filter(pa.array(bernoulli_mask(ids, rate, seed)))
        kids = kept.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)
        h = splitmix64(kids.astype(np.uint64) ^ splitmix64(np.uint64(seed)))
        kept = kept.append_column("shard", pa.array((h % n_shards).astype(np.int64)))
        return kept.append_column("h", pa.array(h.view(np.int64)))

    final = clean.map_batches(
        sample_assign, batch_format="pyarrow", zero_copy_batch=True
    )
    if output is not None:
        final = final.sort(["shard", "h"]).materialize()
        n_final = final.count()
        final.write_parquet(output, partition_cols=["shard"])
    else:
        n_final = final.count()
    return {
        "input": int(n_input),
        "after_dedup": int(n_dedup),
        "bench_held_out": n_bench,
        "contaminated_dropped": n_contam,
        "lowqual_dropped": n_lowqual,
        "after_filters": int(n_clean),
        "exported": int(n_final),
        "n_shards": n_shards,
        "seed": seed,
        "rates_permille": rates,
        "output": output,
    }


def docs_curation_report(sf_dir: str) -> pd.DataFrame:
    """END-TO-END CURATION FUNNEL (oracle-matched as ONE query): the
    composed dedup → decontaminate → quality-filter → mixing-sample
    pipeline's stage counts, bit-checked against a single DuckDB twin
    that re-derives every stage with text equality, string 5-grams,
    trigram ratios, corrected isqrt rates and the SQL-parity hash mask.
    The strongest correctness statement in the repo: not just each
    operator, but their COMPOSITION (flag precedence, survivor-based
    rates, replayable sampling) matches SQL exactly.
    """
    rep = curation_funnel(f"{sf_dir}/documents.parquet")
    out = pd.DataFrame(
        [
            {
                "n_input": rep["input"],
                "after_dedup": rep["after_dedup"],
                "bench_held_out": rep["bench_held_out"],
                "contaminated_dropped": rep["contaminated_dropped"],
                "lowqual_dropped": rep["lowqual_dropped"],
                "after_filters": rep["after_filters"],
                "exported": rep["exported"],
            }
        ]
    )
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


# isqrt correction identical to sampling._SQL_ISQRT (kept in sync by
# tests/test_driver_contract comparing the composed funnel end-to-end)
_ISQRT = (
    "(CAST(FLOOR(SQRT(CAST(c AS DOUBLE))) AS BIGINT)"
    " + CASE WHEN (CAST(FLOOR(SQRT(CAST(c AS DOUBLE))) AS BIGINT) + 1)"
    "           * (CAST(FLOOR(SQRT(CAST(c AS DOUBLE))) AS BIGINT) + 1) <= c"
    "        THEN 1 ELSE 0 END"
    " - CASE WHEN CAST(FLOOR(SQRT(CAST(c AS DOUBLE))) AS BIGINT)"
    "           * CAST(FLOOR(SQRT(CAST(c AS DOUBLE))) AS BIGINT) > c"
    "        THEN 1 ELSE 0 END)"
)

ORACLE_SQL["docs_curation_report"] = rf"""
    WITH keep AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
    ), k AS (
        SELECT d.* FROM documents d JOIN keep USING (doc_id)
    ), w AS (
        SELECT doc_id, source, text,
               list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws
        FROM k
    ), bgr AS (
        SELECT DISTINCT array_to_string(list_slice(w2.ws, i, i + 4), ' ') AS sh
        FROM (
            SELECT list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws
            FROM documents WHERE doc_id % 50 = 0
        ) w2, LATERAL (SELECT UNNEST(range(1, len(w2.ws) - 3)) AS i) t
    ), contam AS (
        SELECT DISTINCT w.doc_id
        FROM w, LATERAL (SELECT UNNEST(range(1, len(w.ws) - 3)) AS i) t
        WHERE w.doc_id % 50 <> 0
          AND array_to_string(list_slice(w.ws, i, i + 4), ' ') IN (SELECT sh FROM bgr)
    ), tri AS (
        SELECT doc_id, COUNT(*) AS n_tri, COUNT(DISTINCT g) AS n_dis FROM (
            SELECT w.doc_id, array_to_string(list_slice(w.ws, i, i + 2), ' ') AS g
            FROM w, LATERAL (SELECT UNNEST(range(1, len(w.ws) - 1)) AS i) u
        ) GROUP BY doc_id
    ), flags AS (
        SELECT w.doc_id, w.source, w.text,
               (w.doc_id % 50 = 0) AS is_bench,
               (w.doc_id % 50 <> 0
                AND w.doc_id IN (SELECT doc_id FROM contam)) AS contaminated,
               (CASE WHEN COALESCE(t.n_tri, 0) = 0 THEN TRUE
                     WHEN 1000 * (t.n_tri - t.n_dis) // t.n_tri >= 200 THEN TRUE
                     WHEN t.n_tri + 2 < 5 THEN TRUE
                     ELSE FALSE END) AS lowq
        FROM w LEFT JOIN tri t USING (doc_id)
    ), clean AS (
        SELECT doc_id, source, text FROM flags
        WHERE NOT is_bench AND NOT contaminated AND NOT lowq
    ), tot AS (
        SELECT source, CAST(SUM(length(text)) AS BIGINT) AS c
        FROM clean GROUP BY source
    ), wgt AS (
        SELECT source, c, {_ISQRT} AS w FROM tot
    ), plan AS (
        SELECT source,
               LEAST(1000, (1000 * (SELECT SUM(c) // 2 FROM tot) * w)
                           // ((SELECT SUM(w) FROM wgt) * c)) AS rate
        FROM wgt
    ), exported AS (
        SELECT cl.doc_id FROM clean cl JOIN plan p USING (source)
        WHERE ((cl.doc_id % 2147483648) * 2654435761 + 42) % 4294967296
              * 1000 < p.rate * 4294967296
    )
    SELECT (SELECT COUNT(*) FROM documents) AS n_input,
           (SELECT COUNT(*) FROM k) AS after_dedup,
           CAST((SELECT COUNT(*) FROM flags WHERE is_bench) AS BIGINT)
               AS bench_held_out,
           CAST((SELECT COUNT(*) FROM flags WHERE contaminated) AS BIGINT)
               AS contaminated_dropped,
           CAST((SELECT COUNT(*) FROM flags
                 WHERE lowq AND NOT is_bench AND NOT contaminated) AS BIGINT)
               AS lowqual_dropped,
           (SELECT COUNT(*) FROM clean) AS after_filters,
           (SELECT COUNT(*) FROM exported) AS exported
"""
QUERIES["docs_curation_report"] = docs_curation_report
