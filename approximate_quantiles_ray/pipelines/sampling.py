"""Deterministic distributed sampling operators (Ray Data).

A 100 TB training-data pipeline samples constantly — subset selection,
per-source mixture weighting, eval holdouts, quick profiles. The
operators here are built on one primitive that is *stateless,
coordination-free and replayable*: a 32-bit multiplicative hash of the
row's stable id. That gives three properties a `random()`-based sample
can't offer at scale:

- **embarrassingly parallel** — every block decides membership locally
  with pure int64 arithmetic (no RNG state, no seed-per-worker
  bookkeeping, no shuffle);
- **replayable / resumable** — a re-run (or a retried task) selects the
  EXACT same rows, so a failed sampling job can resume per partition;
- **oracle-able** — the same arithmetic runs in ANSI SQL, so the sample
  is bit-verifiable (the driver's hash gate) rather than only
  statistically testable.

Primitives:

- :func:`hash32` — ``h(id) = ((id mod 2^31)·2654435761 + seed) mod
  2^32`` (Knuth multiplicative hashing; the ``mod 2^31`` pre-reduction
  keeps the int64 product overflow-free in BOTH numpy and SQL BIGINT).
- :func:`bernoulli_mask` — keep iff ``h·1000 < rate_permille·2^32``:
  an unbiased per-row coin with exactly reproducible membership.
- bottom-k by hash (``docs_sample_bottomk``) — the k smallest hash
  values form a uniform random k-subset WITHOUT coordination: this is
  the mergeable equivalent of reservoir sampling (order statistics of
  a uniform hash), combining as a trivial per-block top-k partial +
  driver merge of #blocks × k rows.

Reference relationship: the reference library (/root/reference, Rust
sketches) has no sampling surface; these are the extension operators
the task brief mandates for training-data pipelines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from approximate_quantiles_ray.sources.read import read_parquet_sized

KNUTH = 2654435761  # 2^32 / golden ratio, Knuth multiplicative constant
MOD32 = 1 << 32
MOD31 = 1 << 31


def hash32(ids: np.ndarray, seed: int = 42) -> np.ndarray:
    """Deterministic 32-bit mix of an int64 id column (vectorized).

    ``((id mod 2^31) * KNUTH + seed) mod 2^32`` — every intermediate
    fits int64 (2^31·KNUTH ≈ 5.7e18 < 2^63), so DuckDB BIGINT computes
    the identical value and the sample is SQL-verifiable.
    """
    ids = ids.astype(np.int64, copy=False)
    return ((ids % MOD31) * KNUTH + seed) % MOD32


def bernoulli_mask(ids: np.ndarray, rate_permille: np.ndarray | int, seed: int = 42) -> np.ndarray:
    """Keep-mask for a rate_permille/1000 hash-Bernoulli sample.

    ``rate_permille`` may be a scalar or a per-row array (stratified
    rates). Comparison is exact integer math: ``h·1000 <
    rate·2^32``.
    """
    h = hash32(ids, seed)
    rate = np.asarray(rate_permille, dtype=np.int64)
    return h * 1000 < rate * MOD32


def docs_stratified_sample(sf_dir: str, seed: int = 42) -> pd.DataFrame:
    """STRATIFIED HASH SAMPLE (oracle-matched): per-source Bernoulli
    rates — source ``srcN`` keeps ``((N mod 4)+1)·10``% of its docs —
    then per-source sample aggregates (rows kept, chars kept).

    This is the mixture-weighting pass of a training-data pipeline
    (downsample over-represented crawls, keep rare sources whole). The
    whole stage is one streaming ``map_batches``: membership is local
    integer arithmetic per block (zero shuffle, zero state), the
    per-source rollup is the usual per-block Arrow partial + adaptive
    fold. Membership replays identically across retries/resumes and is
    bit-verified against the same arithmetic in SQL.
    """
    from approximate_quantiles_ray.engine.folds import adaptive_grouped_agg

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )

    def block_sample(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        src_num = pc.cast(pc.utf8_slice_codeunits(tbl.column("source"), 3, 32), pa.int64())
        rates = (
            src_num.combine_chunks().to_numpy(zero_copy_only=False) % 4 + 1
        ) * 100  # permille
        kept = tbl.append_column("rate_permille", pa.array(rates, pa.int64())).filter(
            pa.array(bernoulli_mask(ids, rates, seed))
        )
        agg = kept.group_by(["source", "rate_permille"]).aggregate(
            [([], "count_all"), ("n_chars", "sum")]
        )
        return agg.rename_columns(["source", "rate_permille", "n_kept", "chars_kept"])

    part = ds.map_batches(block_sample, batch_format="pyarrow", zero_copy_batch=True)
    out = adaptive_grouped_agg(
        part, ["source", "rate_permille"], {"n_kept": "sum", "chars_kept": "sum"}
    )
    return out.sort_values("source").reset_index(drop=True)


def docs_sample_bottomk(sf_dir: str, k: int = 16, seed: int = 42) -> pd.DataFrame:
    """BOTTOM-K-BY-HASH UNIFORM SAMPLE (oracle-matched): the k docs
    with the smallest ``hash32(doc_id)`` — a coordination-free uniform
    k-subset (the distributed replacement for reservoir sampling:
    order statistics of a uniform hash are a uniform sample, and
    bottom-k sets MERGE by just keeping the k smallest again).

    Scale shape: per-block bottom-k partials (numpy argpartition) →
    driver merges #blocks × k candidate rows — never a sort of the
    corpus, never more than k rows per block on the wire. Deterministic
    tie-break (h asc, doc_id asc) keeps it hash-stable.
    """
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def block_bottomk(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        h = hash32(ids, seed)
        # the block cut must use the GLOBAL tie order (h asc, doc_id
        # asc) — an argpartition cut breaks h-ties arbitrarily and can
        # drop the doc the global order keeps
        idx = np.lexsort((ids, h))[:k]
        return pa.table(
            {"doc_id": pa.array(ids[idx], pa.int64()), "h": pa.array(h[idx], pa.int64())}
        )

    cand = ds.map_batches(block_bottomk, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return (
        cand.sort_values(["h", "doc_id"]).head(k).reset_index(drop=True)[["doc_id", "h"]]
    )


def docs_sample_weighted(sf_dir: str, k: int = 16, seed: int = 7) -> pd.DataFrame:
    """PRIORITY SAMPLING (oracle-matched; Duffield–Lund–Thorup): keep
    the k docs with the smallest priority ``h(id) / w`` where the
    weight w is the doc's char count — a weighted-without-replacement
    sample that favors long documents, mergeable exactly like the
    uniform bottom-k (order statistics again; partials combine by
    re-taking the k smallest).

    Hash-stability: the priority is ONE IEEE double division of two
    exactly-representable int64s — numpy and DuckDB produce the
    bit-identical double, so even the float column passes the value
    hash (the same trick the lang-ID oracle uses; a pow/log-based
    Efraimidis–Spirtes key would NOT be safe — libm differs across
    vectorized implementations).

    Scale shape: identical to ``docs_sample_bottomk`` — per-block
    bottom-k partials, #blocks × k rows to the driver, no shuffle.
    """
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])

    def block_bottomk(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        w = tbl.column("n_chars").combine_chunks().to_numpy(zero_copy_only=False)
        pri = hash32(ids, seed).astype(np.float64) / w
        # lexsort cut: h/w ratios collide more readily than raw hashes,
        # and the block cut must respect the global (pri, doc_id) order
        idx = np.lexsort((ids, pri))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[idx], pa.int64()),
                "n_chars": pa.array(w[idx]),
                "pri": pa.array(pri[idx], pa.float64()),
            }
        )

    cand = ds.map_batches(block_bottomk, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = cand.sort_values(["pri", "doc_id"]).head(k).reset_index(drop=True)
    out["n_chars"] = out["n_chars"].astype(np.int64)
    return out[["doc_id", "n_chars", "pri"]]


_H_SQL = f"((doc_id % {MOD31}) * {KNUTH} + 42) % {MOD32}"
_H7_SQL = f"((doc_id % {MOD31}) * {KNUTH} + 7) % {MOD32}"

ORACLE_SQL = {
    "docs_stratified_sample": f"""
        SELECT source, rate_permille, COUNT(*) AS n_kept,
               CAST(SUM(n_chars) AS BIGINT) AS chars_kept
        FROM (
            SELECT source, n_chars,
                   (CAST(SUBSTR(source, 4) AS BIGINT) % 4 + 1) * 100 AS rate_permille,
                   {_H_SQL} AS h
            FROM documents
        ) WHERE h * 1000 < rate_permille * {MOD32}
        GROUP BY source, rate_permille ORDER BY source
    """,
    "docs_sample_bottomk": f"""
        SELECT doc_id, {_H_SQL} AS h
        FROM documents ORDER BY h ASC, doc_id ASC LIMIT 16
    """,
    "docs_sample_per_source": f"""
        SELECT source, doc_id, h FROM (
            SELECT source, doc_id, {_H_SQL} AS h,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY {_H_SQL}, doc_id) AS rn
            FROM documents)
        WHERE rn <= 4 ORDER BY source, h, doc_id
    """,
    "docs_sample_weighted": f"""
        SELECT doc_id, n_chars,
               CAST({_H7_SQL} AS DOUBLE) / n_chars AS pri
        FROM documents ORDER BY pri ASC, doc_id ASC LIMIT 16
    """,
}

QUERIES = {
    "docs_sample_weighted": docs_sample_weighted,
    "docs_stratified_sample": docs_stratified_sample,
    "docs_sample_bottomk": docs_sample_bottomk,
}


def docs_sample_per_source(sf_dir: str, k: int = 4, seed: int = 42) -> pd.DataFrame:
    """PER-STRATUM BOTTOM-K SAMPLE (oracle-matched): the k
    smallest-hash docs WITHIN EACH source — a fixed-size deterministic
    sample per stratum (eval sets, per-source spot checks), where the
    global bottom-k would starve small sources.

    Same mergeable order-statistics scheme as the uniform bottom-k,
    grouped: per-block per-source bottom-k partials (lexsort cut in
    the global (h, doc_id) tie order) → the driver keeps each source's
    k smallest of #blocks × k candidates.
    """
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])

    def block_bottomk(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        src = tbl.column("source").combine_chunks().to_numpy(zero_copy_only=False)
        h = hash32(ids, seed)
        order = np.lexsort((ids, h, src))  # group by source, then (h, id)
        src_s = src[order]
        first = np.concatenate([[True], src_s[1:] != src_s[:-1]])
        # rank within source run = position − run start
        starts = np.flatnonzero(first)
        runs = np.diff(np.append(starts, len(src_s)))
        rank = np.arange(len(src_s)) - np.repeat(starts, runs)
        keep = order[rank < k]
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "source": pa.array(src[keep], pa.string()),
                "h": pa.array(h[keep], pa.int64()),
            }
        )

    cand = ds.map_batches(block_bottomk, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = (
        cand.sort_values(["source", "h", "doc_id"])
        .groupby("source", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    return out[["source", "doc_id", "h"]].sort_values(
        ["source", "h", "doc_id"]
    ).reset_index(drop=True)

QUERIES["docs_sample_per_source"] = docs_sample_per_source


def docs_mixing_plan(sf_dir: str, seed: int = 42) -> pd.DataFrame:
    """TEMPERATURE-WEIGHTED SOURCE MIXING (oracle-matched): compute a
    √-temperature mixing plan over sources and execute it in the same
    query — the rebalancing pass that keeps over-represented crawls
    from dominating a training mix (weight_s ∝ sqrt(chars_s) flattens
    the source distribution; budget = half the corpus).

    Plan (all exact integer arithmetic, hence the bit-exact SQL twin):
    per-source char totals c_s (one distributed fold), integer sqrt
    weights w_s = isqrt(c_s), keep-rate_s = min(1000, 1000·B·w_s //
    (W·c_s)) permille with B = Σc//2, W = Σw — computed with PYTHON
    ints on the ≤#sources-row driver plan, so no int64 overflow even
    at 100 TB char counts — then one streaming pass applies the
    per-source hash-Bernoulli mask (``bernoulli_mask``, replayable,
    SQL-verifiable) and folds per-source kept counts. Two passes over
    a column-pruned 3-column read; the only exchanged rows are
    per-block per-source partials.
    """
    import math

    from approximate_quantiles_ray.engine.folds import adaptive_grouped_agg

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )

    def block_totals(tbl: pa.Table) -> pa.Table:
        agg = tbl.group_by(["source"]).aggregate([("n_chars", "sum")])
        return agg.rename_columns(["source", "c"])

    totals = adaptive_grouped_agg(
        ds.map_batches(block_totals, batch_format="pyarrow", zero_copy_batch=True),
        ["source"], {"c": "sum"},
    )
    # driver plan: ≤ #sources rows, exact arbitrary-precision ints
    srcs = totals["source"].tolist()
    cs = [int(x) for x in totals["c"].tolist()]
    ws = [math.isqrt(c) for c in cs]
    B, W = sum(cs) // 2, sum(ws)
    rates = {
        s: min(1000, (1000 * B * w) // (W * c)) if c else 0
        for s, c, w in zip(srcs, cs, ws)
    }

    def block_apply(tbl: pa.Table) -> pa.Table:
        src = tbl.column("source").combine_chunks().to_numpy(zero_copy_only=False)
        ids = tbl.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        rate = pd.Series(src).map(rates).to_numpy(np.int64)
        kept = tbl.filter(pa.array(bernoulli_mask(ids, rate, seed)))
        agg = kept.group_by(["source"]).aggregate([([], "count_all"), ("n_chars", "sum")])
        return agg.rename_columns(["source", "n_kept", "chars_kept"])

    kept = adaptive_grouped_agg(
        ds.map_batches(block_apply, batch_format="pyarrow", zero_copy_batch=True),
        ["source"], {"n_kept": "sum", "chars_kept": "sum"},
    )
    plan = pd.DataFrame(
        {
            "source": srcs,
            "chars_total": np.array(cs, np.int64),
            "weight": np.array(ws, np.int64),
            "rate_permille": np.array([rates[s] for s in srcs], np.int64),
        }
    )
    out = plan.merge(kept, on="source", how="left")
    out["n_kept"] = out["n_kept"].fillna(0).astype(np.int64)
    out["chars_kept"] = out["chars_kept"].fillna(0).astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)


# isqrt in SQL: FLOOR(SQRT(double)) corrected by ±1 so it is exact
# integer sqrt even where the double rounds across a perfect square
_SQL_ISQRT = (
    "(CAST(FLOOR(SQRT(CAST(c AS DOUBLE))) AS BIGINT)"
    " + CASE WHEN (CAST(FLOOR(SQRT(CAST(c AS DOUBLE))) AS BIGINT) + 1)"
    "           * (CAST(FLOOR(SQRT(CAST(c AS DOUBLE))) AS BIGINT) + 1) <= c"
    "        THEN 1 ELSE 0 END"
    " - CASE WHEN CAST(FLOOR(SQRT(CAST(c AS DOUBLE))) AS BIGINT)"
    "           * CAST(FLOOR(SQRT(CAST(c AS DOUBLE))) AS BIGINT) > c"
    "        THEN 1 ELSE 0 END)"
)

ORACLE_SQL["docs_mixing_plan"] = f"""
    WITH tot AS (
        SELECT source, CAST(SUM(n_chars) AS BIGINT) AS c
        FROM documents GROUP BY source
    ), w AS (
        SELECT source, c, {_SQL_ISQRT} AS w FROM tot
    ), plan AS (
        SELECT source, c, w,
               LEAST(1000, (1000 * (SELECT SUM(c) // 2 FROM tot) * w)
                           // ((SELECT SUM(w) FROM w) * c)) AS rate
        FROM w
    )
    SELECT p.source,
           p.c AS chars_total,
           p.w AS weight,
           CAST(p.rate AS BIGINT) AS rate_permille,
           CAST(COUNT(d.doc_id) FILTER (
               WHERE ((d.doc_id % 2147483648) * 2654435761 + 42) % 4294967296
                     * 1000 < p.rate * 4294967296) AS BIGINT) AS n_kept,
           CAST(COALESCE(SUM(d.n_chars) FILTER (
               WHERE ((d.doc_id % 2147483648) * 2654435761 + 42) % 4294967296
                     * 1000 < p.rate * 4294967296), 0) AS BIGINT) AS chars_kept
    FROM plan p JOIN documents d USING (source)
    GROUP BY p.source, p.c, p.w, p.rate ORDER BY p.source
"""
QUERIES["docs_mixing_plan"] = docs_mixing_plan
