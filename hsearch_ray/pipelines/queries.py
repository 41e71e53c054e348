"""Named queries over the driver's parquet tables + their DuckDB oracles.

Every entry in QUERIES is a callable ``(sf_dir) -> Dataset | DataFrame |
pyarrow.Table``; ORACLE_SQL holds the ANSI-SQL equivalent for the
driver's side-by-side check (row count + schema + order-insensitive
value hash).  Column names are kept identical in both implementations.

Float discipline (value-hash safety): per-row IEEE float ops (a single
product, a single division of ints, a round) are bit-identical between
NumPy and DuckDB; ORDER-SENSITIVE float reductions are not.  So every
aggregated money value is converted to integer cents PER ROW before
summing, and similarity scores are rounded before ranking.

Non-SQL-expressible pipelines (MinHash LSH, SimHash, containment,
bucketed ANN) have no oracle entry -> driver records rows-only checks;
their correctness gate is the pytest oracle vs reference_impl.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from hsearch_ray.config import PipelineConfig
from hsearch_ray.stages import textstats
from hsearch_ray.stages.agg import (default_num_partitions, distinct_rows,
                                    grouped_agg)

# ---------------------------------------------------------------- helpers


def _read(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _texthash_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized 64-bit whole-text hash (polars utf8 hash — the
    line-dedup kernel's discipline): grouping by hash stands in for
    grouping by text under the negligible-collision argument, so the
    oracle groups by the text itself."""
    import polars as pl

    df = df.copy()
    df["h"] = (
        pl.from_pandas(df["text"]).hash(seed=42).to_numpy().view(np.int64)
    )
    return df


def _cents(x: pd.Series | np.ndarray) -> np.ndarray:
    # floor(x*100 + 0.5): identical IEEE ops in NumPy and DuckDB, immune to
    # the half-even (numpy) vs half-away (duckdb) round() divergence
    return np.floor(np.asarray(x) * 100 + 0.5).astype(np.int64)


# ---------------------------------------------------------------- dedup family


def q_exact_dedup_docs(sf_dir: str):
    """Exact dedup survivors (D1): keep min doc_id per distinct text."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    hashed = ds.map_batches(_texthash_batch, batch_format="pandas", batch_size=4096)
    out = grouped_agg(hashed, ["h"], {"doc_id": ["min"]}, count_alias="n_copies")
    return pd.DataFrame(
        {"doc_id": out["doc_id__min"].astype("int64"),
         "n_copies": out["n_copies"].astype("int64")}
    )


def q_exact_dup_pairs_docs(sf_dir: str):
    """All (a,b) doc pairs with byte-identical text, a<b (D1 pair form).
    Only hashes with count > 1 reach the driver (O(dups), the
    exact_dedup broadcast discipline); membership ships ONCE via
    ray.put + sorted-array searchsorted (not a closure re-pickled per
    task), and pair expansion runs DISTRIBUTED per dup-hash group
    (vectorized triu inside map_groups) — no driver pandas."""
    from hsearch_ray.stages.agg import grouped_agg_ds
    from hsearch_ray.stages.verify import _in_sorted

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    hashed = ds.map_batches(_texthash_batch, batch_format="pandas",
                            batch_size=4096).materialize()
    stats = grouped_agg_ds(hashed, ["h"], {}, count_alias="n")
    dup_df = stats.filter(expr="n > 1").select_columns(["h"]).to_pandas()
    # an empty Dataset's to_pandas drops the schema entirely
    dup_h = np.sort(dup_df["h"].to_numpy(dtype=np.int64)) \
        if "h" in dup_df.columns else np.empty(0, np.int64)
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})
    if dup_h.size == 0:
        return empty  # pa.Table keeps the (a, b) schema; an empty
        # Dataset's to_pandas would drop it
    dup_ref = ray.put(dup_h)

    def _member(batch: pa.Table) -> pa.Table:
        h = batch["h"].to_numpy(zero_copy_only=False)
        keep = _in_sorted(ray.get(dup_ref), h)
        return batch.select(["h", "doc_id"]).filter(pa.array(keep))

    def _pairs(group: pa.Table) -> pa.Table:
        ids = np.sort(group["doc_id"].to_numpy(zero_copy_only=False))
        if ids.size < 2:
            return empty
        ii, jj = np.triu_indices(ids.size, k=1)
        return pa.table({"a": pa.array(ids[ii], pa.int64()),
                         "b": pa.array(ids[jj], pa.int64())})

    return (
        hashed.map_batches(_member, batch_format="pyarrow")
        .groupby("h")
        .map_groups(_pairs, batch_format="pyarrow")
    )


def _docs_as_corpus(sf_dir: str, filter_expr: str | None = None):
    """documents -> north-rule corpus shape with file_id := doc_id."""
    def adapt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "repo": pa.array([f"src/{s}" for s in batch["source"].to_pylist()], pa.string()),
                "path": pa.array([f"doc/{int(d)}.txt" for d in batch["doc_id"].to_pylist()], pa.string()),
                "commit": pa.array(["head"] * n, pa.string()),
                "lang": batch["lang"].cast(pa.string()),
                "content": batch["text"].cast(pa.string()),
                "file_id": batch["doc_id"].cast(pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents")
    if filter_expr is not None:
        ds = ds.filter(expr=filter_expr)
    return ds.map_batches(adapt, batch_format="pyarrow")


# One pipeline run shared by the five flagship-derived queries: results
# are deterministic per (sf_dir, default config), so the driver's gate —
# which calls them all — pays for the pipeline once per process.
_DEDUP_CACHE: dict = {}


def _dedup_result(sf_dir: str):
    res = _DEDUP_CACHE.get(sf_dir)
    if res is None:
        from hsearch_ray.pipelines.dedup import dedup_pipeline

        res = _DEDUP_CACHE[sf_dir] = dedup_pipeline(
            _docs_as_corpus(sf_dir), PipelineConfig()
        )
    return res


def q_near_dup_clusters_docs(sf_dir: str):
    """Flagship: full MinHash-LSH near-dup pipeline; (doc_id, cluster_id)."""
    res = _dedup_result(sf_dir)
    return res.clusters.rename_columns(["doc_id", "cluster_id"])


def q_near_dup_pairs_docs(sf_dir: str):
    """Verified near-dup pairs (a, b, jaccard rounded to 6)."""
    res = _dedup_result(sf_dir)

    def round_j(batch: pa.Table) -> pa.Table:
        j = np.round(batch["jaccard"].to_numpy(zero_copy_only=False), 6)
        return batch.set_column(batch.schema.get_field_index("jaccard"), "jaccard",
                                pa.array(j, pa.float64()))

    return res.pairs.map_batches(round_j, batch_format="pyarrow")


def q_simhash_docs(sf_dir: str):
    """(doc_id, simhash) 64-bit fingerprints (M5/F4 analog)."""
    from hsearch_ray.stages.normalize import normalize
    from hsearch_ray.stages.signatures import sign

    cfg = PipelineConfig()
    sigs = sign(normalize(_docs_as_corpus(sf_dir)), cfg, with_simhash=True)
    return sigs.select_columns(["file_id", "simhash"]).rename_columns(["doc_id", "simhash"])


def q_containment_pairs_docs(sf_dir: str):
    """Near-containment pairs via winnowing fingerprints (J5/O1 analog)."""
    from hsearch_ray.stages.containment import containment_pairs
    from hsearch_ray.stages.normalize import normalize
    from hsearch_ray.stages.signatures import sign

    # denser fingerprints than the pipeline default: the oracle compares
    # against ALL pairs with containment >= thr, including scattered
    # (non-contiguous) overlap that a sparse winnow can miss
    cfg = PipelineConfig(winnow_window=8, containment_min_common=2)
    corpus = normalize(_docs_as_corpus(sf_dir)).materialize()
    sigs = sign(corpus, cfg, with_fingerprints=True)
    pairs = containment_pairs(sigs, corpus, cfg)

    def round_c(batch: pa.Table) -> pa.Table:
        c = np.round(batch["containment"].to_numpy(zero_copy_only=False), 6)
        return batch.set_column(
            batch.schema.get_field_index("containment"), "containment",
            pa.array(c, pa.float64()),
        )

    return pairs.map_batches(round_c, batch_format="pyarrow")


def q_lsh_bucket_histogram(sf_dir: str):
    """LSH bucket-size histogram (A4 skew telemetry): (members, n_buckets)."""
    from hsearch_ray.stages.lsh import band_explode, bucket_stats
    from hsearch_ray.stages.normalize import normalize
    from hsearch_ray.stages.signatures import sign

    cfg = PipelineConfig()
    banded = band_explode(sign(normalize(_docs_as_corpus(sf_dir)), cfg), cfg)
    stats = bucket_stats(banded)
    hist = stats.groupby("members", as_index=False).agg(n_buckets=("members", "size"))
    hist["members"] = hist["members"].astype("int64")
    hist["n_buckets"] = hist["n_buckets"].astype("int64")
    return hist


# ---------------------------------------------------------------- text analysis


def q_token_count_docs(sf_dir: str):
    return textstats.token_counts(_read(sf_dir, "documents", columns=["doc_id", "text"]))


def q_quality_docs(sf_dir: str):
    return textstats.quality_stats(_read(sf_dir, "documents", columns=["doc_id", "text"]))


def q_stopword_docs(sf_dir: str):
    """Stopword-ratio quality signal (the third leg of the
    length/punct/stopword quality triple): token-exact membership in a
    fixed lowercase stopword list."""
    return textstats.stopword_stats(
        _read(sf_dir, "documents", columns=["doc_id", "text"])
    )


def q_bpe_token_count_docs(sf_dir: str):
    """Token budget under a GPT-2-style BPE pre-tokenizer regex —
    whitespace counting underestimates BPE sequence length; this is the
    estimate a training pipeline actually plans capacity with."""
    return textstats.bpe_token_counts(
        _read(sf_dir, "documents", columns=["doc_id", "text"])
    )


def q_langid_docs(sf_dir: str):
    return textstats.langid(_read(sf_dir, "documents", columns=["doc_id", "text"]))


def q_lang_count_docs(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])
    out = grouped_agg(ds, ["lang"], {"n_chars": ["sum"]}, count_alias="n_docs")
    return pd.DataFrame(
        {"lang": out["lang"], "n_docs": out["n_docs"].astype("int64"),
         "sum_chars": out["n_chars__sum"].astype("int64")}
    )


# ---------------------------------------------------------------- relational coverage


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1-style grouped aggregate (A1/A2/A10 analog); money in cents."""
    ds = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "l_linestatus": df["l_linestatus"],
                "qty_c": _cents(df["l_quantity"]),
                "base_c": _cents(df["l_extendedprice"]),
                "disc_c": _cents(df["l_extendedprice"] * (1 - df["l_discount"])),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pandas", batch_size=65536)
    out = grouped_agg(
        prepped, ["l_returnflag", "l_linestatus"],
        {"qty_c": ["sum"], "base_c": ["sum"], "disc_c": ["sum"]},
        count_alias="count_order",
    )
    return out.rename(
        columns={"qty_c__sum": "sum_qty_c", "base_c__sum": "sum_base_c",
                 "disc_c__sum": "sum_disc_c"}
    )


def q_orders_by_nation(sf_dir: str):
    """Broadcast-join (J2): orders ⋈ customer ⋈ nation, grouped.  The
    small sides are broadcast once as sorted numpy arrays (zero-copy on
    ray.get) and probed with vectorized searchsorted — stateless warm
    tasks, no actor pool to respawn per execution."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    ck = cust["c_custkey"].to_numpy(dtype=np.int64)
    order = np.argsort(ck, kind="stable")
    ck = ck[order]
    cn = cust["c_nationkey"].to_numpy(dtype=np.int64)[order]
    nname = nat.sort_values("n_nationkey")["n_name"].to_numpy()
    nkeys = nat.sort_values("n_nationkey")["n_nationkey"].to_numpy(dtype=np.int64)
    ref = ray.put((ck, cn, nkeys, nname))

    def _attach(df: pd.DataFrame, ref=ref) -> pd.DataFrame:
        ck, cn, nkeys, nname = ray.get(ref)
        if ck.size == 0 or nkeys.size == 0:  # empty dimension: no matches
            return pd.DataFrame({"nation": pd.Series(dtype=object),
                                 "price_c": pd.Series(dtype="int64")})
        ok = df["o_custkey"].to_numpy(dtype=np.int64)
        # clamped membership probe (the _in_sorted pattern): an o_custkey
        # absent from customer must DROP, not silently take a neighbor
        pos = np.minimum(np.searchsorted(ck, ok), ck.size - 1)
        hit = ck[pos] == ok
        nk = cn[pos[hit]]
        npos = np.minimum(np.searchsorted(nkeys, nk), nkeys.size - 1)
        nhit = nkeys[npos] == nk
        return pd.DataFrame(
            {
                "nation": nname[npos[nhit]],
                "price_c": _cents(df["o_totalprice"])[hit][nhit],
            }
        )

    attached = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
        _attach, batch_format="pandas", batch_size=65536
    )
    out = grouped_agg(attached, ["nation"], {"price_c": ["sum"]}, count_alias="n_orders")
    return pd.DataFrame(
        {"nation": out["nation"], "n_orders": out["n_orders"].astype("int64"),
         "total_c": out["price_c__sum"].astype("int64")}
    )


def q_top_orders(sf_dir: str):
    """Top-k by value (O3 analog): 10 priciest orders, deterministic ties."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"o_orderkey": df["o_orderkey"], "price_c": _cents(df["o_totalprice"])})

    return (
        ds.map_batches(prep, batch_format="pandas")
        .sort(["price_c", "o_orderkey"], descending=[True, False])
        .limit(10)
    )


def q_distinct_segments(sf_dir: str):
    """Distinct values (D5 analog)."""
    return distinct_rows(_read(sf_dir, "customer", columns=["c_mktsegment"]), ["c_mktsegment"])


def q_filter_agg_events(sf_dir: str):
    """Filter + grouped count + distinct-count (M10 + A1)."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id", "value"])
    filtered = ds.filter(expr="value >= 10").materialize()
    counts = grouped_agg(filtered, ["event_type"], {}, count_alias="n")
    uniq = distinct_rows(filtered, ["event_type", "user_id"])
    n_users = (
        uniq.groupby("event_type", as_index=False)
        .agg(n_users=("user_id", "nunique"))
    )
    out = counts.merge(n_users, on="event_type")
    out["n"] = out["n"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out


def q_events_by_day(sf_dir: str):
    """Time bucketing: events per (day, type)."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"day": df["ts"].dt.strftime("%Y-%m-%d"), "event_type": df["event_type"]}
        )

    prepped = ds.map_batches(prep, batch_format="pandas")
    out = grouped_agg(prepped, ["day", "event_type"], {}, count_alias="n")
    out["n"] = out["n"].astype("int64")
    return out


def q_supplier_part_stats(sf_dir: str):
    """Min/Max/Sum grouped stats over part (A10 analog)."""
    ds = _read(sf_dir, "part", columns=["p_brand", "p_size", "p_retailprice"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "p_brand": df["p_brand"],
                "p_size": df["p_size"].astype("int64"),
                "price_c": _cents(df["p_retailprice"]),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pandas")
    out = grouped_agg(
        prepped, ["p_brand"], {"p_size": ["min", "max"], "price_c": ["sum"]},
        count_alias="n",
    )
    return out.rename(
        columns={"p_size__min": "min_size", "p_size__max": "max_size",
                 "price_c__sum": "sum_price_c"}
    )


def _explode_lines(batch: pa.Table) -> pa.Table:
    """Vectorized 1->N line explosion: Arrow's split kernel gives the
    list<string> column whose offsets drive doc_id repeat and per-doc
    line numbering — no per-row Python (the explode_fingerprints
    buffer discipline applied to strings)."""
    import pyarrow.compute as pc

    doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    lists = pc.split_pattern(batch["text"], pattern="\n")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offsets)
    total = int(offsets[-1] - offsets[0])
    line_no = (np.arange(total, dtype=np.int64)
               - np.repeat(offsets[:-1] - offsets[0], lens) + 1)
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(doc, lens), pa.int64()),
            "line_no": pa.array(line_no, pa.int64()),
            "line": lists.flatten().cast(pa.string()),
        }
    )


def q_explode_lines_docs(sf_dir: str):
    """1->N row explosion (M8 flat_map analog): one row per line of text."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(_explode_lines, batch_format="pyarrow",
                          batch_size=2048)


def q_user_first_event(sf_dir: str):
    """Best-match semi-join analog (J4): per user, earliest event ts + count."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": df["user_id"],
             "ts_s": df["ts"].astype("datetime64[us]").astype("int64") // 1_000_000}
        )

    out = grouped_agg(
        ds.map_batches(prep, batch_format="pandas"), ["user_id"],
        {"ts_s": ["min"]}, count_alias="n_events",
    )
    return pd.DataFrame(
        {"user_id": out["user_id"].astype("int64"),
         "first_ts_s": out["ts_s__min"].astype("int64"),
         "n_events": out["n_events"].astype("int64")}
    )


def q_corpus_stats_docs(sf_dir: str):
    """Corpus stats (A10): count + total/max/min content length."""
    ds = _read(sf_dir, "documents", columns=["n_chars"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["g"] = 0
        return df

    out = grouped_agg(
        ds.map_batches(prep, batch_format="pandas"), ["g"],
        {"n_chars": ["sum", "min", "max"]}, count_alias="n_docs",
    )
    return pd.DataFrame(
        {
            "n_docs": out["n_docs"].astype("int64"),
            "total_chars": out["n_chars__sum"].astype("int64"),
            "min_chars": out["n_chars__min"].astype("int64"),
            "max_chars": out["n_chars__max"].astype("int64"),
        }
    )


def exact_order_stat_distributed(ds, value_col: str = "value",
                                 kfn=None,
                                 max_fetch: int = 500_000, nbins: int = 4096,
                                 max_rounds: int = 8) -> float:
    """Exact order statistic (A6 analog — median, p90, any quantile)
    WITHOUT materializing the column on the driver: (1) distributed
    min/max/count partials, (2) distributed histogram partials locate
    the bin(s) holding the wanted order statistics, RECURSING on those
    bins while they still hold more than ``max_fetch`` rows (a skewed
    distribution can put ~all rows in one bin — each round narrows by
    ~nbins regardless), (3) only the final, driver-sized range is
    fetched for the exact finish.  Only histogram partials (nbins
    rows/batch) and the final range ever reach the driver.

    ``kfn(n) -> (k1, k2)`` maps the row count to the two 0-indexed order
    statistics to average (k1 == k2 for a single element); the default
    is the median pair ((n-1)//2, n//2).  Returns nan on empty input."""

    def _mmc(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value_col_"].to_numpy(dtype=np.float64)
        if v.size == 0:
            return pd.DataFrame({"lo": [], "hi": [], "n": []})
        return pd.DataFrame({"lo": [v.min()], "hi": [v.max()], "n": [v.size]})

    named = ds.map_batches(
        lambda df: pd.DataFrame({"value_col_": df[value_col]}),
        batch_format="pandas", batch_size=65536,
    ).materialize()
    mmc = named.map_batches(_mmc, batch_format="pandas", batch_size=65536).to_pandas()
    if mmc.empty:
        return float("nan")
    lo, hi, n = float(mmc["lo"].min()), float(mmc["hi"].max()), int(mmc["n"].sum())
    if n == 0:
        return float("nan")
    k1, k2 = kfn(n) if kfn is not None else ((n - 1) // 2, n // 2)
    # chained bin predicates from previous rounds: a row is in the
    # current range iff EVERY (plo, pwidth, pb1, pb2) filter admits it —
    # re-applying the exact bin formula sidesteps float-boundary drift
    filters: list[tuple[float, float, int, int]] = []

    def _in_range(v: np.ndarray) -> np.ndarray:
        m = np.ones(v.size, dtype=bool)
        for plo, pw, pb1, pb2 in filters:
            b = np.minimum(((v - plo) / pw).astype(np.int64), nbins - 1)
            m &= (b >= pb1) & (b <= pb2)
        return m

    below = 0
    for _ in range(max_rounds):
        if lo == hi:
            return round(lo, 6)
        width = (hi - lo) / nbins
        if not np.isfinite(width) or width <= 0:
            break

        def _hist(df: pd.DataFrame, lo=lo, width=width) -> pd.DataFrame:
            v = df["value_col_"].to_numpy(dtype=np.float64)
            v = v[_in_range(v)]
            b = np.minimum(((v - lo) / width).astype(np.int64), nbins - 1)
            idx, cnt = np.unique(b, return_counts=True)
            return pd.DataFrame({"bin": idx, "cnt": cnt})

        hist = named.map_batches(_hist, batch_format="pandas",
                                 batch_size=65536).to_pandas()
        counts = np.zeros(nbins, dtype=np.int64)
        np.add.at(counts, hist["bin"].to_numpy(dtype=np.int64),
                  hist["cnt"].to_numpy(dtype=np.int64))
        cum = np.cumsum(counts)
        b1 = int(np.searchsorted(cum, k1 + 1 - below))
        b2 = int(np.searchsorted(cum, k2 + 1 - below))
        in_mid = int(cum[b2] - (cum[b1 - 1] if b1 > 0 else 0))
        filters.append((lo, width, b1, b2))
        below += int(cum[b1 - 1]) if b1 > 0 else 0
        lo, hi = lo + b1 * width, (hi if b2 == nbins - 1
                                   else lo + (b2 + 1) * width)
        if in_mid <= max_fetch:
            break

    def _keep(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value_col_"].to_numpy(dtype=np.float64)
        return df[_in_range(v)]

    mid = named.map_batches(_keep, batch_format="pandas",
                            batch_size=65536).to_pandas()
    v = np.sort(mid["value_col_"].to_numpy(dtype=np.float64))
    m1, m2 = v[k1 - below], v[k2 - below]
    return round(float((m1 + m2) / 2.0), 6)


def exact_median_distributed(ds, value_col: str = "value",
                             max_fetch: int = 500_000, nbins: int = 4096,
                             max_rounds: int = 8) -> float:
    """Exact median: the (k1, k2) = ((n-1)//2, n//2) order-stat pair."""
    return exact_order_stat_distributed(
        ds, value_col, kfn=None, max_fetch=max_fetch, nbins=nbins,
        max_rounds=max_rounds,
    )


def exact_order_stat_by_group(ds, group_col: str, value_col: str,
                              kfn=None, max_fetch: int = 500_000,
                              nbins: int = 4096,
                              max_rounds: int = 8) -> pd.DataFrame:
    """Per-GROUP exact order statistic (A6 grouped — median/p90 per
    key) with ONE shared histogram pass per round for ALL groups: every
    batch bins its values with per-group (lo, width) arrays indexed by
    a vectorized group-id lookup, so round cost is independent of group
    count.  Assumption (documented contract): the NUMBER of groups is
    driver-sized — per-group scalars (lo/hi/k/below) live on the
    driver; the per-group value multisets are unbounded and stay in the
    cluster until each group's mid range shrinks under ``max_fetch``.
    Bin membership is decided by re-applying each round's exact
    (lo, width, b1, b2) formula — the scalar machinery's float-boundary
    discipline — never by a drifting lo<=v<=hi compare."""
    named = ds.map_batches(
        lambda df, g=group_col, v=value_col: pd.DataFrame(
            {"g_": df[g], "v_": df[v].astype(np.float64)}
        ),
        batch_format="pandas", batch_size=65536,
    ).materialize()

    def _mmc(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("g_", as_index=False, sort=False).agg(
            lo=("v_", "min"), hi=("v_", "max"), n=("v_", "size")
        )

    stats = named.map_batches(_mmc, batch_format="pandas",
                              batch_size=65536).to_pandas()
    if stats.empty:
        return pd.DataFrame({group_col: pd.Series(dtype=object),
                             "stat_value": pd.Series(dtype=np.float64)})
    stats = stats.groupby("g_", as_index=False).agg(
        lo=("lo", "min"), hi=("hi", "max"), n=("n", "sum")
    ).sort_values("g_").reset_index(drop=True)
    gkeys = stats["g_"].to_numpy()
    gindex = pd.Index(gkeys)
    G = len(gkeys)
    lo = stats["lo"].to_numpy(dtype=np.float64).copy()
    hi = stats["hi"].to_numpy(dtype=np.float64).copy()
    n = stats["n"].to_numpy(dtype=np.int64)
    ks = np.array([kfn(int(m)) if kfn is not None
                   else ((int(m) - 1) // 2, int(m) // 2) for m in n],
                  dtype=np.int64)
    k1, k2 = ks[:, 0].copy(), ks[:, 1].copy()
    below = np.zeros(G, dtype=np.int64)
    result = np.full(G, np.nan)
    resolved = np.zeros(G, dtype=bool)   # result known, no fetch needed
    fetchable = np.zeros(G, dtype=bool)  # mid range small: go to fetch
    # per-round filter arrays: (plo, pwidth, pb1, pb2, participated)
    filters: list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray,
                        np.ndarray]] = []

    def _apply_filters(gid: np.ndarray, v: np.ndarray) -> np.ndarray:
        m = np.ones(v.size, dtype=bool)
        for plo, pw, pb1, pb2, part in filters:
            rel = part[gid] & m
            if not rel.any():
                continue
            gi = gid[rel]
            b = np.minimum(((v[rel] - plo[gi]) / pw[gi]).astype(np.int64),
                           nbins - 1)
            ok = (b >= pb1[gi]) & (b <= pb2[gi])
            mm = m[rel]
            mm &= ok
            m[rel] = mm
        return m

    for _ in range(max_rounds):
        just = ~resolved & ~fetchable & (lo == hi)
        result[just] = np.round(lo[just], 6)
        resolved |= just
        active = ~resolved & ~fetchable
        width = np.where(active, (hi - lo) / nbins, np.nan)
        bad = active & (~np.isfinite(width) | (width <= 0))
        fetchable |= bad
        active &= ~bad
        if not active.any():
            break
        ref = ray.put((lo.copy(), width.copy(), active.copy(), gkeys))

        def _hist(df: pd.DataFrame, ref=ref) -> pd.DataFrame:
            lo_, w_, act_, gk_ = ray.get(ref)
            gid = pd.Index(gk_).get_indexer(df["g_"].to_numpy())
            v = df["v_"].to_numpy(dtype=np.float64)
            keep = (gid >= 0) & act_[gid]
            gid, v = gid[keep], v[keep]
            m = _apply_filters(gid, v)
            gid, v = gid[m], v[m]
            if v.size == 0:
                return pd.DataFrame({"key": pd.Series(dtype=np.int64),
                                     "cnt": pd.Series(dtype=np.int64)})
            b = np.minimum(((v - lo_[gid]) / w_[gid]).astype(np.int64),
                           nbins - 1)
            key, cnt = np.unique(gid * np.int64(nbins) + b,
                                 return_counts=True)
            return pd.DataFrame({"key": key, "cnt": cnt})

        hist = named.map_batches(_hist, batch_format="pandas",
                                 batch_size=65536).to_pandas()
        counts = np.zeros(G * nbins, dtype=np.int64)
        if len(hist):
            np.add.at(counts, hist["key"].to_numpy(dtype=np.int64),
                      hist["cnt"].to_numpy(dtype=np.int64))
        counts = counts.reshape(G, nbins)
        part = active.copy()
        pb1 = np.zeros(G, dtype=np.int64)
        pb2 = np.full(G, nbins - 1, dtype=np.int64)
        plo, pw = lo.copy(), np.where(np.isfinite(width), width, 1.0)
        for g in np.flatnonzero(active):
            cum = np.cumsum(counts[g])
            b1 = int(np.searchsorted(cum, k1[g] + 1 - below[g]))
            b2 = int(np.searchsorted(cum, k2[g] + 1 - below[g]))
            in_mid = int(cum[b2] - (cum[b1 - 1] if b1 > 0 else 0))
            pb1[g], pb2[g] = b1, b2
            below[g] += int(cum[b1 - 1]) if b1 > 0 else 0
            lo[g] = plo[g] + b1 * width[g]
            if b2 != nbins - 1:
                hi[g] = plo[g] + (b2 + 1) * width[g]
            if in_mid <= max_fetch:
                fetchable[g] = True
        filters.append((plo, pw, pb1, pb2, part))

    fetchable |= ~resolved  # rounds exhausted: fetch whatever remains
    fetchable &= ~resolved
    if fetchable.any():
        ref = ray.put((fetchable.copy(), gkeys))

        def _keep(df: pd.DataFrame, ref=ref) -> pd.DataFrame:
            fet_, gk_ = ray.get(ref)
            gid = pd.Index(gk_).get_indexer(df["g_"].to_numpy())
            v = df["v_"].to_numpy(dtype=np.float64)
            keep = (gid >= 0) & fet_[gid]
            gid, v = gid[keep], v[keep]
            m = _apply_filters(gid, v)
            return pd.DataFrame({"gid": gid[m], "v": v[m]})

        mid = named.map_batches(_keep, batch_format="pandas",
                                batch_size=65536).to_pandas()
        order = np.lexsort((mid["v"].to_numpy(), mid["gid"].to_numpy()))
        gid_s = mid["gid"].to_numpy()[order]
        v_s = mid["v"].to_numpy()[order]
        starts = np.searchsorted(gid_s, np.arange(G))
        for g in np.flatnonzero(fetchable):
            s = starts[g]
            m1 = v_s[s + k1[g] - below[g]]
            m2 = v_s[s + k2[g] - below[g]]
            result[g] = round(float((m1 + m2) / 2.0), 6)
            resolved[g] = True
    return pd.DataFrame({group_col: gkeys, "stat_value": result})


def q_median_value_by_type(sf_dir: str):
    """Exact per-group median (grouped A6): one shared distributed
    histogram recursion resolves ALL event types together — round cost
    is one pass over the events table regardless of how many groups
    exist, and nothing O(rows) ever reaches the driver."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    out = exact_order_stat_by_group(ds, "event_type", "value")
    return out.rename(columns={"stat_value": "median_value"})


def q_median_event_value(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["value"])
    return pd.DataFrame({"median_value": [exact_median_distributed(ds, "value")]})


def q_p90_event_value(sf_dir: str):
    """Exact p90 (A6 generalized to any order statistic): the element at
    0-index 9*(n-1)//10 of the sorted column — pure integer index math,
    so the oracle (ORDER BY + OFFSET with the same integer expression)
    is float-ambiguity-free.  Same distributed histogram recursion as
    the median; nothing O(corpus) reaches the driver."""
    ds = _read(sf_dir, "events", columns=["value"])
    v = exact_order_stat_distributed(
        ds, "value", kfn=lambda n: ((9 * (n - 1)) // 10,) * 2
    )
    return pd.DataFrame({"p90_value": [v]})


def q_cluster_stats_docs(sf_dir: str):
    """Per-cluster stats over the near-dup clustering (A2/S9 analog):
    cluster size distribution."""
    res = _dedup_result(sf_dir)
    cl = grouped_agg(res.clusters, ["cluster_id"], {"file_id": ["min"]},
                     count_alias="size")
    hist = cl.groupby("size", as_index=False).agg(n_clusters=("size", "size"))
    return hist.astype("int64")


def q_sample_events(sf_dir: str):
    """Seeded fixed-size random sample (O6/O8 analog), done DETERMINISTICALLY:
    the 100 events smallest under a seeded multiplicative id-hash order
    (tie-break event_id makes the order total).  Unlike the engine's
    ``random_shuffle(seed=...)`` (seeded but block-layout-dependent), this is
    exactly reproducible across runs, engines and parallelism levels — so it
    carries a DuckDB oracle.  Scale shape: a vectorized hash + per-block
    top-100 (argpartition) inside ``map_batches``, then a final sort+limit
    over the ≤100-row block survivors — no global shuffle of the input."""
    ds = _read(sf_dir, "events", columns=["event_id"])

    def local_top(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = ((eid.astype(np.uint64) * np.uint64(_SAMPLE_MULT2))
             % np.uint64(1 << 32)).astype(np.int64)
        if eid.size > 100:
            keep = np.argpartition(h, 100)[:100]
            eid, h = eid[keep], h[keep]
        return pa.table({"event_id": pa.array(eid, pa.int64()),
                         "h": pa.array(h, pa.int64())})

    top = ds.map_batches(local_top, batch_format="pyarrow") \
        .sort(["h", "event_id"]).limit(100)
    return top.select_columns(["event_id"])


def q_recall_eval_docs(sf_dir: str):
    """Recall evaluator as a first-class query (A8/A9 analog — the
    reference runs its evaluator after every search,
    motif_both_points.cpp:383-386, with per-distance-bin accuracy
    tp/fn histograms at 100-165).  truth = brute-force exact-Jaccard
    pairs >= thr among exact-dedup reps (the noLSH oracle, O(n^2) by
    design); found = the LSH pipeline's pairs.  Output: one row per
    jaccard decile bin with tp/fn counts."""
    import ray.data

    from hsearch_ray.stages.exact_dedup import exact_dedup
    from hsearch_ray.stages.normalize import normalize
    from hsearch_ray.stages.verify import Verifier, build_store

    cfg = PipelineConfig()
    corpus = _docs_as_corpus(sf_dir)
    res = _dedup_result(sf_dir)
    found = res.pairs.to_pandas()
    found_set = set(zip(found["a"].astype(np.int64), found["b"].astype(np.int64)))

    # brute-force truth among reps: ALL pairs, exact verify (distributed)
    norm = normalize(corpus).materialize()
    _, kept, _ = exact_dedup(norm)
    rep_ids = np.sort(
        kept.select_columns(["file_id"]).to_pandas()["file_id"].to_numpy(dtype=np.int64)
    )
    ii, jj = np.triu_indices(rep_ids.size, k=1)
    all_pairs = ray.data.from_arrow(
        pa.table({"a": pa.array(rep_ids[ii], pa.int64()),
                  "b": pa.array(rep_ids[jj], pa.int64())})
    )
    store_ref = build_store(norm, rep_ids, cfg)

    def _truth_task(batch: pa.Table) -> pa.Table:
        return Verifier(cfg, store_ref)(batch)

    truth = all_pairs.map_batches(
        _truth_task, batch_format="pyarrow", batch_size=cfg.verify_batch_size
    ).to_pandas()
    # exact-dup pairs (j = 1.0) belong to the truth set too
    exact = found[found["method"] == "exact"]
    truth = pd.concat([truth[["a", "b", "jaccard"]], exact[["a", "b", "jaccard"]]])
    tp = np.zeros(11, dtype=np.int64)
    fn = np.zeros(11, dtype=np.int64)
    for a, b, j in zip(truth["a"].astype(np.int64), truth["b"].astype(np.int64),
                       truth["jaccard"]):
        b10 = int(np.floor(np.round(j, 6) * 10))
        if (a, b) in found_set:
            tp[b10] += 1
        else:
            fn[b10] += 1
    bins = np.nonzero(tp + fn)[0]
    return pd.DataFrame({"bin": bins.astype(np.int64),
                         "tp": tp[bins], "fn": fn[bins]})


def q_cluster_radius_docs(sf_dir: str):
    """Cluster radius (A3 analog, hclust.cpp:216-222: max member distance
    to center): per non-singleton cluster, radius = max(1 - jaccard)
    over its verified pair edges, rounded to 6."""
    res = _dedup_result(sf_dir)
    pairs = res.pairs.to_pandas()
    if pairs.empty:
        return pd.DataFrame({"cluster_id": pd.Series(dtype="int64"),
                             "radius": pd.Series(dtype="float64")})
    # a pair's endpoints share a cluster by construction; pairs are the
    # dup set (small), so the driver groupby here matches the scale
    # argument that makes the root map broadcast-safe
    keys = res.clusters.to_pandas()
    km = keys.set_index("file_id")["cluster_id"]
    cid = pairs["a"].map(km).astype(np.int64)
    # round j BEFORE the subtraction — mirrors the oracle expression
    dist = 1.0 - np.round(pairs["jaccard"].to_numpy(dtype=np.float64), 6)
    out = (
        pd.DataFrame({"cluster_id": cid, "dist": dist})
        .groupby("cluster_id", as_index=False)
        .agg(radius=("dist", "max"))
    )
    out["radius"] = np.round(out["radius"], 6)
    return out


def q_tsv_lang_count_docs(sf_dir: str):
    """TSV reader + stats (S5 analog, NOGCOG.cpp:36-56: parse TSV,
    aggregate): export documents to TSV once, read it back with
    ray.data.read_csv, aggregate per lang.  The oracle recomputes from
    the parquet table — equality proves the TSV round trip."""
    import csv
    import os

    import ray.data

    # cache keyed by the parquet's content identity (mtime+size), not just
    # the sf_dir basename — regenerated testdata at the same path must not
    # silently reuse a stale TSV export
    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    tag = f"{os.path.basename(sf_dir.rstrip('/'))}_{st.st_mtime_ns}_{st.st_size}"
    tsv_dir = f"/tmp/graft_tsv_{tag}"
    marker = tsv_dir + "/.done"
    if not os.path.exists(marker):
        os.makedirs(tsv_dir, exist_ok=True)
        pdf = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"]).to_pandas()
        pdf.to_csv(tsv_dir + "/docs.tsv", sep="\t", index=False,
                   quoting=csv.QUOTE_MINIMAL)
        with open(marker, "w") as f:
            f.write("ok")
    from pyarrow import csv as pacsv

    ds = ray.data.read_csv(
        tsv_dir + "/docs.tsv",
        parse_options=pacsv.ParseOptions(delimiter="\t"),
    )
    out = grouped_agg(ds, ["lang"], {"n_chars": ["sum"]}, count_alias="n_docs")
    return pd.DataFrame(
        {"lang": out["lang"], "n_docs": out["n_docs"].astype("int64"),
         "sum_chars": out["n_chars__sum"].astype("int64")}
    )


def q_jsonl_token_count_docs(sf_dir: str):
    """JSONL source round-trip (S5's second wire format — raw
    pretraining corpora arrive as JSON-lines shards): export documents
    to JSONL once (cache keyed by the parquet's content identity, the
    TSV reader's discipline), read it back with the validating
    ``sources.read_jsonl``, and recompute per-doc char AND token counts
    from the round-tripped text.  The oracle recomputes from the
    PARQUET table, so equality proves text survives JSON escaping,
    quoting and unicode intact — a mangled quote or lost codepoint
    breaks the char count, collapsed whitespace breaks the token
    count."""
    import os

    from hsearch_ray.sources import read_jsonl, write_jsonl

    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    tag = f"{os.path.basename(sf_dir.rstrip('/'))}_{st.st_mtime_ns}_{st.st_size}"
    jdir = f"/tmp/graft_jsonl_{tag}"
    marker = jdir + "/.done"
    if not os.path.exists(marker):
        os.makedirs(jdir, exist_ok=True)
        write_jsonl(_read(sf_dir, "documents", columns=["doc_id", "text"]), jdir)
        with open(marker, "w") as f:
            f.write("ok")

    ds = read_jsonl(f"{jdir}/", required=("doc_id", "text"),
                    int_cols=("doc_id",))

    def _counts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_chars_rt": df["text"].str.len().astype("int64"),
            "n_tokens": df["text"].str.count(r"\S+").astype("int64"),
        })

    return ds.map_batches(_counts, batch_format="pandas", batch_size=4096)


# ---------------------------------------------------------------- similarity search


def _load_queries(sf_dir: str, n: int = 10) -> dict[int, np.ndarray]:
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vid = tbl["vec_id"].to_numpy(zero_copy_only=False)
    mask = vid < n
    emb = tbl["embedding"].combine_chunks()
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.chunk(0)
    dim = len(emb[0])
    flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(-1, dim)
    return {int(v): flat[i] for i, v in enumerate(vid) if mask[i]}


def q_simhash_dup_pairs_docs(sf_dir: str):
    """SimHash near-dup pairs over documents: hamming(simhash) <= 3 via
    4-chunk blocking (pigeonhole recall = 1; brute-force-equality is the
    pytest gate — bit-level hashing is not SQL-expressible, rows-only
    driver check)."""
    from hsearch_ray.stages.lsh import simhash_dup_pairs
    from hsearch_ray.stages.normalize import normalize
    from hsearch_ray.stages.signatures import sign

    cfg = PipelineConfig()
    sigs = sign(normalize(_docs_as_corpus(sf_dir)), cfg, with_simhash=True)
    # cap=None keeps the docstring's exhaustive pigeonhole-recall-1
    # contract — the benchmark corpora are tiny; production corpora with
    # boilerplate-hot 16-bit chunks should use the default finite cap
    return simhash_dup_pairs(sigs.select_columns(["file_id", "simhash"]),
                             cap=None)


def q_embedding_dup_pairs(sf_dir: str):
    """Embedding-cosine near-dup pairs (a, b) with cosine >= 0.45 — the
    dedup use of the similarity search path.  0.45 is a demonstration
    threshold: the synthetic embeddings are near-random (max pairwise
    cosine ~0.51), so a production-style 0.9 would be vacuous here."""
    from hsearch_ray.stages.ann import cosine_dup_pairs

    emb = _read(sf_dir, "embeddings")
    return cosine_dup_pairs(emb, threshold=0.45)


def q_embedding_dup_pairs_lsh(sf_dir: str):
    """Scale-arm embedding-cosine dedup at a PRODUCTION threshold (0.8):
    L-table hyperplane-band candidates + exact cosine verify of
    candidates only (ann.cosine_dup_pairs_lsh) — the 100-TB path, where
    the exact S(S+1)/2 block-pair grid would be O(n²).  Approximate by
    design (rows-only driver check); precision is 1.0 by construction
    (exact verify) and recall vs the exact grid at the same threshold is
    pinned by a planted-dup pytest.  The synthetic embeddings are
    near-random (max background cosine ~0.51), so the high threshold is
    exactly where this arm is meant to operate — an EMPTY result on this
    testdata is the correct answer (no pair reaches 0.8); the pytest's
    planted dups are where the arm's recall is actually measured."""
    from hsearch_ray.stages.ann import cosine_dup_pairs_lsh

    emb = _read(sf_dir, "embeddings")
    df = cosine_dup_pairs_lsh(emb, threshold=0.8).to_pandas()
    if df.empty:  # 0-row Dataset -> pandas loses the schema; pin it
        df = pd.DataFrame({"a": pd.Series(dtype="int64"),
                           "b": pd.Series(dtype="int64")})
    return df


def q_semantic_dup_pairs(sf_dir: str):
    """SemDeDup-style semantic dedup (ann.semantic_dup_pairs): k-means
    coarse clusters + exact within-cluster cosine at the production
    threshold 0.8 — the embedding-dedup shape that replaces the O(n²)
    grid when corpus size rules it out.  Approximate by design
    (cluster-boundary pairs are the only misses; rows-only driver
    check): precision 1.0 by construction, recall vs the exact grid
    pinned by a planted-dup pytest.  On this near-random testdata an
    EMPTY result is the correct answer (max background cosine ~0.51)."""
    from hsearch_ray.stages.ann import semantic_dup_pairs

    emb = _read(sf_dir, "embeddings")
    df = semantic_dup_pairs(emb, threshold=0.8, nlist=16).to_pandas()
    if df.empty:  # 0-row Dataset -> pandas loses the schema; pin it
        df = pd.DataFrame({"a": pd.Series(dtype="int64"),
                           "b": pd.Series(dtype="int64")})
    return df


def q_ann_topk(sf_dir: str):
    """Exact brute-force cosine top-5 for query vectors vec_id<10 (J2)."""
    from hsearch_ray.stages.ann import brute_force_topk

    emb = _read(sf_dir, "embeddings")
    return brute_force_topk(emb, _load_queries(sf_dir), k=5)


def q_ann_topk_lsh(sf_dir: str):
    """Bucketed (random-hyperplane) approximate top-5 — scale path, rows-only."""
    from hsearch_ray.stages.ann import lsh_topk

    emb = _read(sf_dir, "embeddings")
    return lsh_topk(emb, _load_queries(sf_dir), k=5)


def q_ann_topk_pq(sf_dir: str):
    """Product-quantization approximate top-5 (ADC table scan + exact
    re-rank through the sharded vector store) — the MEMORY-bounded
    scale arm: m uint8 codes per vector instead of d floats.
    Rows-only; recall vs brute pinned by pytest."""
    from hsearch_ray.stages.ann import pq_topk

    emb = _read(sf_dir, "embeddings")
    return pq_topk(emb, _load_queries(sf_dir), k=5)


def q_ann_topk_ivf(sf_dir: str):
    """IVF approximate top-5 (distributed k-means coarse quantizer +
    probed-cell scan) — rows-only; recall vs brute pinned by pytest."""
    from hsearch_ray.stages.ann import ivf_topk

    emb = _read(sf_dir, "embeddings")
    return ivf_topk(emb, _load_queries(sf_dir), k=5)


# ---------------------------------------------------------------- registry

def q_session_stats(sf_dir: str):
    """Gap-based session windows over the event stream (the windowed-
    aggregate operator Ray Data lacks natively; stages/events.py): one
    row per (user, session) with start/count/value-sum.  Oracle: the
    LAG/SUM window-function formulation in DuckDB."""
    from hsearch_ray.stages.events import sessionize

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"])
    return sessionize(ds, gap_sec=3600)


def q_purchase_attribution(sf_dir: str):
    """As-of join (stages/events.py): every purchase matched to the
    most recent strictly-prior click by the same user.  Oracle: the
    MAX-prior-ts join in DuckDB."""
    from hsearch_ray.stages.events import asof_prior_event

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])
    return asof_prior_event(ds, left_type="purchase", right_type="click")


def q_top_tokens_docs(sf_dir: str):
    """Corpus vocabulary top-k — the high-cardinality-key shuffle
    pattern: per-batch vectorized token counts (the combiner), a fully
    distributed grouped sum over the token key (grouped_agg_ds — the
    vocabulary never lands on the driver), then a distributed
    (n desc, token) sort + limit.  Ties at the cut break by token, so
    the top-20 set is deterministic and hash-comparable."""
    from hsearch_ray.stages.agg import grouped_agg_ds

    ds = _read(sf_dir, "documents", columns=["text"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.findall(r"\S+").explode().dropna()
        vc = toks.value_counts()
        return pd.DataFrame(
            {"token": vc.index.astype(str),
             "cnt": vc.to_numpy(dtype=np.int64)}
        )

    partials = ds.map_batches(prep, batch_format="pandas", batch_size=2048)
    vocab = grouped_agg_ds(partials, ["token"], {"cnt": ["sum"]})
    projected = vocab.map_batches(
        lambda df: pd.DataFrame(
            {"token": df["token"], "n": df["cnt__sum"].astype(np.int64)}
        ),
        batch_format="pandas",
    )
    return projected.sort(["n", "token"], descending=[True, False]).limit(20)


def q_frequent_tokens_docs(sf_dir: str):
    """Heavy hitters (all tokens with global count > N/512) WITHOUT a
    vocabulary-sized shuffle — the sketch-then-rescue pattern: pass 1
    keeps, per block, only tokens with block count > block_size/512
    plus one block-total meta row (the Misra–Gries pigeonhole
    guarantee: a token with global count > N/512 must exceed n_b/512 in
    SOME block, so the union of per-block survivors is a provable
    candidate SUPERSET; the streaming MG sketch is the constant-memory
    variant — with the Arrow block already in heap the exact per-block
    count is cheaper and gives the same superset).  The O(blocks × 512)
    candidate table reaches the driver; pass 2 re-counts ONLY the
    broadcast candidates exactly and applies the exact threshold —
    so the final answer is exact, the oracle is plain GROUP BY/HAVING,
    and the full vocabulary never shuffles (contrast
    ``top_tokens_docs``, the fully-shuffled exact top-k)."""
    k = 512
    ds = _read(sf_dir, "documents", columns=["text"])

    def survivors(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.findall(r"\S+").explode().dropna()
        vc = toks.value_counts()
        n_b = int(vc.sum())
        keep = vc[vc > n_b / k]
        # meta row: "" is unreachable as a \S+ token, carries the block size
        return pd.DataFrame({
            "token": np.concatenate([keep.index.astype(str), [""]]),
            "cnt": np.concatenate([keep.to_numpy(dtype=np.int64), [n_b]]),
        })

    marks = ds.map_batches(survivors, batch_format="pandas",
                           batch_size=2048).to_pandas()
    total = int(marks.loc[marks["token"] == "", "cnt"].sum())
    cand = np.unique(marks.loc[marks["token"] != "", "token"].to_numpy())
    thr = total // k + 1  # count >= thr  <=>  count > total/k (exact)
    ref = ray.put(np.sort(cand))

    def recount(df: pd.DataFrame, ref=ref) -> pd.DataFrame:
        cand_ = ray.get(ref)
        toks = df["text"].str.findall(r"\S+").explode().dropna()
        vc = toks[toks.isin(cand_)].value_counts()
        return pd.DataFrame({"token": vc.index.astype(str),
                             "cnt": vc.to_numpy(dtype=np.int64)})

    from hsearch_ray.stages.agg import grouped_agg_ds

    exact = grouped_agg_ds(
        ds.map_batches(recount, batch_format="pandas", batch_size=2048),
        ["token"], {"cnt": ["sum"]},
    ).to_pandas()
    exact["n"] = exact["cnt__sum"].astype("int64")
    out = exact.loc[exact["n"] >= thr, ["token", "n"]]
    return out.reset_index(drop=True)


def q_top_orders_by_segment(sf_dir: str):
    """Grouped top-k (the per-group limit operator): 3 priciest orders
    per market segment.  Per-block partial top-k (each block emits <= k
    rows per segment it sees — the classic combiner), then a tiny
    driver final over <= k x segments x blocks rows; no global sort.
    Segment attach is the repo-standard broadcast probe (customer is
    genuinely the small side; the hash-join alternative for a big
    dimension is demonstrated by inactive_customers)."""
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"]).to_pandas()
    ck = cust["c_custkey"].to_numpy(dtype=np.int64)
    order = np.argsort(ck, kind="stable")
    ck = ck[order]
    seg = cust["c_mktsegment"].to_numpy()[order]
    ref = ray.put((ck, seg))

    def _partial(df: pd.DataFrame, ref=ref) -> pd.DataFrame:
        ck, seg = ray.get(ref)
        if ck.size == 0:  # empty dimension: no matches
            return pd.DataFrame({"segment": pd.Series(dtype=object),
                                 "o_orderkey": pd.Series(dtype="int64"),
                                 "price_c": pd.Series(dtype="int64")})
        ok = df["o_custkey"].to_numpy(dtype=np.int64)
        pos = np.minimum(np.searchsorted(ck, ok), ck.size - 1)
        hit = ck[pos] == ok
        out = pd.DataFrame(
            {
                "segment": seg[pos[hit]],
                "o_orderkey": df["o_orderkey"].to_numpy(dtype=np.int64)[hit],
                "price_c": _cents(df["o_totalprice"])[hit],
            }
        )
        out = out.sort_values(["price_c", "o_orderkey"],
                              ascending=[False, True])
        return out.groupby("segment", sort=False).head(3)

    partials = _read(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"]
    ).map_batches(_partial, batch_format="pandas", batch_size=65536).to_pandas()
    fin = (
        partials.sort_values(["price_c", "o_orderkey"], ascending=[False, True])
        .groupby("segment", sort=False)
        .head(3)
        .sort_values(["segment", "price_c", "o_orderkey"],
                     ascending=[True, False, True])
        .reset_index(drop=True)
    )
    fin["rnk"] = (fin.groupby("segment").cumcount() + 1).astype("int64")
    return fin[["segment", "o_orderkey", "price_c", "rnk"]]


# Holdout split for the decontamination query: benchmark sets are tiny
# by definition — the broadcast of their shingle set is the scale story.
_DECON_HOLDOUT_MAX_ID = 20
# Decon uses a LONGER shingle than the near-dup pipeline (24 vs 9 chars):
# 9-char shingles flag every train doc (shared boilerplate phrases),
# 24-char overlap means a genuinely copied span — 21/480 docs at sf0.01.
_DECON_K = 24


def q_decontaminate_docs(sf_dir: str):
    """Benchmark decontamination — the train-vs-holdout overlap pass a
    training-data pipeline runs before every release: docs with
    doc_id < 20 are the held-out eval set; every other (train) doc is
    flagged if it shares any k-char shingle with ANY holdout doc.

    Scale shape: the holdout shingle-hash set is small by definition ->
    built once on the driver, ``ray.put`` once, probed per batch with
    one searchsorted over each batch's concatenated unique shingles
    (the batched rolling-hash kernel, stages/signatures.batched_streams).
    Equality with the string-set oracle rests on the same
    hash-collision argument as the shingle CTEs (~1e-13 here).
    Output: (doc_id, n_hits, contaminated) for every train doc."""
    from hsearch_ray.stages.signatures import batched_streams

    k = _DECON_K
    hold_df = (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .filter(expr=f"doc_id < {_DECON_HOLDOUT_MAX_ID}")
        .to_pandas()
    )
    streams = batched_streams(
        pa.chunked_array([pa.array(hold_df["text"], pa.string())]), k
    )
    hold = (
        np.unique(np.concatenate(streams))
        if streams else np.empty(0, np.uint64)
    )
    ref = ray.put(hold)

    def _score(batch: pa.Table, ref=ref) -> pa.Table:
        hold = ray.get(ref)
        uniqs = [np.unique(s) for s in batched_streams(batch["text"], k)]
        sizes = np.array([u.size for u in uniqs], dtype=np.int64)
        offs = np.concatenate([[0], np.cumsum(sizes)])
        allu = (np.concatenate(uniqs) if offs[-1]
                else np.empty(0, np.uint64))
        if hold.size:
            pos = np.minimum(np.searchsorted(hold, allu), hold.size - 1)
            hit = hold[pos] == allu
        else:
            hit = np.zeros(allu.size, dtype=bool)
        c = np.concatenate([[0], np.cumsum(hit)])
        n_hits = (c[offs[1:]] - c[offs[:-1]]).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_hits": pa.array(n_hits, pa.int64()),
                "contaminated": pa.array(n_hits > 0),
            }
        )

    return (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .filter(expr=f"doc_id >= {_DECON_HOLDOUT_MAX_ID}")
        .map_batches(_score, batch_format="pyarrow", batch_size=2048)
    )


# Query-vs-corpus search: every doc_id % _SEARCH_MOD == _SEARCH_REM is a
# "query"; hits are all OTHER docs at exact shingle Jaccard >= threshold.
# 0.06 sits above the synthetic corpus's boilerplate floor (~0.04-0.05)
# and below its planted near-dups (~0.98), so the hit set is non-trivial
# at every sf level.
_SEARCH_MOD = 50
_SEARCH_REM = 7
_SEARCH_THRESHOLD = 0.06


def q_text_search_docs(sf_dir: str):
    """Query-vs-corpus fingerprint search — the reference's core *search*
    loop (a small query set probed against a large corpus, every hit
    above a similarity cutoff reported: kmer_search.cpp's
    lookup-then-exact-check, hash_search.cpp's bucket probe + verify),
    re-expressed as the broadcast-probe shape: with |queries| <<
    |corpus| (hsearch's operating point) the query side ships ONCE and
    the corpus never shuffles.

    Plan: the query docs' sorted-unique shingle-hash sets are packed
    (qids, offsets, values, owner) on the driver and ``ray.put``
    once; the corpus streams through ``map_batches``, each batch doing
    one vectorized rolling-hash pass (signatures.batched_streams) and
    ONE searchsorted of its concatenated unique shingles against the
    global sorted query-shingle array — per-(doc, query) intersection
    counts then fall out of a single ``bincount`` over (doc, owner)
    match keys.  No per-pair Python loop, no per-query rescan.
    Output: (query_id, hit_id, jaccard) for hits >= threshold,
    jaccard rounded to 6 dp (the shingle-CTE oracle mirrors it
    string-side)."""
    from hsearch_ray.stages.signatures import batched_streams

    k = _SHINGLE_K
    thr = _SEARCH_THRESHOLD
    def _pick(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % _SEARCH_MOD == _SEARCH_REM))

    qdf = (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(_pick, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    qsets = [
        np.unique(s)
        for s in batched_streams(
            pa.chunked_array([pa.array(qdf["text"], pa.string())]), k
        )
    ]
    qids = qdf["doc_id"].to_numpy(dtype=np.int64)
    qsizes = np.array([u.size for u in qsets], dtype=np.int64)
    # one global sorted array of every query shingle; `owner` maps each
    # entry back to its query (values shared by multiple queries simply
    # appear once per owner, adjacent after the stable sort)
    qvals = (
        np.concatenate(qsets) if qsets else np.empty(0, np.uint64)
    )
    owner = np.repeat(
        np.arange(len(qsets), dtype=np.int64), qsizes
    )
    order = np.argsort(qvals, kind="stable")
    ref = ray.put((qids, qsizes, qvals[order], owner[order]))
    nq = len(qsets)

    def _probe(batch: pa.Table, ref=ref) -> pa.Table:
        empty = pa.schema(
            [("query_id", pa.int64()), ("hit_id", pa.int64()),
             ("jaccard", pa.float64())]
        ).empty_table()
        if batch.num_rows == 0 or nq == 0:
            return empty
        qids, qsizes, qv, qown = ray.get(ref)
        uniqs = [np.unique(s) for s in batched_streams(batch["text"], k)]
        sizes = np.array([u.size for u in uniqs], dtype=np.int64)
        allu = (
            np.concatenate(uniqs) if uniqs else np.empty(0, np.uint64)
        )
        lo = np.searchsorted(qv, allu, side="left")
        hi = np.searchsorted(qv, allu, side="right")
        lens = hi - lo
        m = lens > 0
        # expand every matched value's [lo, hi) owner range, tag with its
        # doc row, and count (doc, query) co-occurrences in one bincount
        from hsearch_ray.stages.verify import _concat_ranges

        idx = _concat_ranges(lo[m], lens[m])
        doc_of = np.repeat(
            np.arange(batch.num_rows, dtype=np.int64), sizes
        )
        rep_doc = np.repeat(doc_of[m], lens[m])
        counts = np.bincount(
            rep_doc * nq + qown[idx], minlength=batch.num_rows * nq
        ).reshape(batch.num_rows, nq)
        union = sizes[:, None] + qsizes[None, :] - counts
        j = counts / np.maximum(union, 1)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = (j >= thr) & (ids[:, None] != qids[None, :]) & (union > 0)
        di, qi = np.nonzero(keep)
        if di.size == 0:
            return empty
        return pa.table(
            {
                "query_id": pa.array(qids[qi], pa.int64()),
                "hit_id": pa.array(ids[di], pa.int64()),
                "jaccard": pa.array(np.round(j[di, qi], 6), pa.float64()),
            }
        )

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        _probe, batch_format="pyarrow", batch_size=1024
    )


# Price bar for the anti-join: the synthetic orders table covers nearly
# every customer, so "no order at all" is ~empty at every sf; "no order
# above this bar" keeps the query non-trivial (20 rows at sf0.001,
# ~200 at sf0.01) while exercising the identical join plan.
_INACTIVE_PRICE_BAR = 400_000


def q_inactive_customers(sf_dir: str):
    """Anti-join via Ray Data's distributed hash join — the one query
    exercising the genuine shuffle join (every other join in the repo is
    a broadcast probe by design, which assumes a driver-sized small
    side; an anti-join against the distinct-big-orderers set has no
    small side at scale).  Customers with NO order above the price bar:
    distinct big-spenders via grouped_agg_ds (one row per custkey,
    distributed), LEFT-OUTER hash-join customers against it, keep the
    null-matched rows, count by market segment."""
    from hsearch_ray.stages.agg import grouped_agg_ds

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _read(
        sf_dir, "orders", columns=["o_custkey", "o_totalprice"]
    ).filter(expr=f"o_totalprice > {_INACTIVE_PRICE_BAR}")
    orderers = grouped_agg_ds(orders, ["o_custkey"], {}, count_alias="n_o")
    joined = cust.join(
        orderers, join_type="left_outer", num_partitions=8,
        on=("c_custkey",), right_on=("o_custkey",),
    )

    def _unmatched(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["n_o"].isna(), ["c_mktsegment"]]

    inactive = joined.map_batches(_unmatched, batch_format="pandas")
    out = grouped_agg(inactive, ["c_mktsegment"], {}, count_alias="n_inactive")
    out["n_inactive"] = out["n_inactive"].astype("int64")
    return out


def q_hourly_events(sf_dir: str):
    """Tumbling (fixed-width) window aggregate over the event stream —
    the batch-friendly sibling of the gap-based session window: one row
    per (hour bucket, event_type) with count + int-cents value sum.
    Bucketing is pure integer math on epoch-us (no shuffle beyond the
    grouped-sum combine); value follows the repo's int-cents discipline
    so the oracle sum is IEEE-exact."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {
                "hour_bucket": us // 3_600_000_000,
                "event_type": df["event_type"],
                "value_c": _cents(df["value"]),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pandas")
    out = grouped_agg(prepped, ["hour_bucket", "event_type"],
                      {"value_c": ["sum"]}, count_alias="n")
    out = out.rename(columns={"value_c__sum": "sum_value_c"})
    out["n"] = out["n"].astype("int64")
    out["sum_value_c"] = out["sum_value_c"].astype("int64")
    return out


def q_boolean_search_docs(sf_dir: str):
    """Conjunctive (boolean AND) retrieval — every doc containing ALL
    terms of each query, exact whole-token semantics: the boolean
    complement of the ranked `bm25_search_docs` arm, over the SAME
    query set (`_BM25_QUERIES`).  Terms broadcast once (the small side
    by definition); the corpus streams through one vectorized pass: one
    utf8-hash of the batch's tokens, ONE searchsorted against the
    global sorted term-hash array, distinct (doc, term) presence via a
    void-key unique, then per-doc match counts == |terms| select the
    hits.  No per-query rescan, no shuffle.  Output (query_id, doc_id);
    the VALUES-CTE oracle is generated from the same constant
    (list_has_all on the identical \\S+ token list)."""
    from hsearch_ray.stages.setjoin import _unigram_hashes

    import polars as pl

    terms, qid_of, need = [], [], {}
    for qid, ts in _BM25_QUERIES:
        need[qid] = len(ts)
        for t in ts:
            terms.append(t)
            qid_of.append(qid)
    # one slot per term: the searchsorted probe maps a token to ONE
    # slot, so a term shared by two queries would need run expansion
    assert len(set(terms)) == len(terms), "query terms must be distinct"
    th = pl.Series(terms).hash(seed=42).to_numpy().view(np.int64)
    order = np.argsort(th, kind="stable")
    th_sorted = th[order]
    qid_sorted = np.asarray(qid_of, dtype=np.int64)[order]
    need_ref = ray.put(need)

    def _probe(batch: pa.Table) -> pa.Table:
        empty = pa.schema([("query_id", pa.int64()),
                           ("doc_id", pa.int64())]).empty_table()
        if batch.num_rows == 0:
            return empty
        df = batch.select(["doc_id", "text"]).to_pandas()
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        h, lens = _unigram_hashes(df["text"])
        if h.size == 0:
            return empty
        docrep = np.repeat(np.arange(ids.size, dtype=np.int64), lens)
        pos = np.minimum(np.searchsorted(th_sorted, h), th_sorted.size - 1)
        hit = th_sorted[pos] == h
        if not hit.any():
            return empty
        # distinct (doc, term-slot) presence rows
        key = docrep[hit] * np.int64(th_sorted.size) + pos[hit]
        key = np.unique(key)
        d, slot = key // th_sorted.size, key % th_sorted.size
        q = qid_sorted[slot]
        # count matched terms per (doc, query); keep full matches
        dq = np.stack([d, q], axis=1)
        uniq, cnt = np.unique(dq, axis=0, return_counts=True)
        needs = ray.get(need_ref)
        keep = cnt == np.vectorize(needs.get)(uniq[:, 1])
        return pa.table({
            "query_id": pa.array(uniq[keep, 1], pa.int64()),
            "doc_id": pa.array(ids[uniq[keep, 0]], pa.int64()),
        })

    return _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(_probe, batch_format="pyarrow")


def q_minmax_norm_events(sf_dir: str):
    """Per-group min-max feature normalization — the standardization
    pass a feature pipeline runs before training: every event's value
    rescaled to [0, 1e6] ppm within its event_type group.  Two passes,
    both tiny where it matters: a distributed grouped (min, max)
    combine collapses to one row per type (broadcast as a dict — group
    cardinality is the SMALL side by definition), then one stateless
    map over the stream.  All integer (cents in, ppm out), so the
    window-function oracle is hash-exact; a constant group (max = min)
    normalizes to 0 by convention on both sides."""
    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"],
            "value_c": _cents(df["value"]),
        })

    stats = grouped_agg(ds.map_batches(prep, batch_format="pandas"),
                        ["event_type"], {"value_c": ["min", "max"]})
    mn = dict(zip(stats["event_type"], stats["value_c__min"].astype(np.int64)))
    mx = dict(zip(stats["event_type"], stats["value_c__max"].astype(np.int64)))
    mn_ref, mx_ref = ray.put(mn), ray.put(mx)

    def _norm(df: pd.DataFrame) -> pd.DataFrame:
        lo = df["event_type"].map(ray.get(mn_ref)).to_numpy(dtype=np.int64)
        hi = df["event_type"].map(ray.get(mx_ref)).to_numpy(dtype=np.int64)
        vc = _cents(df["value"])
        rng = hi - lo
        norm = np.where(rng > 0, (vc - lo) * 1_000_000 // np.maximum(rng, 1),
                        0)
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "event_type": df["event_type"],
            "norm_ppm": norm.astype(np.int64),
        })

    return ds.map_batches(_norm, batch_format="pandas")


def q_hopping_events(sf_dir: str):
    """Hopping (sliding) window aggregate — size 3 h, hop 1 h: the
    overlapping-window sibling of the tumbling window (a streaming
    engine's HOP/SLIDE).  Each event belongs to exactly size/hop = 3
    windows, so the explode is a constant-factor vectorized tile inside
    ``map_batches`` (never data-dependent, never per-row Python),
    followed by the same distributed grouped combine; edge windows that
    start before the first event are kept (standard partial-window
    semantics).  Int-cents discipline keeps the oracle sum exact."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        b = us // 3_600_000_000
        vc = _cents(df["value"])
        et = df["event_type"].to_numpy()
        return pd.DataFrame({
            "window_start_hour": np.concatenate([b, b - 1, b - 2]),
            "event_type": np.tile(et, 3),
            "value_c": np.tile(vc, 3),
        })

    prepped = ds.map_batches(prep, batch_format="pandas")
    out = grouped_agg(prepped, ["window_start_hour", "event_type"],
                      {"value_c": ["sum"]}, count_alias="n")
    out = out.rename(columns={"value_c__sum": "sum_value_c"})
    out["n"] = out["n"].astype("int64")
    out["sum_value_c"] = out["sum_value_c"].astype("int64")
    return out


# Deterministic-sample knobs: Knuth multiplicative hash (2654435761 =
# floor(2^32/phi), public-domain constant) mod 2^32 against a threshold.
# Unlike random_shuffle sampling (engine-specific — `sample_events` is
# rows-only for that reason) this predicate is a pure row function, so
# the SAME rows are kept by any engine: resumable, join-stable across
# tables, and exactly DuckDB-expressible (HUGEINT product mod 2^32 ==
# uint64 wrapping product mod 2^32 because 2^32 | 2^64).
_SAMPLE_MULT = 2654435761
_SAMPLE_THRESHOLD = 1 << 28  # 2^28 / 2^32 = 1/16 keep rate
# Second (seed-derived) multiplier for the fixed-size sample, kept coprime
# to 2^32 and distinct from _SAMPLE_MULT so the two samples are independent.
_SAMPLE_MULT2 = 2246822519


def q_hash_sample_events(sf_dir: str):
    """Deterministic hash sample (O6/O8 done exactly): keep events whose
    multiplicative id-hash lands under the threshold.  Embarrassingly
    parallel — a vectorized predicate per batch, no shuffle, no state."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def pick(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        h = (eid.astype(np.uint64) * np.uint64(_SAMPLE_MULT)) % np.uint64(1 << 32)
        keep = h < np.uint64(_SAMPLE_THRESHOLD)
        sub = batch.filter(pa.array(keep))
        return pa.table(
            {
                "event_id": sub["event_id"].cast(pa.int64()),
                "user_id": sub["user_id"].cast(pa.int64()),
                "value_c": pa.array(
                    _cents(sub["value"].to_pandas()), pa.int64()
                ),
            }
        )

    return ds.map_batches(pick, batch_format="pyarrow")


# Per-domain document cap: every source keeps at most this many docs.
_CAP_PER_SOURCE = 5


def q_cap_per_source_docs(sf_dir: str):
    """Deterministic per-group cap — the "at most K docs per domain"
    pretraining-mix operator (cap boilerplate-heavy domains without a
    global shuffle): each source keeps the K docs with the smallest
    multiplicative id-hash, a seedless uniform without-replacement
    sample per group that is exactly reproducible across runs AND
    engines (the hash_sample_events hash, expressible in the DuckDB
    oracle as row_number() over the same key).

    Distribution plan: per-block partial top-k per source (each block
    emits <= K rows per source it sees — the grouped-top-k combiner,
    q_top_orders_by_segment's pattern), then a tiny driver final over
    <= K x sources x blocks rows.  No global sort, no shuffle; group
    cardinality never bounds driver memory because only K rows per
    (source, block) survive the map side."""
    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].to_numpy(dtype=np.int64)
        h = ((did.astype(np.uint64) * np.uint64(_SAMPLE_MULT))
             % np.uint64(1 << 32)).astype(np.int64)
        out = pd.DataFrame({"source": df["source"].to_numpy(),
                            "doc_id": did, "h": h})
        out = out.sort_values(["h", "doc_id"])
        return out.groupby("source", sort=False).head(_CAP_PER_SOURCE)

    partials = _read(sf_dir, "documents", columns=["doc_id", "source"]) \
        .map_batches(_partial, batch_format="pandas", batch_size=65536) \
        .to_pandas()
    fin = (
        partials.sort_values(["h", "doc_id"])
        .groupby("source", sort=False)
        .head(_CAP_PER_SOURCE)
        .sort_values(["source", "h", "doc_id"])
        .reset_index(drop=True)
    )
    fin["rnk"] = (fin.groupby("source").cumcount() + 1).astype("int64")
    return fin[["source", "doc_id", "rnk"]]


# Snapshot split for incremental dedup: docs below are the standing
# index, docs at/above are the "new snapshot" probed against it.
_INCR_SPLIT = 300


def q_incremental_dedup_docs(sf_dir: str):
    """Incremental (snapshot-vs-index) near-dup dedup — the op a
    continuously-ingesting pipeline runs on every new batch: flag each
    NEW doc that near-duplicates any doc already in the index.

    The index side's banded signature postings ARE the standing
    checkpointed artifact (pipelines.incremental): the first run over a
    given index corpus writes them via lineage.write_checkpoint; every
    later run loads the parquet checkpoint and never re-signs the index
    (pinned by a sign-call-counter pytest).  Only the new batch pays
    normalize + sign per run.  ONE bucket-key sort over the union emits
    candidates, a cross-side filter keeps index-vs-new pairs, and exact
    Jaccard verification runs on those only.  Within-batch (new-new)
    dups are the flagship's job, deliberately out of scope here.
    Output: one row per new doc with match count, best index match (min
    id among max rounded jaccard) and the rounded best jaccard.
    """
    import hashlib as _hl
    import os as _os
    import tempfile as _tf

    from hsearch_ray.pipelines.incremental import (
        incremental_dedup_pairs,
        per_new_doc_summary,
    )
    from hsearch_ray.stages.normalize import normalize

    cfg = PipelineConfig()
    idx_norm = normalize(
        _docs_as_corpus(sf_dir, f"doc_id < {_INCR_SPLIT}")
    ).materialize()
    new_norm = normalize(
        _docs_as_corpus(sf_dir, f"doc_id >= {_INCR_SPLIT}")
    ).materialize()

    # index identity: source file path + mtime + size (the TSV-cache
    # discipline) — a regenerated documents table invalidates the
    # checkpoint; identical inputs reuse it across driver runs
    st = _os.stat(f"{sf_dir}/documents.parquet")
    tag = f"{sf_dir}:documents:{st.st_mtime_ns}:{st.st_size}:split={_INCR_SPLIT}"
    ckpt = _os.path.join(
        _tf.gettempdir(), "hsearch_ray_incr",
        _hl.sha1(tag.encode()).hexdigest()[:16],
    )

    verified, _ = incremental_dedup_pairs(
        idx_norm, new_norm, _INCR_SPLIT, cfg,
        checkpoint_dir=ckpt, index_tag=tag,
    )
    new_ids = (
        _read(sf_dir, "documents", columns=["doc_id"])
        .filter(expr=f"doc_id >= {_INCR_SPLIT}")
        .to_pandas()
    )
    return per_new_doc_summary(verified.to_pandas(), new_ids)


# Composite-preprocess quality bar (chars) — drops ~30% of the docs
# table, so both branches of the recipe are exercised non-trivially.
_PREPROC_MIN_CHARS = 200


def q_preprocess_corpus_docs(sf_dir: str):
    """The full preprocessing recipe a training-data pipeline runs as
    ONE composition — quality filter -> near-dup dedup -> disposition —
    demonstrating that the engine's stages compose as plain
    Dataset-to-Dataset functions (SURVEY §2.10): every doc gets a
    status ('short' below the quality bar; 'dup' if a non-representative
    member of a near-dup cluster among surviving docs; 'kept') plus its
    cluster representative (-1 for short docs).  The dedup leg is the
    flagship pipeline verbatim, run over the FILTERED corpus (cluster
    structure legitimately differs from the whole-table clustering when
    a bridge doc falls below the bar)."""
    from hsearch_ray.pipelines.dedup import dedup_pipeline
    from hsearch_ray.stages.lsh import _kv_lookup, build_kv_store

    res = dedup_pipeline(
        _docs_as_corpus(sf_dir, f"n_chars >= {_PREPROC_MIN_CHARS}"),
        PipelineConfig(),
    )
    # distributed disposition sink: the (file_id -> cluster_id) map is
    # corpus-sized, so it ships as an id-range-sharded kv store (lazy
    # per-batch shard fetch — the repo's verifier-store discipline), NOT
    # a driver pandas merge / whole-map broadcast; the status logic is
    # one vectorized pass per docs batch
    store_ref = ray.put(build_kv_store(res.clusters, "file_id", "cluster_id"))

    def _disposition(batch: pa.Table) -> pa.Table:
        look = _kv_lookup(store_ref)
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False)
        rep, ok = look.lookup(did)
        short = nch < _PREPROC_MIN_CHARS
        rep_id = np.where(short, -1, np.where(ok, rep, did))
        status = np.where(
            short, "short", np.where(rep_id != did, "dup", "kept")
        )
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "status": pa.array(status, pa.string()),
                "rep_id": pa.array(rep_id, pa.int64()),
            }
        )

    return _read(sf_dir, "documents", columns=["doc_id", "n_chars"]).map_batches(
        _disposition, batch_format="pyarrow", batch_size=65536
    )


def q_revenue_by_nation(sf_dir: str):
    """Revenue per nation (TPC-H Q5/Q10 shape) — the engine's BIG x BIG
    equi-join on the FACT side: lineitem and orders are both
    corpus-scale, so neither may broadcast.  Plan: (1) per-orderkey
    revenue partials — int cents PER ROW (float discipline) summed by a
    vectorized batch groupby, then the distributed grouped combine
    (grouped_agg_ds: the per-orderkey result never lands on the
    driver); (2) Dataset.join hash-shuffles that orderkey-keyed revenue
    against orders' (orderkey -> custkey) projection — both sides
    shuffle, the genuine large-large exchange; (3) per-custkey revenue
    re-combines distributed; (4) only the LAST hop rides the broadcast
    probe (customer -> nation is the classic 10:1-and-then-25-row
    dimension chain), and the 25-row nation rollup is a driver combine
    by construction."""
    from hsearch_ray.stages.agg import grouped_agg_ds

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def _rev_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy(dtype=np.int64),
                "rev_c": _cents(
                    df["l_extendedprice"].to_numpy()
                    * (1.0 - df["l_discount"].to_numpy())
                ),
            }
        )

    per_order = grouped_agg_ds(
        li.map_batches(_rev_rows, batch_format="pandas", batch_size=65536),
        ["l_orderkey"], {"rev_c": ["sum"]},
    )
    okeys = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    num_partitions = default_num_partitions()
    joined = per_order.join(
        okeys, join_type="inner", num_partitions=num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    per_cust = grouped_agg_ds(
        joined.map_batches(
            lambda df: pd.DataFrame(
                {"o_custkey": df["o_custkey"].to_numpy(dtype=np.int64),
                 "rev_c": df["rev_c__sum"].to_numpy(dtype=np.int64)}
            ),
            batch_format="pandas", batch_size=65536,
        ),
        ["o_custkey"], {"rev_c": ["sum"]}, count_alias="n_orders",
    )

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    ck = cust["c_custkey"].to_numpy(dtype=np.int64)
    order = np.argsort(ck, kind="stable")
    ck = ck[order]
    cn = cust["c_nationkey"].to_numpy(dtype=np.int64)[order]
    nsorted = nat.sort_values("n_nationkey")
    nkeys = nsorted["n_nationkey"].to_numpy(dtype=np.int64)
    nname = nsorted["n_name"].to_numpy()
    ref = ray.put((ck, cn, nkeys, nname))

    def _attach(df: pd.DataFrame, ref=ref) -> pd.DataFrame:
        ck, cn, nkeys, nname = ray.get(ref)
        if ck.size == 0 or nkeys.size == 0 or df.empty:
            return pd.DataFrame({"n_name": pd.Series(dtype=object),
                                 "rev_c": pd.Series(dtype="int64"),
                                 "n_orders": pd.Series(dtype="int64")})
        custk = df["o_custkey"].to_numpy(dtype=np.int64)
        pos = np.minimum(np.searchsorted(ck, custk), ck.size - 1)
        hit = ck[pos] == custk
        nk = cn[pos[hit]]
        npos = np.minimum(np.searchsorted(nkeys, nk), nkeys.size - 1)
        nhit = nkeys[npos] == nk
        return pd.DataFrame(
            {
                "n_name": nname[npos[nhit]],
                "rev_c": df["rev_c__sum"].to_numpy(dtype=np.int64)[hit][nhit],
                "n_orders": df["n_orders"].to_numpy(dtype=np.int64)[hit][nhit],
            }
        )

    attached = per_cust.map_batches(_attach, batch_format="pandas",
                                    batch_size=65536)
    out = grouped_agg(attached, ["n_name"],
                      {"rev_c": ["sum"], "n_orders": ["sum"]})
    return pd.DataFrame(
        {
            "n_name": out["n_name"],
            "revenue_cents": out["rev_c__sum"].astype("int64"),
            "n_orders": out["n_orders__sum"].astype("int64"),
        }
    )


def q_customer_order_distribution(sf_dir: str):
    """Orders-per-customer distribution (TPC-H Q13 shape) — the
    LEFT-join-then-double-aggregate pattern without ever materializing
    the join: (1) per-custkey order counts via the distributed grouped
    combine (customer-cardinality result stays a Dataset); (2) the
    histogram of those counts is a second grouped aggregate whose
    result is tiny by construction (distinct order counts); (3) the
    LEFT-join zero bucket needs no row-level join at all — it is
    |customer| minus |custkeys with orders|, two distributed counts.
    At 100 TB this runs two shuffles over combiner-reduced partials;
    the naive plan shuffles the full customer x orders join."""
    from hsearch_ray.stages.agg import grouped_agg_ds

    per_cust = grouped_agg_ds(
        _read(sf_dir, "orders", columns=["o_custkey"]),
        ["o_custkey"], {}, count_alias="c_count",
    ).materialize()
    hist = grouped_agg(
        per_cust.map_batches(
            lambda df: pd.DataFrame(
                {"c_count": df["c_count"].to_numpy(dtype=np.int64)}
            ),
            batch_format="pandas", batch_size=65536,
        ),
        ["c_count"], {}, count_alias="custdist",
    )
    n_total = _read(sf_dir, "customer", columns=["c_custkey"]).count()
    n_zero = n_total - int(per_cust.count())
    out = pd.DataFrame(
        {"c_count": hist["c_count"].astype("int64"),
         "custdist": hist["custdist"].astype("int64")}
    )
    if n_zero > 0:
        out = pd.concat(
            [out, pd.DataFrame({"c_count": [0], "custdist": [n_zero]})],
            ignore_index=True,
        )
    return out


_REP_K = 8          # repetition n-gram width (chars)
_REP_NUM = 1        # flag when n_dup_grams * 10 > n_grams * _REP_NUM
_REP_DEN = 10       # i.e. duplicate-gram fraction > 0.10


def q_repetition_docs(sf_dir: str):
    """Per-doc repetition stats (the Gopher-rules duplicate-n-gram
    signal, Rae et al. 2021 §A1.1): for each doc the total and
    DUPLICATE char-8-gram counts plus a boolean flag at a 10%
    duplicate fraction — the filter a training-data pipeline applies
    before dedup to drop boilerplate/template-heavy docs.

    Kernel is the signing stage's batched discipline (signatures.py
    batched_streams): ONE rolling-hash pass over each batch's
    concatenated Arrow buffer gives every doc's positional gram-hash
    stream; per-doc distinct counts come from one lexsort over
    (doc, hash) across the whole batch — no per-row Python.  Distinct
    hashed grams stand in for distinct grams by the same negligible-
    collision argument as the shingle-CTE oracles.  The flag compares
    in INTEGERS (dup * 10 > n) — no float threshold to drift."""
    from hsearch_ray.stages.signatures import batched_streams

    def _rep(batch: pa.Table) -> pa.Table:
        dids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        streams = batched_streams(batch["text"], _REP_K)
        lens = np.array([s.size for s in streams], dtype=np.int64)
        if lens.sum() == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("n_grams", pa.int64()),
                 ("n_dup_grams", pa.int64()), ("is_repetitive", pa.bool_())]
            ).empty_table()
        allsh = np.concatenate(streams)
        seg = np.repeat(np.arange(len(streams), dtype=np.int64), lens)
        order = np.lexsort((allsh, seg))
        ss, hs = seg[order], allsh[order]
        new = np.ones(ss.size, dtype=bool)
        new[1:] = (ss[1:] != ss[:-1]) | (hs[1:] != hs[:-1])
        distinct = np.bincount(ss[new], minlength=len(streams))
        dup = lens - distinct
        return pa.table(
            {
                "doc_id": pa.array(dids, pa.int64()),
                "n_grams": pa.array(lens, pa.int64()),
                "n_dup_grams": pa.array(dup, pa.int64()),
                "is_repetitive": pa.array(
                    dup * _REP_DEN > lens * _REP_NUM, pa.bool_()
                ),
            }
        )

    return (
        _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
        .filter(expr=f"n_chars >= {_REP_K}")
        .map_batches(_rep, batch_format="pyarrow", batch_size=2048)
    )


def q_line_dedup_docs(sf_dir: str):
    """Cross-document duplicate-LINE accounting (the C4 line-dedup rule,
    Raffel et al. 2020 §2.2: drop any line occurring more than once in
    the dataset): per doc, total lines and lines whose exact text
    appears >= 2 times across the WHOLE corpus (multiplicity counted,
    so two copies inside one doc are dups too) — the per-doc removal
    ledger a cleaning pipeline writes before rewriting the corpus.

    Scale plan — two streaming passes over the exploded lines, nothing
    corpus-sized on the driver: (1) explode (the vectorized
    _explode_lines kernel) -> 64-bit line hash (polars' vectorized utf8
    hash; hash grouping stands in for text grouping under the
    shingle-CTE negligible-collision argument) -> per-batch (hash, n)
    partials -> distributed grouped sum (grouped_agg_ds: the line
    vocabulary never lands on the driver); (2) the hashes with n >= 2
    — the dup set, tiny relative to the vocabulary — ship as the
    id-range-sharded kv store (lazy per-batch shard fetch, the
    verifier-store discipline, NOT a whole-set broadcast) and a second
    exploded pass marks lines + reduces to per-doc partials, combined
    distributed by doc_id."""
    import polars as pl
    from hsearch_ray.stages.agg import grouped_agg_ds
    from hsearch_ray.stages.lsh import _kv_lookup, build_kv_store

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _line_hashes(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        t = _explode_lines(batch)
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = pl.from_arrow(t["line"]).hash(seed=42).to_numpy().view(np.int64)
        return did, h

    def _hash_partials(batch: pa.Table) -> pa.Table:
        _, h = _line_hashes(batch)
        uh, n = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(uh, pa.int64()),
                         "n": pa.array(n, pa.int64())})

    counts = grouped_agg_ds(
        ds.map_batches(_hash_partials, batch_format="pyarrow",
                       batch_size=2048),
        ["h"], {"n": ["sum"]},
    )
    store_ref = ray.put(
        build_kv_store(counts.filter(expr="n__sum >= 2"), "h", "n__sum")
    )

    def _doc_partials(batch: pa.Table) -> pa.Table:
        did, h = _line_hashes(batch)
        _, is_dup = _kv_lookup(store_ref).lookup(h)
        uid, inv = np.unique(did, return_inverse=True)
        return pa.table(
            {
                "doc_id": pa.array(uid, pa.int64()),
                "n_lines": pa.array(np.bincount(inv), pa.int64()),
                "n_dup_lines": pa.array(
                    np.bincount(inv, weights=is_dup).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    per_doc = grouped_agg_ds(
        ds.map_batches(_doc_partials, batch_format="pyarrow",
                       batch_size=2048),
        ["doc_id"], {"n_lines": ["sum"], "n_dup_lines": ["sum"]},
    )
    return per_doc.map_batches(
        lambda df: pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
                "n_lines": df["n_lines__sum"].to_numpy(dtype=np.int64),
                "n_dup_lines": df["n_dup_lines__sum"].to_numpy(dtype=np.int64),
            }
        ),
        batch_format="pandas",
    )


# Stratified mix rates as 32-bit hash thresholds: the "rebalance the
# language mix" pretraining op — downsample the dominant language,
# keep the rest.  Thresholds are powers of two so the keep rate is
# exact and the oracle predicate is integer-only.
_MIX_THRESHOLDS = {"en": 1 << 30, "de": 1 << 32, "es": 1 << 32,
                   "fr": 1 << 32, "zh": 1 << 32}  # en 1/4, others all


def q_mix_sources_docs(sf_dir: str):
    """Deterministic stratified mixing — the data-mixing pass that
    rebalances a pretraining corpus (downsample the dominant stratum,
    keep the tails): each doc survives iff its multiplicative id-hash
    lands under its STRATUM's threshold (the hash_sample discipline
    with per-group rates).  Embarrassingly parallel, no shuffle, no
    randomness — exactly reproducible across runs, engines and corpus
    shardings, and a doc's fate never depends on which shard holds it
    (the property that makes the mix resumable at 100 TB)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    thr = dict(_MIX_THRESHOLDS)

    def pick(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        langs = batch["lang"].to_pandas()
        t = langs.map(thr).fillna(0).to_numpy(dtype=np.uint64)
        h = (did.astype(np.uint64) * np.uint64(_SAMPLE_MULT)) \
            % np.uint64(1 << 32)
        sub = batch.filter(pa.array(h < t))
        return pa.table({"doc_id": sub["doc_id"].cast(pa.int64()),
                         "lang": sub["lang"].cast(pa.string())})

    return ds.map_batches(pick, batch_format="pyarrow")


# Train/val/test thresholds: floor(0.8 * 2^32) and floor(0.9 * 2^32).
# Any integer threshold keeps the predicate exact — the hash is uniform
# on [0, 2^32), so realized rates are 80% / 10% / 10% up to 1/2^32.
_SPLIT_TRAIN = 3435973836
_SPLIT_VAL = 3865470565


def q_split_docs(sf_dir: str):
    """Deterministic train/val/test split (80/10/10) — the dataset-split
    pass of a training pipeline done as a pure row function: a doc's
    split is decided by where its multiplicative id-hash lands, so the
    assignment is reproducible across runs, engines and corpus
    shardings, disjoint by construction, and stable under corpus growth
    (adding docs never moves an existing doc between splits — the
    property a holdout set must have).  Embarrassingly parallel: one
    vectorized predicate per batch, no shuffle, no state."""
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def pick(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = (did.astype(np.uint64) * np.uint64(_SAMPLE_MULT)) \
            % np.uint64(1 << 32)
        split = np.where(
            h < np.uint64(_SPLIT_TRAIN), "train",
            np.where(h < np.uint64(_SPLIT_VAL), "val", "test"),
        )
        return pa.table({"doc_id": pa.array(did, pa.int64()),
                         "split": pa.array(split, pa.string())})

    return ds.map_batches(pick, batch_format="pyarrow")


# PPS sample scale: keep probability = value_c / _PPS_SCALE_C (capped
# at 1) — events worth >= $200 always survive, a $2 event survives 1%
# of the time.  Integer-exact: keep iff h * _PPS_SCALE_C < value_c<<32.
_PPS_SCALE_C = 20000


def q_weighted_sample_events(sf_dir: str):
    """Deterministic probability-proportional-to-size Bernoulli sample —
    the importance-sampling pass of a training-data pipeline (keep
    high-value rows with certainty, thin the long tail) with NO random
    state: row i survives iff h(id)/2^32 < value_i/scale, evaluated in
    exact integer arithmetic (h*scale < value_c*2^32; both sides
    < 2^48, no float rounding at the boundary).  Like all hash-sample
    operators here it is shuffle-free, shard-placement-independent and
    exactly DuckDB-expressible, so the sample is resumable and
    auditable at 100 TB."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def pick(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        vc = _cents(batch["value"].to_pandas())
        h = (eid.astype(np.uint64) * np.uint64(_SAMPLE_MULT)) \
            % np.uint64(1 << 32)
        keep = h.astype(np.int64) * _PPS_SCALE_C < (vc.astype(np.int64) << 32)
        sub = batch.filter(pa.array(keep))
        return pa.table({
            "event_id": sub["event_id"].cast(pa.int64()),
            "user_id": sub["user_id"].cast(pa.int64()),
            "value_c": pa.array(vc[keep], pa.int64()),
        })

    return ds.map_batches(pick, batch_format="pyarrow")


_PACK_BUDGET = 512  # tokens per packed training sequence


def distributed_exclusive_scan(narrow, key_cols: list[str], values_of):
    """Distributed EXCLUSIVE PREFIX SUM (the classic two-pass scan) over
    a SORTED, MATERIALIZED narrow dataset.  After ``sort(key_cols)`` +
    ``materialize()``, blocks cover disjoint key ranges and are
    identical across passes, so: pass A reduces each block to (first-row
    key tuple, value sum) — an O(blocks) table — and the driver's
    exclusive scan over it in key order yields exact per-block offsets.
    Returns a ``ray.put`` ref to the {first-key-tuple: offset} dict for
    a pass-B ``map_batches`` (offset + block-local exclusive cumsum =
    global exclusive prefix).  Output is independent of block
    boundaries, hence identical at any parallelism level; only O(blocks)
    rows ever reach the driver.  ``values_of(batch) -> int64 ndarray``
    supplies the summand per row (np.ones for a distributed
    ROW_NUMBER)."""

    def _mark(batch: pa.Table) -> pa.Table:
        cols = {}
        if batch.num_rows == 0:
            for c in key_cols:
                cols[c] = pa.array([], batch.schema.field(c).type)
            cols["tot_"] = pa.array([], pa.int64())
        else:
            for c in key_cols:
                cols[c] = pa.array([batch[c][0].as_py()],
                                   batch.schema.field(c).type)
            cols["tot_"] = pa.array([int(values_of(batch).sum())], pa.int64())
        return pa.table(cols)

    marks = narrow.map_batches(
        _mark, batch_format="pyarrow", batch_size=None
    ).to_pandas().sort_values(key_cols).reset_index(drop=True)
    tots = marks["tot_"].to_numpy(dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(tots[:-1])]).astype(np.int64)
    keys = marks[key_cols].itertuples(index=False, name=None)
    return ray.put({tuple(k): int(o) for k, o in zip(keys, offs)})


def q_pack_sequences_docs(sf_dir: str):
    """Concat-and-chunk sequence packing — the pass that turns a doc
    corpus into fixed-budget training sequences: docs are concatenated
    in doc_id order and chunked every ``_PACK_BUDGET`` tokens; each doc
    is assigned the sequence its first token lands in (``seq_id``) plus
    its global token offset.  Built on ``distributed_exclusive_scan``
    over the NARROW (doc_id, n_tokens) rows — text never enters the
    exchange, nothing corpus-sized touches the driver."""
    toks = textstats.token_counts(
        _read(sf_dir, "documents", columns=["doc_id", "text"])
    )
    narrow = toks.sort("doc_id").materialize()
    ref = distributed_exclusive_scan(
        narrow, ["doc_id"],
        lambda b: b["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64),
    )

    def _assign(batch: pa.Table, ref=ref) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "tok_offset": pa.array([], pa.int64()),
                             "seq_id": pa.array([], pa.int64())})
        offsets = ray.get(ref)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        nt = batch["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        excl = np.cumsum(nt) - nt + offsets[(int(did[0]),)]
        return pa.table({"doc_id": pa.array(did, pa.int64()),
                         "n_tokens": pa.array(nt, pa.int64()),
                         "tok_offset": pa.array(excl, pa.int64()),
                         "seq_id": pa.array(excl // _PACK_BUDGET, pa.int64())})

    return narrow.map_batches(_assign, batch_format="pyarrow", batch_size=None)


def q_shuffle_rank_docs(sf_dir: str):
    """Deterministic global training-order shuffle — the epoch-order
    assignment a trainer consumes: rank = position in multiplicative-
    id-hash order (doc_id tie-break makes the order total), i.e. a
    DISTRIBUTED ROW_NUMBER: hash per batch, one narrow (h, doc_id)
    sort, then ``distributed_exclusive_scan`` with summand 1.  Exactly
    reproducible across runs, engines and parallelism levels — the
    property a resumable 100-TB training job needs from its shuffle
    (contrast ``sample_events``' engine ``random_shuffle``, which is
    seeded but block-layout-dependent)."""
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def _hash(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = (did.astype(np.uint64) * np.uint64(_SAMPLE_MULT)) \
            % np.uint64(1 << 32)
        return pa.table({"doc_id": pa.array(did, pa.int64()),
                         "h": pa.array(h.astype(np.int64), pa.int64())})

    narrow = ds.map_batches(_hash, batch_format="pyarrow") \
        .sort(["h", "doc_id"]).materialize()
    ref = distributed_exclusive_scan(
        narrow, ["h", "doc_id"],
        lambda b: np.ones(b.num_rows, dtype=np.int64),
    )

    def _rank(batch: pa.Table, ref=ref) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64())})
        offsets = ray.get(ref)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = batch["h"].to_numpy(zero_copy_only=False)
        base = offsets[(int(h[0]), int(did[0]))]
        return pa.table({
            "doc_id": pa.array(did, pa.int64()),
            "rank": pa.array(base + np.arange(did.size, dtype=np.int64),
                             pa.int64()),
        })

    return narrow.map_batches(_rank, batch_format="pyarrow", batch_size=None)


def q_quantile_filter_docs(sf_dir: str):
    """Quantile-threshold quality gate — drop the bottom quartile by
    token count (the 'filter to the top X% by signal' pass a pretraining
    pipeline runs after scoring): the threshold is the EXACT 25th-
    percentile order statistic found by the distributed histogram
    recursion (``exact_order_stat_distributed`` — only histogram
    partials and one driver-sized range ever leave the workers), then a
    broadcast scalar filter.  Integer token counts make the oracle
    comparison exact."""
    toks = textstats.token_counts(
        _read(sf_dir, "documents", columns=["doc_id", "text"])
    ).materialize()
    thr = exact_order_stat_distributed(
        toks, "n_tokens", kfn=lambda n: ((n - 1) // 4,) * 2
    )
    thr = int(thr)  # single integer element: round(,6) is exact

    def _keep(batch: pa.Table) -> pa.Table:
        nt = batch["n_tokens"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(nt >= thr))
        return pa.table({"doc_id": sub["doc_id"].cast(pa.int64()),
                         "n_tokens": sub["n_tokens"].cast(pa.int64())})

    return toks.map_batches(_keep, batch_format="pyarrow")


def q_tfidf_docs(sf_dir: str):
    """Per-doc top-3 TF-IDF terms — the document-term weighting pass a
    retrieval / quality pipeline runs over the whole corpus.  Two
    streaming passes, nothing corpus-sized on the driver (the
    line-dedup discipline): (1) per-batch distinct-(doc, token) rows ->
    distributed grouped count = document frequency (the token
    vocabulary never lands on the driver); (2) the df table ships as
    the id-range-sharded kv store keyed by the 64-bit token hash
    (polars' vectorized utf8 hash), and a second pass computes per-doc
    tf, looks up df, and takes the per-doc top-3 WITHIN the batch (docs
    are whole within a batch — no second shuffle).  The float score
    tf*ln(N/df) is rounded to 6 places before ranking in BOTH engines
    (the repo float discipline) and used for ORDERING only; the output
    is all-integer + token, so the value hash never touches a float."""
    import polars as pl

    from hsearch_ray.stages.agg import grouped_agg_ds
    from hsearch_ray.stages.lsh import _kv_lookup, build_kv_store

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = ds.count()

    def _doc_tokens(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(["doc_id", "text"]).to_pandas()
        toks = df["text"].str.findall(r"\S+")
        out = pd.DataFrame({
            "doc_id": np.repeat(df["doc_id"].to_numpy(dtype=np.int64),
                                toks.str.len().to_numpy(dtype=np.int64)),
            "token": np.concatenate(toks.to_numpy()) if len(df) else
                     np.empty(0, dtype=object),
        })
        return (out.groupby(["doc_id", "token"], as_index=False, sort=False)
                .size().rename(columns={"size": "tf"}))

    def _df_partials(batch: pa.Table) -> pa.Table:
        tf = _doc_tokens(batch)
        h = pl.from_pandas(tf["token"].astype(str)).hash(seed=42) \
            .to_numpy().view(np.int64)
        uh, n = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(uh, pa.int64()),
                         "n": pa.array(n, pa.int64())})

    dfreq = grouped_agg_ds(
        ds.map_batches(_df_partials, batch_format="pyarrow", batch_size=2048),
        ["h"], {"n": ["sum"]},
    )
    store_ref = ray.put(build_kv_store(dfreq, "h", "n__sum"))

    def _topk(batch: pa.Table) -> pd.DataFrame:
        tf = _doc_tokens(batch)
        if tf.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "rank": pd.Series(dtype="int64"),
                                 "token": pd.Series(dtype=object),
                                 "tf": pd.Series(dtype="int64"),
                                 "df": pd.Series(dtype="int64")})
        h = pl.from_pandas(tf["token"].astype(str)).hash(seed=42) \
            .to_numpy().view(np.int64)
        dfv, ok = _kv_lookup(store_ref).lookup(h)
        dfv = np.where(ok, dfv, 1)  # every token HAS a df; belt+braces
        tf["df"] = dfv.astype(np.int64)
        tf["s"] = np.round(
            tf["tf"].to_numpy(dtype=np.float64)
            * np.log(float(n_docs) / dfv.astype(np.float64)), 6
        )
        tf = tf.sort_values(["doc_id", "s", "token"],
                            ascending=[True, False, True], kind="stable")
        tf["rank"] = tf.groupby("doc_id", sort=False).cumcount() + 1
        out = tf[tf["rank"] <= 3]
        return pd.DataFrame({
            "doc_id": out["doc_id"].to_numpy(dtype=np.int64),
            "rank": out["rank"].to_numpy(dtype=np.int64),
            "token": out["token"].to_numpy(),
            "tf": out["tf"].to_numpy(dtype=np.int64),
            "df": out["df"].to_numpy(dtype=np.int64),
        })

    return ds.map_batches(_topk, batch_format="pyarrow", batch_size=2048)


# Scrub pattern for the redaction query.  The kernel (textstats.
# scrub_batch) is the PII-redaction plumbing — emails, phone numbers —
# but the synthetic corpus carries none, so the REGISTERED query scrubs
# flagged vocabulary terms instead: same RE2 kernel, non-trivial result.
_SCRUB_PAT = r"\b(customer|vector|spark)\b"
_SCRUB_REP = "<TERM>"


def q_scrub_docs(sf_dir: str):
    """Regex redaction ledger: per doc, the number of flagged-pattern
    hits and the text length after scrubbing them (textstats.
    scrub_batch: RE2 count + replace via pyarrow.compute, zero Python
    per row).  The per-doc evidence table a scrubbing pipeline writes
    alongside the rewritten corpus; at scale the scrubbed text itself
    goes to a parquet sink instead of the driver."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _scrub(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from hsearch_ray.stages.textstats import scrub_batch

        out = scrub_batch(batch, _SCRUB_PAT, _SCRUB_REP)
        return pa.table({
            "doc_id": out["doc_id"].cast(pa.int64()),
            "n_hits": out["n_hits"],
            "scrubbed_len": pc.utf8_length(out["text"]).cast(pa.int64()),
        })

    return ds.map_batches(_scrub, batch_format="pyarrow", batch_size=65536)


# Exact duplicated-n-gram ledger gram width (chars).  Spans ~4 vocab
# words on the synthetic corpus so cross-doc sharing is non-trivial but
# far from total.
_DUP_NGRAM_K = 24


def q_dup_ngram_docs(sf_dir: str):
    """Exact duplicated-n-gram ledger (stages/ngramdup.py): for every
    doc holding at least one {k}-char gram that also occurs in ANOTHER
    doc, the count of such distinct grams and the positions they cover
    — the per-doc evidence table exact-substring dedup (Lee et al.,
    ACL 2022) thresholds before cutting spans.  The engine analog of
    the reference's suffix-array shared-substring scan
    (suffix_array.cpp:72-84): ONE distributed sort of the (gram, doc)
    posting table by 64-bit gram hash + a vectorized run scan, instead
    of a single-threaded std::sort over 500-char suffix compares."""
    from hsearch_ray.stages.ngramdup import dup_ngram_stats

    return dup_ngram_stats(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        k=_DUP_NGRAM_K,
    )


def q_cut_dup_spans_docs(sf_dir: str):
    """Exact-substring span CUTTING (the rewrite step of Lee et al.,
    ACL 2022, on top of the `dup_ngram_docs` ledger): every cross-doc
    duplicated {k}-gram occurrence is removed from every doc except the
    gram's min-doc_id owner, overlapping windows merging into spans —
    output (doc_id, clean_text, n_cut).  The engine analog of acting on
    the reference's suffix-array shared-substring scan
    (gen_kmers_from_suffix_array.cpp:51-65) instead of just reporting
    it.  Distributed: posting groupby -> sharded (gram -> owner) kv
    store -> one vectorized cutting pass; nothing corpus-sized on the
    driver."""
    from hsearch_ray.stages.ngramdup import cut_dup_spans

    return cut_dup_spans(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        k=_DUP_NGRAM_K,
    )


def q_event_transitions(sf_dir: str):
    """Markov transition matrix of the event stream (ordered-lag /
    LAG-window pattern as a distributed operator): (prev_type,
    next_type, n) counting how often each event type follows each other
    type within the same user's (ts, event_id)-ordered timeline.  One
    sorted-block scan with per-block partial counts; the final combine
    is |types|^2 rows by construction (stages/events.transition_counts)."""
    from hsearch_ray.stages.events import transition_counts

    return transition_counts(
        _read(sf_dir, "events",
              columns=["event_id", "ts", "user_id", "event_type"])
    )


def q_active_users_hourly(sf_dir: str):
    """Per-hour DISTINCT user count — the distinct-in-group pattern a
    corpus-telemetry pipeline needs (COUNT(DISTINCT ...) GROUP BY ...).
    Plan: narrow projection to (hour_bucket, user_id), per-block
    drop_duplicates partial, then the distributed grouped combine
    collapses to one row per distinct pair WITHOUT the pair set ever
    landing on the driver (grouped_agg_ds), and a second driver-sized
    combine counts pairs per hour."""
    from hsearch_ray.stages.agg import grouped_agg_ds

    ds = _read(sf_dir, "events", columns=["ts", "user_id"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {"hour_bucket": us // 3_600_000_000,
             "user_id": df["user_id"].to_numpy(dtype=np.int64)}
        ).drop_duplicates()

    distinct_pairs = grouped_agg_ds(
        ds.map_batches(prep, batch_format="pandas", batch_size=65536),
        ["hour_bucket", "user_id"], {}, count_alias="nr",
    )
    out = grouped_agg(distinct_pairs, ["hour_bucket"], {},
                      count_alias="active_users")
    out["hour_bucket"] = out["hour_bucket"].astype("int64")
    out["active_users"] = out["active_users"].astype("int64")
    return out


# Q18-style HAVING threshold (int qty cents): per-order line-quantity
# sums above this are "large-volume" orders (~1-2% of orders on the
# synthetic tables, so the survivor set is broadcast-sized by
# construction — the same selectivity argument TPC-H Q18 itself makes).
_LARGE_ORDER_MIN_QTY_C = 25_000


def q_large_orders(sf_dir: str):
    """Large-volume orders (TPC-H Q18 shape): groupby-HAVING on the big
    fact table, then a broadcast semi-join back to orders.  Plan: (1)
    per-orderkey quantity partials summed by the distributed grouped
    combine (the per-orderkey table never lands on the driver); (2) the
    HAVING filter runs distributed, and only the few survivors — small
    by the documented selectivity — collect, sort, and broadcast; (3)
    one vectorized searchsorted probe per orders batch attaches the
    total and drops non-survivors (no shuffle join for a 1%-selectivity
    semi-join)."""
    from hsearch_ray.stages.agg import grouped_agg_ds

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def _qty_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"l_orderkey": df["l_orderkey"].to_numpy(dtype=np.int64),
             "qty_c": _cents(df["l_quantity"])}
        )

    per_order = grouped_agg_ds(
        li.map_batches(_qty_rows, batch_format="pandas", batch_size=65536),
        ["l_orderkey"], {"qty_c": ["sum"]},
    )
    big = per_order.filter(
        expr=f"qty_c__sum > {_LARGE_ORDER_MIN_QTY_C}"
    ).to_pandas()
    keys = big["l_orderkey"].to_numpy(dtype=np.int64)
    order = np.argsort(keys, kind="stable")
    ref = ray.put((keys[order], big["qty_c__sum"].to_numpy(dtype=np.int64)[order]))

    def _probe(df: pd.DataFrame) -> pd.DataFrame:
        ks, qs = ray.get(ref)
        ok_keys = df["o_orderkey"].to_numpy(dtype=np.int64)
        if ks.size == 0:
            hit = np.zeros(ok_keys.size, dtype=bool)
            pos = np.zeros(ok_keys.size, dtype=np.int64)
        else:
            pos = np.minimum(np.searchsorted(ks, ok_keys), ks.size - 1)
            hit = ks[pos] == ok_keys
        sub = df[hit]
        return pd.DataFrame(
            {"o_orderkey": sub["o_orderkey"].to_numpy(dtype=np.int64),
             "o_custkey": sub["o_custkey"].to_numpy(dtype=np.int64),
             "o_orderdate": sub["o_orderdate"].dt.strftime("%Y-%m-%d"),
             "total_qty_c": qs[pos[hit]]}
        )

    return _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(_probe, batch_format="pandas", batch_size=65536)


def q_keep_best_docs(sf_dir: str):
    """Fuzzy-dedup keeper selection by quality (the disposition policy
    CCNet/RefinedWeb-style pipelines apply after near-dup clustering):
    within every flagship near-dup cluster keep the LONGEST doc
    (max n_chars, ties to the smallest doc_id), not the arbitrary
    min-id representative.  Demonstrates exact distributed argmax
    WITHOUT key packing: (1) per-cluster max n_chars via the
    distributed grouped combine, (2) filter members at the max via a
    sharded kv-store probe, (3) per-cluster min doc_id among those,
    (4) attach the keeper to every member through a second kv store —
    no corpus-sized table ever lands on the driver.
    Output: (doc_id, keeper_id, kept)."""
    from hsearch_ray.stages.agg import grouped_agg_ds
    from hsearch_ray.stages.lsh import _kv_lookup, build_kv_store

    res = _dedup_result(sf_dir)
    clusters = res.clusters  # (file_id, cluster_id), one row per doc

    nchars_ref = ray.put(build_kv_store(
        _read(sf_dir, "documents", columns=["doc_id", "n_chars"]),
        "doc_id", "n_chars"))

    def _attach_nchars(batch: pa.Table) -> pa.Table:
        look = _kv_lookup(nchars_ref)
        did = batch["file_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nch, ok = look.lookup(did)
        return pa.table({
            "cluster_id": batch["cluster_id"].cast(pa.int64()),
            "doc_id": pa.array(did, pa.int64()),
            "n_chars": pa.array(np.where(ok, nch, 0), pa.int64()),
        })

    members = clusters.map_batches(
        _attach_nchars, batch_format="pyarrow", batch_size=65536
    ).materialize()
    cmax = grouped_agg_ds(members, ["cluster_id"], {"n_chars": ["max"]})
    cmax_ref = ray.put(build_kv_store(cmax, "cluster_id", "n_chars__max"))

    def _at_max(batch: pa.Table) -> pa.Table:
        look = _kv_lookup(cmax_ref)
        cid = batch["cluster_id"].to_numpy(zero_copy_only=False)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False)
        mx, ok = look.lookup(cid)
        keep = ok & (nch == mx)
        return pa.table({
            "cluster_id": pa.array(cid[keep], pa.int64()),
            "doc_id": batch["doc_id"].filter(pa.array(keep)),
        })

    keepers = grouped_agg_ds(
        members.map_batches(_at_max, batch_format="pyarrow", batch_size=65536),
        ["cluster_id"], {"doc_id": ["min"]},
    )
    keeper_ref = ray.put(build_kv_store(keepers, "cluster_id", "doc_id__min"))

    def _disposition(batch: pa.Table) -> pa.Table:
        look = _kv_lookup(keeper_ref)
        cid = batch["cluster_id"].to_numpy(zero_copy_only=False)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        kid, ok = look.lookup(cid)
        kid = np.where(ok, kid, did)
        return pa.table({
            "doc_id": pa.array(did, pa.int64()),
            "keeper_id": pa.array(kid, pa.int64()),
            "kept": pa.array((did == kid).astype(np.int64), pa.int64()),
        })

    return members.map_batches(
        _disposition, batch_format="pyarrow", batch_size=65536
    )


def q_clicks_before_purchase(sf_dir: str):
    """Time-band self-join: every purchase event with the count of the
    same user's clicks in the PRECEDING hour (ts in [t-1h, t)) — the
    interval-join feature a clickstream pipeline derives, expressed as
    one sorted-block scan whose kernel is two vectorized merge-rank
    (lexicographic-searchsorted) passes; no per-pair rows ever
    materialize (stages/events.windowed_prior_count)."""
    from hsearch_ray.stages.events import windowed_prior_count

    return windowed_prior_count(
        _read(sf_dir, "events",
              columns=["event_id", "ts", "user_id", "event_type"]),
        left_type="purchase", right_type="click", window_sec=3600,
    )


def q_lang_source_rollup(sf_dir: str):
    """Multi-level aggregate (GROUP BY ROLLUP shape): doc count + char
    sum per (lang, source), per-lang subtotals, and a grand total, with
    'ALL' as the rolled-up key.  The heavy pass is one distributed
    partial aggregation at the finest grain; the coarser levels derive
    from the (|langs| x |sources|)-sized base on the driver — pure
    arithmetic on an already-tiny table at any corpus scale."""
    base = grouped_agg(
        _read(sf_dir, "documents", columns=["lang", "source", "n_chars"]),
        ["lang", "source"], {"n_chars": ["sum"]}, count_alias="n_docs",
    )
    base = base.rename(columns={"n_chars__sum": "sum_chars"})
    by_lang = base.groupby("lang", as_index=False)[["n_docs", "sum_chars"]].sum()
    by_lang["source"] = "ALL"
    total = pd.DataFrame(
        {"lang": ["ALL"], "source": ["ALL"],
         "n_docs": [base["n_docs"].sum()], "sum_chars": [base["sum_chars"].sum()]}
    )
    out = pd.concat([base, by_lang, total], ignore_index=True)[
        ["lang", "source", "n_docs", "sum_chars"]
    ]
    out["n_docs"] = out["n_docs"].astype("int64")
    out["sum_chars"] = out["sum_chars"].astype("int64")
    return out


def q_label_centroids(sf_dir: str):
    """Grouped dense-vector aggregate (the SemDeDup/IVF centroid
    pattern): per-label element-wise sums over the embedding column,
    plus member counts.  Per block: the list<float> column is viewed
    zero-copy via offsets/values buffers, converted to int
    micro-units PER ELEMENT (float discipline — identical IEEE ops in
    NumPy and DuckDB), reshaped (n, d) and scatter-summed per label;
    cross-block combine is the distributed grouped sum over the tiny
    (labels x dims) key space.  Output: (label, dim, sum_milli,
    n_vecs) — the consumer divides for the centroid, keeping the
    engine output exactly integer."""
    ds = _read(sf_dir, "embeddings", columns=["embedding", "label"])

    def _partial(batch: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("label", pa.int64()), ("dim", pa.int64()),
             ("sum_milli", pa.int64()), ("n_vecs", pa.int64())]
        ).empty_table()
        if batch.num_rows == 0:
            return empty
        col = batch["embedding"].combine_chunks()
        off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(off)
        d = int(lens[0]) if lens.size else 0
        if d == 0 or not (lens == d).all():
            raise ValueError("embedding column must be fixed-width non-empty")
        vals = col.values.to_numpy(zero_copy_only=False)
        flat = vals[off[0]:off[-1]].astype(np.float64)
        milli = np.floor(flat * 1e6 + 0.5).astype(np.int64).reshape(-1, d)
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((uniq.size, d), np.int64)
        np.add.at(sums, inv, milli)
        cnt = np.bincount(inv, minlength=uniq.size).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(uniq, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), uniq.size),
                            pa.int64()),
            "sum_milli": pa.array(sums.ravel(), pa.int64()),
            "n_vecs": pa.array(np.repeat(cnt, d), pa.int64()),
        })

    out = grouped_agg(
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=4096),
        ["label", "dim"], {"sum_milli": ["sum"], "n_vecs": ["sum"]},
    )
    out = out.rename(columns={"sum_milli__sum": "sum_milli",
                              "n_vecs__sum": "n_vecs"})
    for c in ("label", "dim", "sum_milli", "n_vecs"):
        out[c] = out[c].astype("int64")
    return out


# Outlier bar for embedding_outliers: squared distance-to-centroid in
# kilo-unit² (x1e6) — the synthetic embeddings' d2 clusters at ~1.0 with
# a p90 of ~1.02, so 1.02e6 flags a non-trivial ~10% tail at every sf.
_OUTLIER_T_KILO2 = 1_020_000


def q_embedding_outliers(sf_dir: str):
    """Per-label centroid-distance outlier filter — the quality-control
    pass of an embedding-based curation pipeline (SemDeDup/SSL-prototype
    pruning: vectors far from their cluster center are mislabeled or
    noise).  Exactness discipline: with x in integer kilo-units and s =
    Σx per (label, dim), ``dist² > T`` is decided as the ALL-INTEGER
    predicate Σ_dim (n·x − s)² > T·n² — no float centroid ever exists,
    so the DuckDB oracle is bit-identical (the label_centroids
    micro-unit discipline, one level further).

    Scale shape: pass 1 is the distributed grouped sum over the tiny
    (labels × dims) key space; pass 2 broadcasts that table (ray.put
    once) and streams the corpus through one vectorized map_batches —
    no shuffle of the vectors themselves.
    Output: (vec_id, label, d2n2) for flagged vectors only."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])

    def _kilo(batch: pa.Table):
        col = batch["embedding"].combine_chunks()
        off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(off)
        d = int(lens[0]) if lens.size else 0
        if d == 0 or not (lens == d).all():
            raise ValueError("embedding column must be fixed-width non-empty")
        vals = col.values.to_numpy(zero_copy_only=False)
        flat = vals[off[0]:off[-1]].astype(np.float64)
        kilo = np.floor(flat * 1000 + 0.5).astype(np.int64).reshape(-1, d)
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        return kilo, lab, d

    def _partial(batch: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("label", pa.int64()), ("dim", pa.int64()),
             ("sum_kilo", pa.int64()), ("n_vecs", pa.int64())]
        ).empty_table()
        if batch.num_rows == 0:
            return empty
        kilo, lab, d = _kilo(batch)
        uniq, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((uniq.size, d), np.int64)
        np.add.at(sums, inv, kilo)
        cnt = np.bincount(inv, minlength=uniq.size).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(uniq, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), uniq.size),
                            pa.int64()),
            "sum_kilo": pa.array(sums.ravel(), pa.int64()),
            "n_vecs": pa.array(np.repeat(cnt, d), pa.int64()),
        })

    cent = grouped_agg(
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=4096),
        ["label", "dim"], {"sum_kilo": ["sum"], "n_vecs": ["sum"]},
    ).rename(columns={"sum_kilo__sum": "sum_kilo", "n_vecs__sum": "n_vecs"})
    labels = np.sort(cent["label"].unique().astype(np.int64))
    d = int(cent["dim"].max()) + 1 if len(cent) else 0
    S = np.zeros((labels.size, d), np.int64)
    li = np.searchsorted(labels, cent["label"].to_numpy(dtype=np.int64))
    S[li, cent["dim"].to_numpy(dtype=np.int64)] = (
        cent["sum_kilo"].to_numpy(dtype=np.int64)
    )
    n_of = np.zeros(labels.size, np.int64)
    n_of[li] = cent["n_vecs"].to_numpy(dtype=np.int64)
    ref = ray.put((labels, S, n_of))
    thr = _OUTLIER_T_KILO2

    def _flag(batch: pa.Table, ref=ref) -> pa.Table:
        empty = pa.schema(
            [("vec_id", pa.int64()), ("label", pa.int64()),
             ("d2n2", pa.int64())]
        ).empty_table()
        if batch.num_rows == 0:
            return empty
        labels, S, n_of = ray.get(ref)
        kilo, lab, _ = _kilo(batch)
        idx = np.searchsorted(labels, lab)
        n = n_of[idx]
        diff = n[:, None] * kilo - S[idx]
        d2n2 = np.einsum("ij,ij->i", diff, diff)
        keep = d2n2 > thr * n * n
        return pa.table({
            "vec_id": batch["vec_id"].cast(pa.int64()).filter(pa.array(keep)),
            "label": pa.array(lab[keep], pa.int64()),
            "d2n2": pa.array(d2n2[keep], pa.int64()),
        })

    return ds.map_batches(_flag, batch_format="pyarrow", batch_size=4096)


def q_json_props_stats(sf_dir: str):
    """Semi-structured column extraction — the log-analytics staple of
    pulling a typed field out of a JSON payload column at scale.  The
    extraction is one vectorized Arrow ``extract_regex`` kernel per
    batch (no per-row json.loads loop; the reference's hand-rolled
    field parsers play this role, e.g. the M8 column split), followed
    by narrow integer partials and the distributed grouped sum over the
    tiny event_type key space.  NULL / non-matching payloads count in
    n_events but contribute nothing to the k aggregates — SQL aggregate
    semantics exactly.
    Output: (event_type, n_events, n_k, sum_k, min_k, max_k)."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "events", columns=["event_type", "props"])
    pat = r'"k"\s*:\s*(?P<k>-?\d+)'

    def _partial(batch: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("event_type", pa.string()), ("n_events", pa.int64()),
             ("n_k", pa.int64()), ("sum_k", pa.int64()),
             ("min_k", pa.int64()), ("max_k", pa.int64())]
        ).empty_table()
        if batch.num_rows == 0:
            return empty
        ext = pc.extract_regex(batch["props"], pat)
        k = pc.struct_field(ext, "k").cast(pa.int64())
        kv = k.combine_chunks().to_numpy(zero_copy_only=False)
        valid = ~pd.isna(kv)
        kint = np.where(valid, kv, 0).astype(np.int64)
        et = batch["event_type"].to_pandas().to_numpy(dtype=object)
        uniq, inv = np.unique(et.astype(str), return_inverse=True)
        n = np.bincount(inv, minlength=uniq.size).astype(np.int64)
        # all-int64 scatter adds (bincount's float64 weights would cap
        # exactness at 2^53 — the integer-cents discipline, applied here)
        nk = np.zeros(uniq.size, np.int64)
        np.add.at(nk, inv, valid.astype(np.int64))
        sk = np.zeros(uniq.size, np.int64)
        np.add.at(sk, inv, kint * valid)
        # min/max per group: +inf/-inf sentinels on invalid rows, then
        # np.minimum.at / np.maximum.at scatter reduction
        big = np.int64(2**62)
        mn = np.full(uniq.size, big, np.int64)
        mx = np.full(uniq.size, -big, np.int64)
        np.minimum.at(mn, inv, np.where(valid, kint, big))
        np.maximum.at(mx, inv, np.where(valid, kint, -big))
        return pa.table({
            "event_type": pa.array(uniq, pa.string()),
            "n_events": pa.array(n, pa.int64()),
            "n_k": pa.array(nk.astype(np.int64), pa.int64()),
            "sum_k": pa.array(sk.astype(np.int64), pa.int64()),
            "min_k": pa.array(mn, pa.int64()),
            "max_k": pa.array(mx, pa.int64()),
        })

    out = grouped_agg(
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=65536),
        ["event_type"],
        {"n_events": ["sum"], "n_k": ["sum"], "sum_k": ["sum"],
         "min_k": ["min"], "max_k": ["max"]},
    ).rename(columns={"n_events__sum": "n_events", "n_k__sum": "n_k",
                      "sum_k__sum": "sum_k", "min_k__min": "min_k",
                      "max_k__max": "max_k"})
    for c in ("n_events", "n_k", "sum_k", "min_k", "max_k"):
        out[c] = out[c].astype("int64")
    return out


_HLL_P = 12  # 4096 registers -> ~1.6% standard error


def q_approx_distinct_tokens(sf_dir: str):
    """Approximate distinct-token count via a mergeable HyperLogLog
    sketch (stages/sketches.py) — the shuffle-free alternative to the
    exact vocabulary path (`top_tokens_docs`): each block contributes
    ONE 2^p-byte register row, the driver max-merges them, and no token
    ever leaves its block.  Deterministic (polars utf8 hash), so the
    driver rows-only check is stable; accuracy vs the exact distinct
    count is pinned by pytest (no oracle — approximate by design).
    Output: one row (approx_distinct, n_registers)."""
    import polars as pl

    from hsearch_ray.stages.sketches import hll_estimate, hll_merge, hll_partial

    ds = _read(sf_dir, "documents", columns=["text"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.findall(r"\S+").explode().dropna()
        h = pl.from_pandas(toks.astype(str)).hash(seed=7).to_numpy()
        regs = hll_partial(h, p=_HLL_P)
        return pd.DataFrame({"regs": [regs.tobytes()]})

    rows = ds.map_batches(_partial, batch_format="pandas",
                          batch_size=2048).to_pandas()
    if rows.empty:
        merged = np.zeros(1 << _HLL_P, np.uint8)
    else:
        merged = hll_merge(np.stack(
            [np.frombuffer(b, dtype=np.uint8) for b in rows["regs"]]
        ))
    return pd.DataFrame(
        {"approx_distinct": pd.Series([hll_estimate(merged)], dtype="int64"),
         "n_registers": pd.Series([merged.size], dtype="int64")}
    )


def q_urgent_orders_by_month(sf_dir: str):
    """Predicate pushdown at the READ (the prune-at-the-read rule made
    visible): the '1-URGENT' filter ships into read_parquet as an Arrow
    dataset expression, so non-matching row groups are skipped at the
    storage layer and only 3 narrow columns ever enter the object
    store.  Downstream is one tiny month-bucket combine."""
    import pyarrow.dataset as pds

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_totalprice"],
        filter=(pds.field("o_orderpriority") == "1-URGENT"),
    )

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"month": df["o_orderdate"].dt.strftime("%Y-%m"),
             "price_c": _cents(df["o_totalprice"])}
        )

    out = grouped_agg(ds.map_batches(prep, batch_format="pandas"),
                      ["month"], {"price_c": ["sum"]}, count_alias="n_orders")
    out = out.rename(columns={"price_c__sum": "sum_price_c"})
    out["n_orders"] = out["n_orders"].astype("int64")
    out["sum_price_c"] = out["sum_price_c"].astype("int64")
    return out


def q_events_profile(sf_dir: str):
    """Table profiling (the ANALYZE-statistics op a pipeline runs before
    planning): per numeric column of events — row count, null count,
    min and max — in ONE distributed pass that emits a single partial
    row per (block, column); the driver combine is |columns| rows.
    Timestamps profile as epoch-us, floats as int cents (the repo float
    discipline), so every output cell is an exact int64."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "event_id": df["event_id"].to_numpy(dtype=np.int64),
            "user_id": df["user_id"].to_numpy(dtype=np.int64),
            "ts_us": df["ts"].astype("datetime64[us]").astype("int64").to_numpy(),
            "value_c": _cents(df["value"]),
        }
        nulls = {
            "event_id": int(df["event_id"].isna().sum()),
            "user_id": int(df["user_id"].isna().sum()),
            "ts_us": int(df["ts"].isna().sum()),
            "value_c": int(df["value"].isna().sum()),
        }
        rows = [
            {"col": name, "n_rows": int(len(df)), "n_nulls": nulls[name],
             "min_v": int(v.min()), "max_v": int(v.max())}
            for name, v in cols.items() if v.size
        ]
        return pd.DataFrame(rows)

    out = grouped_agg(
        ds.map_batches(_partial, batch_format="pandas", batch_size=65536),
        ["col"],
        {"n_rows": ["sum"], "n_nulls": ["sum"], "min_v": ["min"],
         "max_v": ["max"]},
    )
    out = out.rename(columns={"n_rows__sum": "n_rows",
                              "n_nulls__sum": "n_nulls",
                              "min_v__min": "min_v", "max_v__max": "max_v"})
    for c in ("n_rows", "n_nulls", "min_v", "max_v"):
        out[c] = out[c].astype("int64")
    return out


def q_funnel_events(sf_dir: str):
    """Sequential-pattern (funnel) aggregate: users who viewed, then
    clicked STRICTLY after their first view, then purchased strictly
    after that click — one sorted-block scan whose per-block kernel is
    a masked minimum.reduceat (first view per user run) plus two
    merge-rank first-right-after-t passes; the combine is one 4-int row
    per block (stages/events.funnel_counts)."""
    from hsearch_ray.stages.events import funnel_counts

    return funnel_counts(
        _read(sf_dir, "events",
              columns=["event_id", "ts", "user_id", "event_type"])
    )


def q_streaming_session_stats(sf_dir: str):
    """The STREAMING sibling of `session_stats`: the same gap-session
    semantics computed incrementally over event-time-ordered
    micro-batches with open-window state in hash-sharded stateful
    actors (stages/streaming.py — the one operator family where raw
    Ray actors are required: a session spanning micro-batches is
    shared mutable state).  Shares the batch query's DuckDB oracle
    verbatim; batch≡streaming equivalence is also pinned by pytest."""
    from hsearch_ray.stages.streaming import stream_sessionize

    return stream_sessionize(
        _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"]),
        gap_sec=3600,
    )


def q_compression_ratio_docs(sf_dir: str):
    """Compression-ratio quality signal (the Gopher/RefinedWeb-style
    heuristic: highly compressible text is boilerplate/repetition,
    incompressible text is noise): per doc, zlib-compressed size over
    raw size in integer parts-per-million.  The per-doc zlib call IS
    the compute (C speed); everything around it is one narrow
    map_batches.  No SQL oracle (DuckDB has no zlib) — monotonicity on
    constructed repetitive/random/normal docs is the pytest gate, and
    determinism makes the driver rows-only check stable."""
    import zlib

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _ratio(batch: pa.Table) -> pa.Table:
        txt = batch["text"].to_pylist()
        raw = np.array([len(t.encode("utf-8")) for t in txt], dtype=np.int64)
        comp = np.array(
            [len(zlib.compress(t.encode("utf-8"), level=6)) for t in txt],
            dtype=np.int64,
        )
        ppm = np.where(raw > 0, comp * 1_000_000 // np.maximum(raw, 1), 0)
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "raw_bytes": pa.array(raw, pa.int64()),
            "compressed_bytes": pa.array(comp, pa.int64()),
            "ratio_ppm": pa.array(ppm.astype(np.int64), pa.int64()),
        })

    return ds.map_batches(_ratio, batch_format="pyarrow", batch_size=4096)


def q_ipc_roundtrip_docs(sf_dir: str):
    """Arrow-IPC source round-trip (the custom-datasource pattern: Ray
    Data has no read_ipc, so sources/ipc.py composes read_binary_files
    with a per-shard pyarrow.ipc decode).  Documents are exported to
    IPC shards once (cache keyed by the parquet's content identity),
    read back through the validating reader, and per-doc char + token
    counts recomputed from the round-tripped text; the oracle
    recomputes from the PARQUET table, so equality proves the binary
    interchange preserves text exactly."""
    import os

    from hsearch_ray.sources.ipc import read_ipc, write_ipc

    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    tag = f"{os.path.basename(sf_dir.rstrip('/'))}_{st.st_mtime_ns}_{st.st_size}"
    idir = f"/tmp/graft_ipc_{tag}"
    marker = idir + "/.done"
    if not os.path.exists(marker):
        os.makedirs(idir, exist_ok=True)
        write_ipc(_read(sf_dir, "documents", columns=["doc_id", "text"]), idir)
        with open(marker, "w") as f:
            f.write("ok")

    ds = read_ipc(idir, required=("doc_id", "text"))

    def _counts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_chars_rt": df["text"].str.len().astype("int64"),
            "n_tokens": df["text"].str.count(r"\S+").astype("int64"),
        })

    return ds.map_batches(_counts, batch_format="pandas", batch_size=4096)


def q_warc_roundtrip_docs(sf_dir: str):
    """WARC source round-trip — the format web-scale corpora arrive in
    (Common Crawl ships WARC shards; sources/warc.py documents the
    ISO 28500 record layout).  Documents are exported once as
    WARC resource records (uri = https://example.org/doc/<id>, cache
    keyed by the parquet's content identity), read back through the
    validating Content-Length-walking parser, and per-doc char, token
    AND utf-8 BYTE counts recomputed from the round-tripped text; the
    oracle recomputes from the PARQUET table, so equality proves the
    archive encoding preserves text byte-exactly."""
    import os

    from hsearch_ray.sources.warc import read_warc, write_warc

    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    tag = f"{os.path.basename(sf_dir.rstrip('/'))}_{st.st_mtime_ns}_{st.st_size}"
    wdir = f"/tmp/graft_warc_{tag}"
    marker = wdir + "/.done"
    if not os.path.exists(marker):
        os.makedirs(wdir, exist_ok=True)

        def _to_records(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return pa.table({
                "uri": pa.array(
                    [f"https://example.org/doc/{i}" for i in ids],
                    pa.string()),
                "warc_date": pa.array(
                    ["2024-01-01T00:00:00Z"] * len(ids), pa.string()),
                "content": batch["text"].cast(pa.large_string()),
            })

        write_warc(
            _read(sf_dir, "documents", columns=["doc_id", "text"])
            .map_batches(_to_records, batch_format="pyarrow"),
            wdir,
        )
        with open(marker, "w") as f:
            f.write("ok")

    ds = read_warc(wdir)

    def _counts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["uri"].str.rsplit("/", n=1).str[-1].astype("int64"),
            "n_chars_rt": df["content"].str.len().astype("int64"),
            "n_tokens": df["content"].str.count(r"\S+").astype("int64"),
            "n_bytes": df["content"].str.encode("utf-8").str.len()
                       .astype("int64"),
        })

    return ds.map_batches(_counts, batch_format="pandas", batch_size=4096)


def q_media_features_docs(sf_dir: str):
    """Multimodal featurize pipeline, driver-visible end to end: a
    deterministic media table (REAL WAV/PNG codec bytes + one honest
    video stub, derived only from doc_id) -> actor-pool MediaFeaturizer
    (decode once per payload, 64-dim projection; model load in
    __init__) -> per-row digest + integer feature norm.  Rows-only BY
    DESIGN: binary codecs have no SQL oracle; the decoders and the
    featurizer are pinned by round-trip pytests instead
    (test_multimodal.py).  Every stage is map_batches with SMALL
    batches (payload-sized memory rule); nothing touches the driver."""
    from hsearch_ray.stages import multimodal

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    feats = multimodal.featurize_media(
        multimodal.synthetic_media_from_docs(ds), concurrency=(1, 2)
    )

    def _final(batch: pa.Table) -> pa.Table:
        # FixedSizeList -> (n, dim) float32 view, zero-copy via the
        # flattened values buffer
        col = batch["feature"].combine_chunks()
        f = col.flatten().to_numpy(zero_copy_only=False).reshape(
            batch.num_rows, multimodal.FEATURE_DIM
        ).astype(np.float32, copy=False)
        norm_ppm = np.floor(
            np.sqrt((f.astype(np.float64) ** 2).sum(axis=1)) * 1e6 + 0.5
        ).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "mime": batch["mime"].cast(pa.string()),
            "decoded": batch["decoded"],
            "digest": batch["digest"],
            "feat_norm_ppm": pa.array(norm_ppm, pa.int64()),
        })

    return feats.map_batches(_final, batch_format="pyarrow", batch_size=256)


def q_frame_sample_docs(sf_dir: str):
    """Video frame-sampling plumbing (M8 1->N explosion over media):
    every video/mp4 row of the synthetic media table explodes to
    ceil(n_frames/10) sampled-frame rows with the parent digest
    threaded through.  Rows-only BY DESIGN (no SQL video codec); the
    explosion arithmetic is pinned by test_frame_sample_explosion."""
    from hsearch_ray.stages import multimodal

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    def _videos(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.equal(batch["mime"], "video/mp4"))

    media = multimodal.synthetic_media_from_docs(ds).map_batches(
        _videos, batch_format="pyarrow", batch_size=256
    )
    frames = multimodal.frame_sample(media, every_n=10)

    def _final(batch: pa.Table) -> pa.Table:
        fr = batch["frame"].to_pylist()
        return pa.table({
            "digest": batch["digest"],
            "frame_no": batch["frame_no"],
            "frame_bytes": pa.array([len(x) for x in fr], pa.int64()),
        })

    return frames.map_batches(_final, batch_format="pyarrow")


_CHUNK_SIZE = 16
_CHUNK_STRIDE = 12


def q_chunk_docs(sf_dir: str):
    """Sliding-window token chunking (the RAG / long-context eval pass:
    window ``_CHUNK_SIZE`` tokens, stride ``_CHUNK_STRIDE``) — the
    per-doc OVERLAPPING sibling of ``pack_sequences_docs``' global
    concat-and-chunk.  Pure 1->N vectorized explode inside one
    ``map_batches``: chunk counts from token counts, ids/starts from
    one arange + repeat — embarrassingly parallel, no shuffle, no
    state.  Output: (doc_id, chunk_id, start_tok, n_toks)."""
    toks = textstats.token_counts(
        _read(sf_dir, "documents", columns=["doc_id", "text"])
    )

    _CHUNK_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("chunk_id", pa.int64()),
         ("start_tok", pa.int64()), ("n_toks", pa.int64())]
    )

    def _explode(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = batch["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = n > 0
        did, n = did[pos], n[pos]
        if did.size == 0:  # empty batch / all-empty docs
            return _CHUNK_SCHEMA.empty_table()
        nchunks = (n - 1) // _CHUNK_STRIDE + 1
        doc_rep = np.repeat(did, nchunks)
        tot = int(nchunks.sum())
        # intra-doc chunk index: global arange minus each doc's offset
        off = np.concatenate([[0], np.cumsum(nchunks)[:-1]])
        cid = np.arange(tot, dtype=np.int64) - np.repeat(off, nchunks)
        start = cid * _CHUNK_STRIDE
        ntok = np.minimum(_CHUNK_SIZE, np.repeat(n, nchunks) - start)
        return pa.table({
            "doc_id": pa.array(doc_rep, pa.int64()),
            "chunk_id": pa.array(cid, pa.int64()),
            "start_tok": pa.array(start, pa.int64()),
            "n_toks": pa.array(ntok, pa.int64()),
        })

    return toks.map_batches(_explode, batch_format="pyarrow")


def q_approx_quantiles_by_type(sf_dir: str):
    """GROUPED one-pass quantile summary — per event type, the p50/p90
    of value from the mergeable per-block summaries (the sketch
    complement of the exact ``median_value_by_type``): each block emits
    one weighted-sample set per group it sees (groups x 1024 rows max),
    the driver merges per group — one pass, no shuffle, exactly the
    HLL/summary combiner law applied per key.  Approximate by design ->
    rows-only; accuracy pinned per group by pytest.  Output: one row
    per (event_type, q_ppm)."""
    from hsearch_ray.stages.sketches import (
        quantile_summary_partial,
        quantile_summary_query,
    )

    qs = (0.50, 0.90)
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for et, g in df.groupby("event_type", sort=False):
            v, w = quantile_summary_partial(_cents(g["value"]), 1024)
            out.append(pd.DataFrame({"event_type": et, "v": v, "w": w}))
        return pd.concat(out, ignore_index=True) if out else \
            pd.DataFrame({"event_type": pd.Series(dtype=object),
                          "v": pd.Series(dtype="int64"),
                          "w": pd.Series(dtype="int64")})

    rows = ds.map_batches(_partial, batch_format="pandas",
                          batch_size=8192).to_pandas()
    out = {"event_type": [], "q_ppm": [], "value_cents": []}
    if not rows.empty:
        for et, g in rows.groupby("event_type", sort=True):
            est = quantile_summary_query(
                g["v"].to_numpy(np.int64), g["w"].to_numpy(np.int64), qs
            )
            for q, e in zip(qs, est):
                out["event_type"].append(et)
                out["q_ppm"].append(int(q * 1_000_000))
                out["value_cents"].append(int(e))
    return pd.DataFrame({
        "event_type": pd.Series(out["event_type"], dtype=object),
        "q_ppm": pd.Series(out["q_ppm"], dtype="int64"),
        "value_cents": pd.Series(out["value_cents"], dtype="int64"),
    })


# Snapshot-diff: deterministic old-corpus derivation knobs (added =
# doc_id%7==0 new-only; changed = doc_id%11==0 carried different bytes;
# removed = a synthetic old-only id family offset far above any real id).
_DIFF_REMOVED_OFF = 1 << 40


def q_corpus_diff_docs(sf_dir: str):
    """Corpus SNAPSHOT DIFF (data versioning): classify every doc id
    across two corpus versions as added / removed / changed / same —
    the audit a training pipeline runs between crawl snapshots before
    retraining or incremental dedup.  Both sides reduce per batch to
    narrow (doc_id, 64-bit text hash) rows; the compare is a genuine
    FULL OUTER distributed hash join (``Dataset.join`` — the one join
    type not exercised elsewhere; neither side broadcasts, text never
    enters the exchange), then a vectorized per-row status kernel.
    The 'old' snapshot derives deterministically from the same table
    (no external data; see _DIFF_REMOVED_OFF comment).  The oracle
    classifies with md5 instead of the engine hash — statuses agree
    because both hashes are injective on the corpus (the repo's
    hash-collision argument)."""
    import polars as pl
    import pyarrow.compute as pc

    def _hash_text(texts: pd.Series) -> np.ndarray:
        return pl.from_pandas(texts.astype(str)).hash(seed=42) \
            .to_numpy().view(np.int64)

    def _new_side(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"doc_id": did, "id_new": did,
                             "h_new": _hash_text(df["text"])})

    def _old_side(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].to_numpy(dtype=np.int64)
        txt = df["text"].copy()
        chg = did % 11 == 0
        txt.loc[chg] = txt.loc[chg] + " legacy"
        keep = did % 7 != 0
        rem = did % 13 == 0
        ids = np.concatenate([did[keep], did[rem] + _DIFF_REMOVED_OFF])
        hs = np.concatenate([_hash_text(txt[keep]),
                             _hash_text(df["text"][rem])])
        return pd.DataFrame({"doc_id": ids, "id_old": ids, "h_old": hs})

    new_ds = _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(_new_side, batch_format="pandas", batch_size=2048)
    old_ds = _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(_old_side, batch_format="pandas", batch_size=2048)
    num_partitions = default_num_partitions()
    joined = new_ds.join(old_ds, join_type="full_outer",
                         num_partitions=num_partitions, on=("doc_id",))

    def _status(batch: pa.Table) -> pa.Table:
        schema = pa.schema([("doc_id", pa.int64()), ("status", pa.string())])
        if batch.num_rows == 0:
            return schema.empty_table()

        def _col(name):
            c = batch[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        # null-fill INSIDE Arrow (int64 with nulls -> float64 in numpy)
        idn, ido = _col("id_new"), _col("id_old")
        mn = np.asarray(idn.is_null())
        mo = np.asarray(ido.is_null())
        did = np.where(
            mn,
            pc.fill_null(ido, 0).to_numpy(zero_copy_only=False),
            pc.fill_null(idn, 0).to_numpy(zero_copy_only=False),
        ).astype(np.int64)
        hn = pc.fill_null(_col("h_new"), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ho = pc.fill_null(_col("h_old"), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        status = np.where(mo, "added",
                          np.where(mn, "removed",
                                   np.where(hn != ho, "changed", "same")))
        return pa.table({"doc_id": pa.array(did, pa.int64()),
                         "status": pa.array(status.astype(object),
                                            pa.string())})

    return joined.map_batches(_status, batch_format="pyarrow")


# BM25 ranked retrieval: fixed multi-term query set (terms drawn from
# the synthetic vocabulary), Okapi parameters, top-k per query.
_BM25_QUERIES = (
    (1, ("hash", "join", "merge")),
    (2, ("window", "filter", "scan")),
    (3, ("spark", "stream", "customer")),
)
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 10


def q_bm25_search_docs(sf_dir: str):
    """BM25 ranked retrieval (Okapi BM25; Robertson & Walker, SIGIR'94)
    — the lexical query-driven search operator: for each query, the
    top-k docs by sum over query terms of
    idf(t) * tf*(k1+1) / (tf + k1*(1-b + b*dl/avgdl)).

    Scale shape: the query-term set broadcasts (tiny by definition);
    pass 1 emits O(terms) stat rows per block (doc count, token-length
    sum, per-term document frequency) — no shuffle, the vocabulary
    never leaves its block; pass 2 scores each batch against the
    broadcast (idf, avgdl) and keeps a per-block top-k per query (the
    grouped-top-k combiner), so the driver final sees at most
    blocks x queries x k rows.  Float discipline: each per-term
    contribution is quantized to integer MICRO-UNITS per row before
    the cross-term sum, so neither ranking nor the oracle value hash
    depends on float summation order."""
    import math

    terms = sorted({t for _, ts in _BM25_QUERIES for t in ts})
    tref = ray.put(tuple(terms))
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _tok(df: pd.DataFrame):
        toks = df["text"].str.findall(r"\S+")
        dl = toks.str.len().to_numpy(dtype=np.int64)
        flat = (np.concatenate(toks.to_numpy()) if len(df)
                else np.empty(0, dtype=object))
        didx = np.repeat(np.arange(len(df), dtype=np.int64), dl)
        return flat, didx, dl

    def _stats(batch: pa.Table, tref=tref) -> pa.Table:
        ts = ray.get(tref)
        df = batch.select(["doc_id", "text"]).to_pandas()
        flat, didx, dl = _tok(df)
        dfs = [int(np.unique(didx[flat == t]).size) for t in ts]
        return pa.table({
            "term": pa.array([""] + list(ts), pa.string()),
            "n": pa.array([len(df)] + dfs, pa.int64()),
            "dl": pa.array([int(dl.sum())] + [0] * len(ts), pa.int64()),
        })

    sp = ds.map_batches(_stats, batch_format="pyarrow",
                        batch_size=2048).to_pandas()
    empty = pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                          "doc_id": pd.Series(dtype="int64"),
                          "score_ppm": pd.Series(dtype="int64")})
    if sp.empty:
        return empty
    is_stat = sp["term"] == ""
    n_docs = int(sp.loc[is_stat, "n"].sum())
    if n_docs == 0:
        return empty
    avgdl = int(sp.loc[is_stat, "dl"].sum()) / n_docs
    dfreq = sp.loc[~is_stat].groupby("term")["n"].sum()
    idf = {t: math.log(1.0 + (n_docs - int(df) + 0.5) / (int(df) + 0.5))
           for t, df in dfreq.items() if int(df) > 0}
    bref = ray.put((avgdl, idf))

    def _score(batch: pa.Table, bref=bref) -> pd.DataFrame:
        avgdl, idf = ray.get(bref)
        df = batch.select(["doc_id", "text"]).to_pandas()
        flat, didx, dl = _tok(df)
        docs = df["doc_id"].to_numpy(dtype=np.int64)
        norm = _BM25_K1 * (0.25 + 0.75 * dl / avgdl)  # 1-b=0.25, b=0.75
        out = []
        for qid, qterms in _BM25_QUERIES:
            ppm = np.zeros(len(df), np.int64)
            matched = np.zeros(len(df), bool)
            for t in qterms:
                if t not in idf:
                    continue
                tf = np.bincount(didx[flat == t], minlength=len(df))
                matched |= tf > 0
                # exact SQL expression order: ((idf*(tf*2.2))/denom)*1e6+0.5
                # (2.2 as a LITERAL on both sides — not k1+1, whose float
                # rounding could differ from the SQL constant)
                c = np.floor(
                    idf[t] * (tf * 2.2) / (tf + norm) * 1_000_000 + 0.5
                )
                ppm += c.astype(np.int64)
            if not matched.any():
                continue
            top = pd.DataFrame({"query_id": qid, "doc_id": docs[matched],
                                "score_ppm": ppm[matched]})
            top = top.sort_values(["score_ppm", "doc_id"],
                                  ascending=[False, True])
            out.append(top.head(_BM25_TOPK))
        return pd.concat(out, ignore_index=True) if out else empty.copy()

    partials = ds.map_batches(_score, batch_format="pyarrow",
                              batch_size=2048).to_pandas()
    if partials.empty:
        return empty
    fin = (partials.sort_values(["score_ppm", "doc_id"],
                                ascending=[False, True])
           .groupby("query_id", sort=False).head(_BM25_TOPK)
           .sort_values(["query_id", "score_ppm", "doc_id"],
                        ascending=[True, False, True])
           .reset_index(drop=True))
    return pd.DataFrame({"query_id": fin["query_id"].astype("int64"),
                         "doc_id": fin["doc_id"].astype("int64"),
                         "score_ppm": fin["score_ppm"].astype("int64")})


def q_user_running_value(sf_dir: str):
    """Per-user running revenue — the one window-function family not
    yet covered: the cumulative ``SUM(...) OVER (PARTITION BY user_id
    ORDER BY ts, event_id)``.  Implemented as a SEGMENTED distributed
    prefix scan (stages/events.py::grouped_running_sum): one sort, one
    O(blocks) mark pass to the driver, one broadcast-offset pass B —
    no per-user shuffle, nothing corpus-sized on the driver, output
    independent of block boundaries.  The building block for running
    balances, cumulative token budgets and per-source quota tracking
    at 100-TB scale."""
    from hsearch_ray.stages.events import grouped_running_sum

    return grouped_running_sum(
        _read(sf_dir, "events",
              columns=["event_id", "ts", "user_id", "value"])
    )


def q_approx_quantiles_events(sf_dir: str):
    """One-pass mergeable QUANTILE SUMMARY over the event values — the
    sketch complement of the exact histogram-recursion order statistic
    (`median_event_value`/`p90_event_value`): each block contributes
    every k-th order statistic of its sorted values with weight k
    (k = ceil(n_b/1024); the uniform epsilon-summary of Manku,
    Rajagopalan & Lindsay, SIGMOD'98), the driver merges the weighted
    samples, and any rank query is answered within sum_b k_b <= n/1024
    + blocks ranks — ONE pass, no shuffle, O(blocks x 1024) driver
    rows, where the exact recursion needs log passes over the data.
    Approximate by design -> rows-only driver check; the rank-error
    bound and the merge law are pinned by pytest.  Output: one row per
    requested quantile (q_ppm, value_cents)."""
    from hsearch_ray.stages.sketches import (
        quantile_summary_partial,
        quantile_summary_query,
    )

    qs = (0.25, 0.50, 0.75, 0.90, 0.99)
    ds = _read(sf_dir, "events", columns=["value"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        v, w = quantile_summary_partial(_cents(df["value"]), 1024)
        return pd.DataFrame({"v": v, "w": w})

    rows = ds.map_batches(_partial, batch_format="pandas",
                          batch_size=8192).to_pandas()
    if rows.empty:
        return pd.DataFrame({"q_ppm": pd.Series([], dtype="int64"),
                             "value_cents": pd.Series([], dtype="int64")})
    est = quantile_summary_query(
        rows["v"].to_numpy(np.int64), rows["w"].to_numpy(np.int64), qs
    )
    return pd.DataFrame({
        "q_ppm": pd.Series([int(q * 1_000_000) for q in qs], dtype="int64"),
        "value_cents": pd.Series(est.astype(np.int64), dtype="int64"),
    })


def q_user_moving_window(sf_dir: str):
    """Bounded moving-window aggregate — per event, the sum and count
    of the current + 3 preceding same-user event values in (ts,
    event_id) order: ``ROWS BETWEEN 3 PRECEDING AND CURRENT ROW``.
    Completes the window-frame matrix (UNBOUNDED running sum =
    `user_running_value`, time-RANGE band = `clicks_before_purchase`):
    the sliding de-noising / rate-feature window every feature
    pipeline needs.  Physical plan = the segmented prefix scan with a
    bounded VALUE carry: each sorted-block boundary hands at most 3
    trailing values of one user to its successor, O(blocks x 3) driver
    state (stages/events.py::grouped_rolling_window)."""
    from hsearch_ray.stages.events import grouped_rolling_window

    return grouped_rolling_window(
        _read(sf_dir, "events",
              columns=["event_id", "ts", "user_id", "value"]),
        k_prev=3,
    )


def q_set_join_pairs_docs(sf_dir: str):
    """Exact set-similarity self-join (AllPairs/PPJoin prefix
    filtering, Bayardo et al. WWW'07): every doc pair whose word-BIGRAM
    set Jaccard >= 1/2, with the exact intersection and union sizes —
    the guaranteed-recall-1 counterpart of the MinHash-LSH flagship
    (same candidate-then-verify shape, but the candidate superset is a
    theorem, not a probability).  Bigrams rather than unigrams because
    template-heavy corpora share most single words; threshold is the
    rational 1/2 evaluated in integers (2*inter >= union) so the
    oracle hash never touches a float.  Physical plan in
    stages/setjoin.py: df count -> sharded kv store, per-doc
    (df, hash)-ordered prefixes, the shared sorted-run pair machinery,
    sharded set store + per-pair searchsorted verify."""
    from hsearch_ray.stages.setjoin import (
        set_similarity_join,
        token_bigram_sets,
    )

    toks = token_bigram_sets(_read(sf_dir, "documents",
                                   columns=["doc_id", "text"]))
    return set_similarity_join(toks, num=1, den=2)


def q_similarity_pagerank_docs(sf_dir: str):
    """Boilerplate-hub detection: PageRank centrality over the document
    SIMILARITY graph (edges = exact word-UNIGRAM-set Jaccard >= 9/10
    via the prefix-filter join — at this threshold the template-heavy
    corpus shows real hub structure, degrees spanning two orders of
    magnitude), top 20 docs by rank.  The engine's ITERATIVE-algorithm
    representative: per iteration one edge pass probing the rank +
    degree kv stores and one distributed grouped sum — corpus-sized
    state never lands on the driver (stages/graph.py).  Rows-only BY
    DESIGN: a 10-round integer fixed point is not SQL-expressible; the
    pytest gate pins the distributed result bit-equal to a local
    reference with identical integer arithmetic and close to float
    power iteration."""
    from hsearch_ray.stages.graph import pagerank
    from hsearch_ray.stages.setjoin import (
        set_similarity_join,
        token_bigram_sets,
    )

    toks = token_bigram_sets(
        _read(sf_dir, "documents", columns=["doc_id", "text"]), ngram=1)
    pairs = set_similarity_join(toks, num=9, den=10)
    edges = pairs.map_batches(
        lambda t: t.select(["a", "b"]), batch_format="pyarrow")
    rank = pagerank(edges, iters=10)
    return rank.sort(["rank_units", "node"],
                     descending=[True, False]).limit(20)


def q_cube_lineitem(sf_dir: str):
    """Multi-dimensional aggregate (GROUP BY CUBE shape, the ROLLUP
    query's 2^d-grouping-set sibling): row count + quantity/price cent
    sums per (l_returnflag, l_linestatus), per-flag and per-status
    subtotals, and a grand total, with 'ALL' as the rolled-up key.  The
    heavy pass is ONE distributed partial aggregation at the finest
    grain; all four grouping sets derive from the (flags x statuses)-
    sized base on the driver — pure arithmetic on a table whose size is
    the key-domain product, not the corpus."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus",
                        "l_quantity", "l_extendedprice"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            "qty_c": _cents(df["l_quantity"]),
            "price_c": _cents(df["l_extendedprice"]),
        })

    base = grouped_agg(
        ds.map_batches(prep, batch_format="pandas", batch_size=65536),
        ["l_returnflag", "l_linestatus"],
        {"qty_c": ["sum"], "price_c": ["sum"]}, count_alias="n_rows",
    ).rename(columns={"qty_c__sum": "sum_qty_c", "price_c__sum": "sum_price_c"})
    aggs = ["n_rows", "sum_qty_c", "sum_price_c"]
    by_f = base.groupby("l_returnflag", as_index=False)[aggs].sum()
    by_f["l_linestatus"] = "ALL"
    by_s = base.groupby("l_linestatus", as_index=False)[aggs].sum()
    by_s["l_returnflag"] = "ALL"
    total = pd.DataFrame({"l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
                          **{c: [base[c].sum()] for c in aggs}})
    out = pd.concat([base, by_f, by_s, total], ignore_index=True)[
        ["l_returnflag", "l_linestatus"] + aggs
    ]
    for c in aggs:
        out[c] = out[c].astype("int64")
    return out


def q_mode_event_type(sf_dir: str):
    """Grouped MODE (argmax-by-join): each user's most frequent event
    type with its count, ties to the lexicographically smallest type.
    Works for UNBOUNDED group and value cardinality — three distributed
    passes, nothing corpus-sized on the driver: (1) per-(user, type)
    counts via the distributed grouped combine, (2) per-user max count,
    (3) a hash-shuffle join of counts against their group max + a final
    min-combine over the tied types.  The per-user result is returned
    as a Dataset, so at scale it streams straight to a sink."""
    from hsearch_ray.stages.agg import grouped_agg_ds

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    counts = grouped_agg_ds(ev, ["user_id", "event_type"], {},
                            count_alias="n")
    mx = grouped_agg_ds(counts, ["user_id"], {"n": ["max"]})
    num_partitions = default_num_partitions()
    joined = counts.join(
        mx, join_type="inner", num_partitions=num_partitions,
        on=("user_id",), right_on=("user_id",),
    )
    winners = joined.map_batches(
        lambda df: df.loc[
            df["n"].to_numpy() == df["n__max"].to_numpy(),
            ["user_id", "event_type", "n"],
        ],
        batch_format="pandas", batch_size=65536,
    )
    out = grouped_agg_ds(winners, ["user_id"],
                         {"event_type": ["min"], "n": ["max"]})
    return out.map_batches(
        lambda df: pd.DataFrame({
            "user_id": df["user_id"].to_numpy(dtype=np.int64),
            "mode_type": df["event_type__min"],
            "n_events": df["n__max"].to_numpy(dtype=np.int64),
        }),
        batch_format="pandas",
    )


def q_triangle_count_docs(sf_dir: str):
    """Triangle count over the document similarity graph (graph-level
    clustering-coefficient evidence beyond PageRank): edges are the
    EXACT bigram-set Jaccard >= 1/2 pairs (same definition as
    set_join_pairs_docs, recall 1 by the prefix-filter theorem), and
    the count is the classic two-join MapReduce formulation
    (stages/graph.py:triangle_count; the wedge/closure semantics are
    property-tested there on planted graphs).  Both joins are Dataset
    hash shuffles; only the single count lands on the driver."""
    from hsearch_ray.stages.graph import triangle_count
    from hsearch_ray.stages.setjoin import (
        set_similarity_join,
        token_bigram_sets,
    )

    toks = token_bigram_sets(_read(sf_dir, "documents",
                                   columns=["doc_id", "text"]))
    edges = set_similarity_join(toks, num=1, den=2).map_batches(
        lambda t: t.select(["a", "b"]), batch_format="pyarrow")
    return pd.DataFrame({"n_triangles": pd.array([triangle_count(edges)],
                                                 dtype="int64")})


def q_mad_value_by_type(sf_dir: str):
    """Per-group Median Absolute Deviation (robust dispersion — the
    order-statistic machinery COMPOSED twice): pass 1 resolves every
    group's exact median via the shared histogram recursion, the tiny
    per-group medians broadcast once, a map attaches |value - median|,
    and pass 2 runs the same recursion over the deviations.  Nothing
    O(rows) reaches the driver in either pass; both sides round the
    inner median to 6 before the deviation so the float expressions
    stay bit-identical."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    med = exact_order_stat_by_group(ds, "event_type", "value")
    mref = ray.put(dict(zip(med["event_type"], med["stat_value"])))

    def _dev(df: pd.DataFrame, mref=mref) -> pd.DataFrame:
        mm = ray.get(mref)
        med_arr = df["event_type"].map(mm).to_numpy(dtype=np.float64)
        return pd.DataFrame({
            "event_type": df["event_type"],
            "dev": np.abs(df["value"].to_numpy(dtype=np.float64) - med_arr),
        })

    devs = ds.map_batches(_dev, batch_format="pandas", batch_size=65536)
    out = exact_order_stat_by_group(devs, "event_type", "dev")
    return out.rename(columns={"stat_value": "mad_value"})


_EDIT_MAX = 8
# Completeness floor for the prefix-filter arm of the edit join: one
# byte edit changes at most 3 distinct word bigrams per side (a
# whitespace insert splits a token: removes 2, adds 3; a delete merges
# two: removes 3, adds 2; an in-token change swaps 2 for 2), so k edits
# give |A Δ B| <= 3k per side and J(A,B) >= (|A|-3k)/(|A|+3k).  That is
# >= 1/2 exactly when the unique-bigram count |A| >= 9k — docs BELOW
# the floor (including whitespace-edit and short-doc adversaries) can
# drop below the candidate threshold and MUST take the brute arm.
_EDIT_MIN_BIGRAMS = 9 * _EDIT_MAX


def _lev_banded(sa: bytes, sb: bytes, k: int) -> int:
    """Exact Levenshtein distance over UTF-8 BYTES (DuckDB's
    levenshtein() is byte-level) if it is <= k, else any value > k.
    Row-vectorized DP: the in-row insertion dependency cur[j] =
    min(..., cur[j-1]+1) resolves as a minimum.accumulate over
    (t[j] - j) — O(len_a) numpy row ops, no per-cell Python."""
    la, lb = len(sa), len(sb)
    if abs(la - lb) > k:
        return k + 1
    if la == 0 or lb == 0:
        return max(la, lb)
    a = np.frombuffer(sa, np.uint8)
    b = np.frombuffer(sb, np.uint8)
    # strip the common prefix and suffix (distance-preserving for
    # Levenshtein): near-identical docs then DP only over the small
    # differing middle instead of the full lengths
    n = min(la, lb)
    neq = a[:n] != b[:n]
    p = int(neq.argmax()) if neq.any() else n
    a, b = a[p:], b[p:]
    n2 = min(a.size, b.size)
    if n2:
        neq2 = a[-n2:] != b[-n2:]
        s = int(neq2[::-1].argmax()) if neq2.any() else n2
        if s:
            a, b = a[:-s], b[:-s]
    la, lb = a.size, b.size
    if la == 0 or lb == 0:
        return int(max(la, lb))
    idx = np.arange(1, lb + 1, dtype=np.int64)
    prev = np.arange(lb + 1, dtype=np.int64)
    for i in range(1, la + 1):
        cost = (b != a[i - 1]).astype(np.int64)
        t = np.minimum(prev[1:] + 1, prev[:-1] + cost)
        # cur[j] = min_{i<=j}(t[i] + (j - i)) resolves the in-row
        # insertion chain; the row head cur[0]=i propagates as i + j
        head = np.int64(i)
        cur = np.minimum.accumulate(t - idx) + idx
        cur = np.minimum(cur, head + idx)
        prev = np.concatenate(([head], cur))
        if prev.min() > k:
            return k + 1
    return int(prev[-1])


def q_edit_pairs_docs(sf_dir: str):
    """Bounded edit-distance self-join (the reference's alignment
    identity% analog at character grain): all doc pairs whose byte-level
    Levenshtein distance is <= 8, with the exact distance — COMPLETE,
    with the completeness split proved, not assumed:

    - Prefix-filter arm: bigram-set Jaccard >= 1/2 candidates
      (set_similarity_join), restricted to pairs where BOTH docs have
      >= _EDIT_MIN_BIGRAMS (= 9*k) unique bigrams.  Above that floor
      the candidate filter has recall exactly 1: one byte edit moves at
      most 3 distinct bigrams per side, so k edits keep
      J >= (|A|-3k)/(|A|+3k) >= 1/2 (see _EDIT_MIN_BIGRAMS).
    - Brute arm: every pair with at least one DEGENERATE side
      (< 9*k unique bigrams: short docs, whitespace-edit adversaries,
      highly repetitive docs) within the byte-length band |bl_a - bl_b|
      <= k (necessary for edit <= k).  The degenerate side is broadcast
      (ray.put) and probed per batch — the J2 broadcast-join pattern;
      at 100-TB scale an adversarially all-degenerate corpus would need
      the length-bucketed exchange instead (documented bound: the arm
      is O(|degenerate| x banded matches)).

    The arms are disjoint by construction (both-above-floor vs
    any-below-floor) and each emits every pair exactly once, so no
    global dedup barrier is needed.  Texts attach via two hash-shuffle
    joins; the banded DP runs per pair inside map_batches, each pair's
    DP fully row-vectorized."""
    from hsearch_ray.stages.setjoin import (
        _bigram_hashes,
        set_similarity_join,
        token_bigram_sets,
    )

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    # (doc_id, n unique bigrams, byte length) — one narrow pass
    def _meta(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        df = batch.to_pandas()
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        bl = pc.binary_length(
            batch["text"].cast(pa.large_binary())).to_numpy(
            zero_copy_only=False).astype(np.int64)
        bg, nbg = _bigram_hashes(df["text"])
        docrep = np.repeat(np.arange(ids.size, dtype=np.int64), nbg)
        order = np.lexsort((bg, docrep))
        d, v = docrep[order], bg[order]
        first = np.ones(d.size, dtype=bool)
        first[1:] = (d[1:] != d[:-1]) | (v[1:] != v[:-1])
        n = np.bincount(d[first], minlength=ids.size).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n": pa.array(n, pa.int64()),
                         "bl": pa.array(bl, pa.int64())})

    meta = docs.map_batches(_meta, batch_format="pyarrow").materialize()
    degen = meta.filter(expr=f"n < {_EDIT_MIN_BIGRAMS}") \
        .select_columns(["doc_id", "bl"]).to_pandas()
    by_bl = degen.sort_values(["bl", "doc_id"])
    degen_bl_ref = ray.put(by_bl["bl"].to_numpy(np.int64))
    degen_id_by_bl_ref = ray.put(by_bl["doc_id"].to_numpy(np.int64))
    degen_ids_ref = ray.put(np.sort(degen["doc_id"].to_numpy(np.int64)))

    # brute arm: probe every doc against the broadcast degenerate side
    def _arm2(batch: pa.Table) -> pa.Table:
        dbl = ray.get(degen_bl_ref)
        did = ray.get(degen_id_by_bl_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        bl = batch["bl"].to_numpy(zero_copy_only=False)
        lo = np.searchsorted(dbl, bl - _EDIT_MAX, side="left")
        hi = np.searchsorted(dbl, bl + _EDIT_MAX, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return pa.schema([("a", pa.int64()),
                              ("b", pa.int64())]).empty_table()
        cum0 = np.concatenate([np.zeros(1, np.int64), np.cumsum(cnt)])
        row = np.repeat(np.arange(ids.size, dtype=np.int64), cnt)
        within = np.arange(total, dtype=np.int64) - cum0[row]
        x = did[lo[row] + within]
        y = ids[row]
        y_degen = n[row] < _EDIT_MIN_BIGRAMS
        # exactly-once emission: vs a non-degenerate y emit every match;
        # a both-degenerate pair emits only when y is the larger id
        keep = np.where(y_degen, x < y, x != y)
        x, y = x[keep], y[keep]
        return pa.table({"a": pa.array(np.minimum(x, y), pa.int64()),
                         "b": pa.array(np.maximum(x, y), pa.int64())})

    arm2 = meta.map_batches(_arm2, batch_format="pyarrow")

    # prefix-filter arm, restricted to both-above-floor pairs; the
    # byte-length band |bl_a - bl_b| <= k (necessary for edit <= k) is
    # applied HERE via the sharded kv store, before the expensive
    # text-attach joins + DP — template corpora emit many same-shape
    # Jaccard>=1/2 pairs whose lengths already rule them out
    from hsearch_ray.stages.lsh import _kv_lookup, build_kv_store

    bl_store_ref = ray.put(build_kv_store(
        meta.select_columns(["doc_id", "bl"]), "doc_id", "bl"))
    toks = token_bigram_sets(docs)

    def _both_big(batch: pa.Table) -> pa.Table:
        from hsearch_ray.stages.verify import _in_sorted

        dg = ray.get(degen_ids_ref)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        keep = ~_in_sorted(dg, a) & ~_in_sorted(dg, b)
        look = _kv_lookup(bl_store_ref)
        bla, oka = look.lookup(a)
        blb, okb = look.lookup(b)
        keep &= oka & okb & (np.abs(bla - blb) <= _EDIT_MAX)
        return batch.select(["a", "b"]).filter(pa.array(keep))

    arm1 = set_similarity_join(toks, num=1, den=2).map_batches(
        _both_big, batch_format="pyarrow")
    edges = arm1.union(arm2)
    num_partitions = default_num_partitions()
    da = docs.rename_columns(["a_id", "text_a"])
    j1 = edges.join(da, join_type="inner", num_partitions=num_partitions,
                    on=("a",), right_on=("a_id",))
    # schema barrier before the second chained join (graph.py note)
    j1 = j1.repartition(num_partitions)
    db = docs.rename_columns(["b_id", "text_b"])
    j2 = j1.join(db, join_type="inner", num_partitions=num_partitions,
                 on=("b",), right_on=("b_id",))

    def _dist(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_d = [], [], []
        for a_, b_, ta, tb in zip(df["a"], df["b"], df["text_a"],
                                  df["text_b"]):
            d = _lev_banded(ta.encode(), tb.encode(), _EDIT_MAX)
            if d <= _EDIT_MAX:
                out_a.append(a_)
                out_b.append(b_)
                out_d.append(d)
        return pd.DataFrame({
            "a": pd.array(out_a, dtype="int64"),
            "b": pd.array(out_b, dtype="int64"),
            "edit_dist": pd.array(out_d, dtype="int64"),
        })

    return j2.map_batches(_dist, batch_format="pandas", batch_size=4096)


def q_approx_users_by_type(sf_dir: str):
    """GROUPED HyperLogLog: approximate distinct users per event_type —
    the mergeable sketch composed with grouped aggregation.  Each block
    contributes one 2^p-byte register row PER GROUP PRESENT IN THE
    BLOCK (O(types) rows per block, user ids never shuffle); the driver
    max-merges per group over O(blocks x types) rows.  Rows-only by
    design (approximate); the pytest pins per-group accuracy against
    exact nunique and run-to-run determinism.  The small-range
    linear-counting correction makes low-cardinality groups near-exact."""
    import polars as pl

    from hsearch_ray.stages.sketches import hll_estimate, hll_merge, hll_partial

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        out_t, out_r = [], []
        for et, g in df.groupby("event_type", sort=False):
            h = pl.from_pandas(
                g["user_id"].astype("int64")).hash(seed=7).to_numpy()
            out_t.append(et)
            out_r.append(hll_partial(h, p=_HLL_P).tobytes())
        return pd.DataFrame({"event_type": out_t, "regs": out_r})

    rows = ds.map_batches(_partial, batch_format="pandas",
                          batch_size=65536).to_pandas()
    recs = []
    for et, g in rows.groupby("event_type", sort=True):
        merged = hll_merge(np.stack(
            [np.frombuffer(b, dtype=np.uint8) for b in g["regs"]]))
        recs.append((et, hll_estimate(merged)))
    return pd.DataFrame({
        "event_type": [r[0] for r in recs],
        "approx_users": pd.array([r[1] for r in recs], dtype="int64"),
    })


def q_degree_histogram_docs(sf_dir: str):
    """Degree distribution of the document similarity graph (hub/skew
    telemetry at graph grain — the structural companion of the LSH
    bucket histogram): per-node degree over the exact bigram-Jaccard
    >= 1/2 edge set, then node counts per degree.  Two distributed
    grouped combines (node grain, then degree grain); the final
    histogram is degree-domain-sized, never corpus-sized."""
    from hsearch_ray.stages.agg import grouped_agg_ds
    from hsearch_ray.stages.setjoin import (
        set_similarity_join,
        token_bigram_sets,
    )

    toks = token_bigram_sets(_read(sf_dir, "documents",
                                   columns=["doc_id", "text"]))
    edges = set_similarity_join(toks, num=1, den=2)

    def _ends(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([a, b]), pa.int64())})

    deg = grouped_agg_ds(edges.map_batches(_ends, batch_format="pyarrow"),
                         ["node"], {}, count_alias="deg")
    out = grouped_agg(deg, ["deg"], {}, count_alias="n_nodes")
    out["deg"] = out["deg"].astype("int64")
    out["n_nodes"] = out["n_nodes"].astype("int64")
    return out


def q_throttle_events(sf_dir: str):
    """Stream-throttle dedup: events surviving a 1-hour same-(user,
    type) LAG debounce (stages/events.py:throttle_events — the
    repeated-notification suppression every event pipeline runs before
    training on interaction data)."""
    from hsearch_ray.stages.events import throttle_events

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "ts"])
    return throttle_events(ds)


_Q3_CUTOFF = "1998-06-01"


def q_top_building_orders(sf_dir: str):
    """TPC-H Q3 shape (shipping priority): top-10 unshipped-revenue
    orders for the BUILDING segment — the engine's CHAINED big x big
    join: lineitem-revenue partials ⋈ orders on orderkey, then ⋈
    customer on custkey, are BOTH corpus-scale hash-shuffle joins
    (customer is NOT broadcast — the segment filter is applied inside
    the join's own shuffle, so the plan survives a customer table that
    outgrows any single node).  Filters prune at the map stage before
    either shuffle; revenue is int cents per row (float discipline);
    top-10 rides the distributed sort + limit."""
    from hsearch_ray.stages.agg import grouped_agg_ds

    cutoff = np.datetime64(_Q3_CUTOFF, "us")
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])

    def _rev(df: pd.DataFrame) -> pd.DataFrame:
        m = df["l_shipdate"].to_numpy().astype("datetime64[us]") > cutoff
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(dtype=np.int64)[m],
            "rev_c": _cents(df["l_extendedprice"].to_numpy()[m]
                            * (1.0 - df["l_discount"].to_numpy()[m])),
        })

    per_order = grouped_agg_ds(
        li.map_batches(_rev, batch_format="pandas", batch_size=65536),
        ["l_orderkey"], {"rev_c": ["sum"]},
    )

    def _ord(df: pd.DataFrame) -> pd.DataFrame:
        dts = df["o_orderdate"].to_numpy().astype("datetime64[us]")
        m = dts < cutoff
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(dtype=np.int64)[m],
            "o_custkey": df["o_custkey"].to_numpy(dtype=np.int64)[m],
            "date_us": dts[m].astype(np.int64),
            "o_orderpriority": df["o_orderpriority"].to_numpy()[m],
        })

    okeys = _read(sf_dir, "orders",
                  columns=["o_orderkey", "o_custkey", "o_orderdate",
                           "o_orderpriority"]).map_batches(
        _ord, batch_format="pandas", batch_size=65536)
    num_partitions = default_num_partitions()
    j1 = per_order.join(
        okeys, join_type="inner", num_partitions=num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    # schema barrier before chaining a second join (see
    # stages/graph.py:triangle_count): empty join partitions emit
    # empty-schema bundles the next join's key FieldRefs can't resolve
    j1 = j1.repartition(num_partitions)

    def _seg(df: pd.DataFrame) -> pd.DataFrame:
        m = df["c_mktsegment"].to_numpy() == "BUILDING"
        return pd.DataFrame(
            {"c_custkey": df["c_custkey"].to_numpy(dtype=np.int64)[m]})

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"]).map_batches(
        _seg, batch_format="pandas", batch_size=65536)
    j2 = j1.join(
        cust, join_type="inner", num_partitions=num_partitions,
        on=("o_custkey",), right_on=("c_custkey",),
    )
    return (
        j2.map_batches(
            lambda df: pd.DataFrame({
                "l_orderkey": df["l_orderkey"].to_numpy(dtype=np.int64),
                "rev_c": df["rev_c__sum"].to_numpy(dtype=np.int64),
                "date_us": df["date_us"].to_numpy(dtype=np.int64),
                "o_orderpriority": df["o_orderpriority"],
            }),
            batch_format="pandas",
        )
        .sort(["rev_c", "l_orderkey"], descending=[True, False])
        .limit(10)
    )


QUERIES = {
    # --- driver window (first 50): oracle-bearing queries chosen for
    # operator-family breadth; the driver checks the registry head in
    # order, so every row here carries a DuckDB oracle ---
    "exact_dedup_docs": q_exact_dedup_docs,
    "exact_dup_pairs_docs": q_exact_dup_pairs_docs,
    "near_dup_clusters_docs": q_near_dup_clusters_docs,
    "near_dup_pairs_docs": q_near_dup_pairs_docs,
    "containment_pairs_docs": q_containment_pairs_docs,
    "recall_eval_docs": q_recall_eval_docs,
    "incremental_dedup_docs": q_incremental_dedup_docs,
    "decontaminate_docs": q_decontaminate_docs,
    "line_dedup_docs": q_line_dedup_docs,
    "dup_ngram_docs": q_dup_ngram_docs,
    "cut_dup_spans_docs": q_cut_dup_spans_docs,
    "set_join_pairs_docs": q_set_join_pairs_docs,
    "edit_pairs_docs": q_edit_pairs_docs,
    "keep_best_docs": q_keep_best_docs,
    "preprocess_corpus_docs": q_preprocess_corpus_docs,
    "bm25_search_docs": q_bm25_search_docs,
    "boolean_search_docs": q_boolean_search_docs,
    "tfidf_docs": q_tfidf_docs,
    "token_count_docs": q_token_count_docs,
    "quality_docs": q_quality_docs,
    "langid_docs": q_langid_docs,
    "repetition_docs": q_repetition_docs,
    "tsv_lang_count_docs": q_tsv_lang_count_docs,
    "jsonl_token_count_docs": q_jsonl_token_count_docs,
    "ipc_roundtrip_docs": q_ipc_roundtrip_docs,
    "warc_roundtrip_docs": q_warc_roundtrip_docs,
    "q1_pricing_summary": q1_pricing_summary,
    "orders_by_nation": q_orders_by_nation,
    "revenue_by_nation": q_revenue_by_nation,
    "customer_order_distribution": q_customer_order_distribution,
    "top_building_orders": q_top_building_orders,
    "inactive_customers": q_inactive_customers,
    "supplier_part_stats": q_supplier_part_stats,
    "cube_lineitem": q_cube_lineitem,
    "median_value_by_type": q_median_value_by_type,
    "mad_value_by_type": q_mad_value_by_type,
    "mode_event_type": q_mode_event_type,
    "session_stats": q_session_stats,
    "hourly_events": q_hourly_events,
    "funnel_events": q_funnel_events,
    "throttle_events": q_throttle_events,
    "clicks_before_purchase": q_clicks_before_purchase,
    "purchase_attribution": q_purchase_attribution,
    "user_moving_window": q_user_moving_window,
    "split_docs": q_split_docs,
    "weighted_sample_events": q_weighted_sample_events,
    "sample_events": q_sample_events,
    "ann_topk": q_ann_topk,
    "embedding_dup_pairs": q_embedding_dup_pairs,
    "triangle_count_docs": q_triangle_count_docs,
    # --- remaining oracle-bearing queries (driver-uncovered; checked
    # by tools/oracle_check.py and the pytest suite) ---
    "lang_count_docs": q_lang_count_docs,
    "top_orders": q_top_orders,
    "distinct_segments": q_distinct_segments,
    "filter_agg_events": q_filter_agg_events,
    "events_by_day": q_events_by_day,
    "cluster_radius_docs": q_cluster_radius_docs,
    "explode_lines_docs": q_explode_lines_docs,
    "user_first_event": q_user_first_event,
    "corpus_stats_docs": q_corpus_stats_docs,
    "median_event_value": q_median_event_value,
    "cluster_stats_docs": q_cluster_stats_docs,
    "p90_event_value": q_p90_event_value,
    "top_tokens_docs": q_top_tokens_docs,
    "top_orders_by_segment": q_top_orders_by_segment,
    "hopping_events": q_hopping_events,
    "minmax_norm_events": q_minmax_norm_events,
    "frequent_tokens_docs": q_frequent_tokens_docs,
    "hash_sample_events": q_hash_sample_events,
    "cap_per_source_docs": q_cap_per_source_docs,
    "scrub_docs": q_scrub_docs,
    "mix_sources_docs": q_mix_sources_docs,
    "pack_sequences_docs": q_pack_sequences_docs,
    "shuffle_rank_docs": q_shuffle_rank_docs,
    "quantile_filter_docs": q_quantile_filter_docs,
    "stopword_docs": q_stopword_docs,
    "bpe_token_count_docs": q_bpe_token_count_docs,
    "event_transitions": q_event_transitions,
    "active_users_hourly": q_active_users_hourly,
    "large_orders": q_large_orders,
    "lang_source_rollup": q_lang_source_rollup,
    "label_centroids": q_label_centroids,
    "embedding_outliers": q_embedding_outliers,
    "json_props_stats": q_json_props_stats,
    "urgent_orders_by_month": q_urgent_orders_by_month,
    "events_profile": q_events_profile,
    "streaming_session_stats": q_streaming_session_stats,
    "text_search_docs": q_text_search_docs,
    "user_running_value": q_user_running_value,
    "corpus_diff_docs": q_corpus_diff_docs,
    "chunk_docs": q_chunk_docs,
    "degree_histogram_docs": q_degree_histogram_docs,
    # --- rows-only arms: approximate / engine-specific by design, no
    # SQL oracle exists; each is accuracy-gated in pytest ---
    "simhash_docs": q_simhash_docs,
    "lsh_bucket_histogram": q_lsh_bucket_histogram,
    "simhash_dup_pairs_docs": q_simhash_dup_pairs_docs,
    "embedding_dup_pairs_lsh": q_embedding_dup_pairs_lsh,
    "ann_topk_lsh": q_ann_topk_lsh,
    "ann_topk_ivf": q_ann_topk_ivf,
    "semantic_dup_pairs": q_semantic_dup_pairs,
    "approx_distinct_tokens": q_approx_distinct_tokens,
    "compression_ratio_docs": q_compression_ratio_docs,
    "ann_topk_pq": q_ann_topk_pq,
    "media_features_docs": q_media_features_docs,
    "frame_sample_docs": q_frame_sample_docs,
    "similarity_pagerank_docs": q_similarity_pagerank_docs,
    "approx_quantiles_events": q_approx_quantiles_events,
    "approx_quantiles_by_type": q_approx_quantiles_by_type,
    "approx_users_by_type": q_approx_users_by_type,
}


def _langid_sql() -> str:
    def cnt(p: str) -> str:
        return f"(length(text) - length(replace(text, '{p}', ''))) / {len(p)}"

    c = {
        lang: " + ".join(cnt(m) for m in ms)
        for lang, ms in textstats.LANG_MARKERS.items()
    }
    return f"""
WITH scored AS (
  SELECT doc_id,
         {c['en']} AS c_en, {c['de']} AS c_de, {c['fr']} AS c_fr, {c['es']} AS c_es
  FROM documents
)
SELECT doc_id,
  CASE
    WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es AND c_en > 0 THEN 'en'
    WHEN c_de >= c_fr AND c_de >= c_es AND c_de > 0 THEN 'de'
    WHEN c_fr >= c_es AND c_fr > 0 THEN 'fr'
    WHEN c_es > 0 THEN 'es'
    ELSE 'other'
  END AS predicted
FROM scored
"""


# Shared SQL fragment: k-char shingle sets over CRLF-normalized text —
# the DuckDB mirror of hashing.shingle_hashes (set semantics are hash
# independent: jaccard/containment over 64-bit-hashed shingle sets equal
# the string-set values absent a hash collision, ~1e-13 at these sizes).
# Mirrors the reference's evaluator-in-the-binary discipline
# (motif_both_points.cpp:383-386): the exact pair relation is computed
# alongside the LSH path and must agree.  The LSH path's recall on the
# driver data is exactly 1.0 (pairs sit at j >= 0.92 vs threshold 0.7;
# P[miss] < 1e-4 per pair, verified empirically at sf0.001 and sf0.01),
# so equality — not just recall — is asserted.
_SHINGLE_K = 9  # == PipelineConfig.shingle_k


def _shingle_pairs_cte(rep_only: bool) -> str:
    where = (
        "WHERE doc_id = rep_id AND length(text) >= 1" if rep_only else ""
    )
    return f"""
docs AS (
  SELECT doc_id, text, replace(text, chr(13) || chr(10), chr(10)) AS t
  FROM documents
),
rep AS (
  SELECT doc_id, text, t, min(doc_id) OVER (PARTITION BY text) AS rep_id
  FROM docs
),
pos AS (
  SELECT doc_id, t,
         unnest(generate_series(1, greatest(length(t) - {_SHINGLE_K - 1}, 1))) AS i
  FROM rep {where}
),
sh AS (SELECT DISTINCT doc_id, substr(t, i, {_SHINGLE_K}) AS s FROM pos),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)"""


_NEAR_DUP_PAIRS_SQL = f"""
WITH {_shingle_pairs_cte(rep_only=True)},
exact_pairs AS (
  SELECT rep_id AS a, doc_id AS b, CAST(1.0 AS DOUBLE) AS jaccard,
         'exact' AS method
  FROM rep WHERE doc_id <> rep_id
),
near_pairs AS (
  SELECT a, b,
         round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard,
         'minhash_lsh' AS method
  FROM inter
  JOIN sizes sa ON sa.doc_id = a
  JOIN sizes sb ON sb.doc_id = b
  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.7
)
SELECT a, b, jaccard, method FROM exact_pairs
UNION ALL
SELECT a, b, jaccard, method FROM near_pairs
"""

# Connected components of the full threshold graph (jaccard >= thr OR
# byte-identical text) via recursive min-label reachability.  The Ray
# pipeline's edge set (rep-to-dup exact edges + LSH pairs between reps)
# is a connectivity-equivalent subgraph, so components are identical.
_NEAR_DUP_CLUSTERS_SQL = f"""
WITH RECURSIVE {_shingle_pairs_cte(rep_only=False)},
e AS (
  SELECT a, b FROM inter
  JOIN sizes sa ON sa.doc_id = a
  JOIN sizes sb ON sb.doc_id = b
  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.7
  UNION
  SELECT rep_id AS a, doc_id AS b FROM rep WHERE doc_id <> rep_id
),
sym AS (SELECT a AS u, b AS v FROM e UNION SELECT b, a FROM e),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM docs
  UNION
  SELECT s.u, reach.r FROM reach JOIN sym s ON s.v = reach.id
)
SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
"""

_CLUSTER_STATS_SQL = f"""
WITH RECURSIVE {_shingle_pairs_cte(rep_only=False)},
e AS (
  SELECT a, b FROM inter
  JOIN sizes sa ON sa.doc_id = a
  JOIN sizes sb ON sb.doc_id = b
  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.7
  UNION
  SELECT rep_id AS a, doc_id AS b FROM rep WHERE doc_id <> rep_id
),
sym AS (SELECT a AS u, b AS v FROM e UNION SELECT b, a FROM e),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM docs
  UNION
  SELECT s.u, reach.r FROM reach JOIN sym s ON s.v = reach.id
),
clusters AS (
  SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
),
csizes AS (SELECT cluster_id, count(*) AS size FROM clusters GROUP BY cluster_id)
SELECT size, count(*) AS n_clusters FROM csizes GROUP BY size
"""

_CONTAINMENT_PAIRS_SQL = f"""
WITH {_shingle_pairs_cte(rep_only=False)}
SELECT a, b,
       round(CAST(c AS DOUBLE) / least(sa.n, sb.n), 6) AS containment,
       'containment' AS method
FROM inter
JOIN sizes sa ON sa.doc_id = a
JOIN sizes sb ON sb.doc_id = b
WHERE CAST(c AS DOUBLE) / least(sa.n, sb.n) >= 0.5
"""


_RECALL_EVAL_SQL = f"""
WITH {_shingle_pairs_cte(rep_only=True)},
all_pairs AS (
  SELECT round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS j
  FROM inter
  JOIN sizes sa ON sa.doc_id = a
  JOIN sizes sb ON sb.doc_id = b
  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.7
  UNION ALL
  SELECT CAST(1.0 AS DOUBLE) FROM rep WHERE doc_id <> rep_id
)
SELECT CAST(floor(j * 10) AS BIGINT) AS bin, count(*) AS tp,
       CAST(0 AS BIGINT) AS fn
FROM all_pairs GROUP BY 1
"""

_CLUSTER_RADIUS_SQL = f"""
WITH RECURSIVE {_shingle_pairs_cte(rep_only=False)},
ej AS (
  SELECT a, b, round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS j
  FROM inter
  JOIN sizes sa ON sa.doc_id = a
  JOIN sizes sb ON sb.doc_id = b
  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.7
  UNION ALL
  SELECT rep_id, doc_id, CAST(1.0 AS DOUBLE) FROM rep WHERE doc_id <> rep_id
),
e AS (SELECT a, b FROM ej),
sym AS (SELECT a AS u, b AS v FROM e UNION SELECT b, a FROM e),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM docs
  UNION
  SELECT s.u, reach.r FROM reach JOIN sym s ON s.v = reach.id
),
clusters AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)
SELECT cl.cluster_id, round(max(1 - ej.j), 6) AS radius
FROM ej JOIN clusters cl ON cl.doc_id = ej.a
GROUP BY cl.cluster_id
"""


_STOPWORD_LIST_SQL = ", ".join(f"'{w}'" for w in textstats.STOPWORDS)
_BPE_RE_SQL = textstats.BPE_RE.replace("'", "''")

ORACLE_SQL = {
    "session_stats": """
        WITH e AS (
          SELECT user_id, ts, event_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
          FROM events
        ), m AS (
          SELECT *, CASE WHEN LAG(ts) OVER w IS NULL
                           OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 3600000000
                         THEN 1 ELSE 0 END AS ns
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM m
        )
        SELECT user_id, CAST(min(epoch_us(ts)) AS BIGINT) AS session_start_us,
               count(*) AS n_events, CAST(sum(vc) AS BIGINT) AS sum_value_c
        FROM s GROUP BY user_id, sid
    """,
    # the streaming sessionizer computes the SAME window semantics, so
    # it shares the batch oracle verbatim (see ORACLE_SQL assembly tail)
    "purchase_attribution": """
        SELECT p.event_id AS event_id,
               CAST(max(epoch_us(c.ts)) AS BIGINT) AS prior_ts_us
        FROM events p
        JOIN events c ON p.user_id = c.user_id AND c.ts < p.ts
                      AND c.event_type = 'click'
        WHERE p.event_type = 'purchase'
        GROUP BY p.event_id
    """,
    "recall_eval_docs": _RECALL_EVAL_SQL,
    "cluster_radius_docs": _CLUSTER_RADIUS_SQL,
    "tsv_lang_count_docs": """
        SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY lang
    """,
    "jsonl_token_count_docs": r"""
        SELECT doc_id, length(text) AS n_chars_rt,
               len(regexp_extract_all(text, '\S+')) AS n_tokens
        FROM documents
    """,
    "near_dup_pairs_docs": _NEAR_DUP_PAIRS_SQL,
    "near_dup_clusters_docs": _NEAR_DUP_CLUSTERS_SQL,
    "cluster_stats_docs": _CLUSTER_STATS_SQL,
    "containment_pairs_docs": _CONTAINMENT_PAIRS_SQL,
    "exact_dedup_docs": """
        SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        FROM documents GROUP BY text
    """,
    "exact_dup_pairs_docs": """
        SELECT d1.doc_id AS a, d2.doc_id AS b
        FROM documents d1 JOIN documents d2
          ON d1.text = d2.text AND d1.doc_id < d2.doc_id
    """,
    "token_count_docs": r"""
        SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens
        FROM documents
    """,
    "quality_docs": r"""
        SELECT doc_id,
               length(text) AS n_chars_calc,
               length(text) - length(replace(text, ' ', '')) AS n_spaces,
               len(regexp_extract_all(text, '\S+')) AS n_tokens,
               round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                     / greatest(len(regexp_extract_all(text, '\S+')), 1), 6) AS avg_token_len
        FROM documents
    """,
    "langid_docs": _langid_sql(),
    "lang_count_docs": """
        SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY lang
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c,
               CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_c,
               CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_c,
               count(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "orders_by_nation": """
        SELECT n.n_name AS nation, count(*) AS n_orders,
               CAST(sum(CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS total_c
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    "top_orders": """
        SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_c
        FROM orders ORDER BY price_c DESC, o_orderkey LIMIT 10
    """,
    "distinct_segments": """
        SELECT DISTINCT c_mktsegment FROM customer
    """,
    "filter_agg_events": """
        SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
        FROM events WHERE value >= 10 GROUP BY event_type
    """,
    "events_by_day": """
        SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n
        FROM events GROUP BY 1, 2
    """,
    "supplier_part_stats": """
        SELECT p_brand, count(*) AS n,
               CAST(min(p_size) AS BIGINT) AS min_size,
               CAST(max(p_size) AS BIGINT) AS max_size,
               CAST(sum(CAST(floor(p_retailprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_c
        FROM part GROUP BY p_brand
    """,
    "embedding_dup_pairs": """
        SELECT a.vec_id AS a, b.vec_id AS b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.45
    """,
    "ann_topk": """
        WITH sims AS (
          SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                 round(list_cosine_similarity(
                   CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS sim
          FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
          WHERE q.vec_id < 10
        )
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, neighbor_id) AS rn
          FROM sims
        ) WHERE rn <= 5
    """,
    "explode_lines_docs": r"""
        SELECT doc_id,
               generate_subscripts(string_split(text, chr(10)), 1) AS line_no,
               unnest(string_split(text, chr(10))) AS line
        FROM documents
    """,
    "user_first_event": """
        SELECT user_id,
               CAST(min(epoch_us(ts)) // 1000000 AS BIGINT) AS first_ts_s,
               count(*) AS n_events
        FROM events GROUP BY user_id
    """,
    "corpus_stats_docs": """
        SELECT count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               min(n_chars) AS min_chars,
               max(n_chars) AS max_chars
        FROM documents
    """,
    "median_event_value": """
        SELECT round(median(value), 6) AS median_value FROM events
    """,
    "p90_event_value": """
        SELECT round(value, 6) AS p90_value FROM events
        ORDER BY value
        LIMIT 1 OFFSET (SELECT (9*(count(*)-1))//10 FROM events)
    """,
    "top_tokens_docs": r"""
        SELECT token, count(*) AS n
        FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS token
              FROM documents)
        GROUP BY token ORDER BY n DESC, token LIMIT 20
    """,
    "top_orders_by_segment": """
        SELECT segment, o_orderkey, price_c, rnk FROM (
          SELECT c.c_mktsegment AS segment, o.o_orderkey,
                 CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT) AS price_c,
                 row_number() OVER (
                   PARTITION BY c.c_mktsegment
                   ORDER BY floor(o.o_totalprice*100 + 0.5) DESC, o.o_orderkey
                 ) AS rnk
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ) WHERE rnk <= 3
    """,
    "decontaminate_docs": f"""
        WITH docs AS (
          SELECT doc_id, replace(text, chr(13) || chr(10), chr(10)) AS t
          FROM documents
        ),
        pos AS (
          SELECT doc_id, t,
                 unnest(generate_series(1, greatest(length(t) - {_DECON_K - 1}, 1))) AS i
          FROM docs
        ),
        sh AS (SELECT DISTINCT doc_id, substr(t, i, {_DECON_K}) AS s FROM pos),
        hold AS (SELECT DISTINCT s FROM sh WHERE doc_id < {_DECON_HOLDOUT_MAX_ID}),
        hits AS (
          SELECT sh.doc_id, count(*) AS n_hits
          FROM sh JOIN hold ON sh.s = hold.s
          WHERE sh.doc_id >= {_DECON_HOLDOUT_MAX_ID}
          GROUP BY sh.doc_id
        )
        SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
               coalesce(h.n_hits, 0) > 0 AS contaminated
        FROM docs d LEFT JOIN hits h ON h.doc_id = d.doc_id
        WHERE d.doc_id >= {_DECON_HOLDOUT_MAX_ID}
    """,
    "inactive_customers": f"""
        SELECT c_mktsegment, count(*) AS n_inactive
        FROM customer
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM orders
            WHERE o_totalprice > {_INACTIVE_PRICE_BAR})
        GROUP BY c_mktsegment
    """,
    "hourly_events": """
        SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type,
               count(*) AS n,
               CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS sum_value_c
        FROM events GROUP BY 1, 2
    """,
    "minmax_norm_events": """
        WITH c AS (
          SELECT event_id, event_type,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
          FROM events
        ),
        w AS (
          SELECT event_id, event_type, vc,
                 MIN(vc) OVER (PARTITION BY event_type) AS mn,
                 MAX(vc) OVER (PARTITION BY event_type) AS mx
          FROM c
        )
        SELECT event_id, event_type,
               CAST(CASE WHEN mx = mn THEN 0
                    ELSE ((vc - mn) * 1000000) // (mx - mn)
                    END AS BIGINT) AS norm_ppm
        FROM w
    """,
    "hopping_events": """
        WITH e AS (
            SELECT epoch_us(ts) // 3600000000 AS b, event_type,
                   CAST(floor(value*100 + 0.5) AS BIGINT) AS vc
            FROM events
        )
        SELECT e.b - off.o AS window_start_hour, event_type,
               count(*) AS n, CAST(sum(vc) AS BIGINT) AS sum_value_c
        FROM e CROSS JOIN (VALUES (0), (1), (2)) AS off(o)
        GROUP BY 1, 2
    """,
    # exact heavy hitters: integer threshold total//512 + 1 in both engines
    "frequent_tokens_docs": r"""
        WITH tok AS (
            SELECT unnest(regexp_extract_all(text, '\S+')) AS token
            FROM documents
        ),
        n AS (SELECT count(*) AS total FROM tok)
        SELECT token, count(*) AS n FROM tok
        GROUP BY token
        HAVING count(*) >= (SELECT total // 512 FROM n) + 1
    """,
    "hash_sample_events": f"""
        SELECT event_id, user_id,
               CAST(floor(value*100 + 0.5) AS BIGINT) AS value_c
        FROM events
        WHERE (CAST(event_id AS HUGEINT) * {_SAMPLE_MULT}) % 4294967296
              < {_SAMPLE_THRESHOLD}
    """,
    "sample_events": f"""
        SELECT event_id FROM events
        ORDER BY (CAST(event_id AS HUGEINT) * {_SAMPLE_MULT2}) % 4294967296,
                 event_id
        LIMIT 100
    """,
    "split_docs": f"""
        SELECT doc_id,
               CASE WHEN h < {_SPLIT_TRAIN} THEN 'train'
                    WHEN h < {_SPLIT_VAL} THEN 'val'
                    ELSE 'test' END AS split
        FROM (
          SELECT doc_id,
                 (CAST(doc_id AS HUGEINT) * {_SAMPLE_MULT}) % 4294967296 AS h
          FROM documents
        )
    """,
    "weighted_sample_events": f"""
        SELECT event_id, user_id, CAST(value_c AS BIGINT) AS value_c FROM (
          SELECT event_id, user_id,
                 CAST(floor(value*100 + 0.5) AS HUGEINT) AS value_c,
                 (CAST(event_id AS HUGEINT) * {_SAMPLE_MULT}) % 4294967296 AS h
          FROM events
        )
        WHERE h * {_PPS_SCALE_C} < value_c * 4294967296
    """,
    "cap_per_source_docs": f"""
        SELECT source, doc_id, rnk FROM (
          SELECT source, doc_id,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY (CAST(doc_id AS HUGEINT) * {_SAMPLE_MULT})
                            % 4294967296, doc_id
                 ) AS rnk
          FROM documents
        ) WHERE rnk <= {_CAP_PER_SOURCE}
    """,
    "incremental_dedup_docs": f"""
        WITH docs AS (
          SELECT doc_id, replace(text, chr(13) || chr(10), chr(10)) AS t
          FROM documents
        ),
        pos AS (
          SELECT doc_id, t,
                 unnest(generate_series(1, greatest(length(t) - {_SHINGLE_K - 1}, 1))) AS i
          FROM docs
        ),
        sh AS (SELECT DISTINCT doc_id, substr(t, i, {_SHINGLE_K}) AS s FROM pos),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
          FROM sh x JOIN sh y ON x.s = y.s
          WHERE x.doc_id < {_INCR_SPLIT} AND y.doc_id >= {_INCR_SPLIT}
          GROUP BY x.doc_id, y.doc_id
        ),
        cr AS (
          SELECT a, b, round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS j
          FROM inter
          JOIN sizes sa ON sa.doc_id = a
          JOIN sizes sb ON sb.doc_id = b
          WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.7
        ),
        mx AS (
          SELECT b, count(*) AS n_matches, max(j) AS best_jaccard
          FROM cr GROUP BY b
        ),
        bm AS (
          SELECT cr.b, min(cr.a) AS best_match
          FROM cr JOIN mx ON cr.b = mx.b AND cr.j = mx.best_jaccard
          GROUP BY cr.b
        )
        SELECT d.doc_id,
               coalesce(mx.n_matches, 0) AS n_matches,
               coalesce(bm.best_match, -1) AS best_match,
               coalesce(mx.best_jaccard, 0.0) AS best_jaccard,
               coalesce(mx.n_matches, 0) > 0 AS is_dup
        FROM docs d
        LEFT JOIN mx ON mx.b = d.doc_id
        LEFT JOIN bm ON bm.b = d.doc_id
        WHERE d.doc_id >= {_INCR_SPLIT}
    """,
    "preprocess_corpus_docs": f"""
        WITH RECURSIVE docs0 AS (
          SELECT doc_id, text, n_chars,
                 replace(text, chr(13) || chr(10), chr(10)) AS t
          FROM documents
        ),
        docs AS (SELECT * FROM docs0 WHERE n_chars >= {_PREPROC_MIN_CHARS}),
        rep AS (
          SELECT doc_id, text, t,
                 min(doc_id) OVER (PARTITION BY text) AS rep_id
          FROM docs
        ),
        pos AS (
          SELECT doc_id, t,
                 unnest(generate_series(1, greatest(length(t) - {_SHINGLE_K - 1}, 1))) AS i
          FROM rep
        ),
        sh AS (SELECT DISTINCT doc_id, substr(t, i, {_SHINGLE_K}) AS s FROM pos),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
          FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
          GROUP BY x.doc_id, y.doc_id
        ),
        e AS (
          SELECT a, b FROM inter
          JOIN sizes sa ON sa.doc_id = a
          JOIN sizes sb ON sb.doc_id = b
          WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.7
          UNION
          SELECT rep_id AS a, doc_id AS b FROM rep WHERE doc_id <> rep_id
        ),
        sym AS (SELECT a AS u, b AS v FROM e UNION SELECT b, a FROM e),
        reach(id, r) AS (
          SELECT doc_id, doc_id FROM docs
          UNION
          SELECT s.u, reach.r FROM reach JOIN sym s ON s.v = reach.id
        ),
        comp AS (SELECT id AS doc_id, min(r) AS rep_id FROM reach GROUP BY id)
        SELECT d.doc_id,
               CASE WHEN d.n_chars < {_PREPROC_MIN_CHARS} THEN 'short'
                    WHEN c.rep_id <> d.doc_id THEN 'dup'
                    ELSE 'kept' END AS status,
               coalesce(c.rep_id, -1) AS rep_id
        FROM docs0 d LEFT JOIN comp c ON c.doc_id = d.doc_id
    """,
    "revenue_by_nation": """
        WITH per_order AS (
          SELECT l_orderkey,
                 CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                                     + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
          FROM lineitem GROUP BY l_orderkey
        )
        SELECT n_name,
               CAST(sum(rev_c) AS BIGINT) AS revenue_cents,
               count(*) AS n_orders
        FROM per_order
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "customer_order_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    "median_value_by_type": """
        SELECT event_type, round(median(value), 6) AS median_value
        FROM events GROUP BY event_type
    """,
    "repetition_docs": f"""
        WITH g AS (
          SELECT doc_id, substr(text, CAST(i AS INTEGER), {_REP_K}) AS gram
          FROM documents,
               LATERAL unnest(range(1, length(text) - {_REP_K - 2})) AS t(i)
          WHERE length(text) >= {_REP_K}
        ),
        per AS (
          SELECT doc_id, count(*) AS n, count(DISTINCT gram) AS d
          FROM g GROUP BY doc_id
        )
        SELECT doc_id,
               CAST(n AS BIGINT) AS n_grams,
               CAST(n - d AS BIGINT) AS n_dup_grams,
               ((n - d) * {_REP_DEN} > n * {_REP_NUM}) AS is_repetitive
        FROM per
    """,
    "stopword_docs": f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(text, '\\s+')) AS tok
          FROM documents
        ),
        per AS (
          SELECT doc_id, count(*) AS n_tokens,
                 CAST(sum(CASE WHEN lower(tok) IN ({_STOPWORD_LIST_SQL})
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
          FROM toks WHERE tok <> '' GROUP BY doc_id
        )
        SELECT doc_id, n_tokens, n_stop,
               round(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stop_ratio
        FROM per
    """,
    "bpe_token_count_docs": f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{_BPE_RE_SQL}'))
                    AS BIGINT) AS n_bpe_tokens
        FROM documents
    """,
    "line_dedup_docs": """
        WITH lines AS (
          SELECT doc_id, unnest(string_split(text, chr(10))) AS line
          FROM documents
        ),
        c AS (
          SELECT line, count(*) AS cnt FROM lines GROUP BY line
        )
        SELECT l.doc_id,
               count(*) AS n_lines,
               CAST(sum(CASE WHEN c.cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup_lines
        FROM lines l JOIN c USING (line)
        GROUP BY l.doc_id
    """,
    "mix_sources_docs": f"""
        SELECT doc_id, lang FROM documents
        WHERE (CAST(doc_id AS HUGEINT) * {_SAMPLE_MULT}) % 4294967296
              < (CASE WHEN lang = 'en' THEN {1 << 30} ELSE {1 << 32} END)
    """,
    # integer-only: exclusive running sum of whitespace token counts in
    # doc_id order, then BIGINT floor-division by the sequence budget
    "pack_sequences_docs": rf"""
        WITH t AS (
            SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens
            FROM documents
        )
        SELECT doc_id, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS tok_offset,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) // {_PACK_BUDGET} AS seq_id
        FROM t
    """,
    "shuffle_rank_docs": f"""
        SELECT doc_id,
               ROW_NUMBER() OVER (
                   ORDER BY (CAST(doc_id AS HUGEINT) * {_SAMPLE_MULT})
                            % 4294967296, doc_id
               ) - 1 AS rank
        FROM documents
    """,
    # exact discrete quantile: the element at 0-indexed (n-1)//4 in
    # token-count order — integer-only, no interpolation
    "quantile_filter_docs": r"""
        WITH t AS (
            SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens
            FROM documents
        ),
        thr AS (
            SELECT n_tokens AS v FROM t ORDER BY n_tokens
            LIMIT 1 OFFSET (SELECT (COUNT(*) - 1) // 4 FROM t)
        )
        SELECT doc_id, n_tokens FROM t WHERE n_tokens >= (SELECT v FROM thr)
    """,
    # float discipline: the tf*ln(N/df) score is round(…, 6)-ed BEFORE
    # ranking in both engines and appears in NEITHER output
    "tfidf_docs": r"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS token
          FROM documents
        ),
        tf AS (SELECT doc_id, token, count(*) AS tf
               FROM toks GROUP BY doc_id, token),
        df AS (SELECT token, count(DISTINCT doc_id) AS df
               FROM toks GROUP BY token),
        n AS (SELECT count(*) AS n FROM documents),
        ranked AS (
          SELECT tf.doc_id, tf.token, tf.tf, df.df,
                 row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6)
                              DESC,
                            tf.token
                 ) AS rank
          FROM tf JOIN df USING (token), n
        )
        SELECT doc_id, CAST(rank AS BIGINT) AS rank, token,
               CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
        FROM ranked WHERE rank <= 3
    """,
    # same RE2 library on both sides (DuckDB and pyarrow both wrap RE2),
    # so pattern semantics — \\b word boundaries, alternation — agree
    "scrub_docs": f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{_SCRUB_PAT}')) AS BIGINT)
                 AS n_hits,
               CAST(length(regexp_replace(text, '{_SCRUB_PAT}',
                                          '{_SCRUB_REP}', 'g')) AS BIGINT)
                 AS scrubbed_len
        FROM documents
    """,
    "cut_dup_spans_docs": f"""
        WITH pos AS (
          SELECT doc_id,
                 unnest(generate_series(1, length(text) - {_DUP_NGRAM_K - 1}))
                   AS p
          FROM documents
          WHERE length(text) >= {_DUP_NGRAM_K}
        ),
        occ AS (
          SELECT p.doc_id, p.p, substr(d.text, p.p, {_DUP_NGRAM_K}) AS g
          FROM pos p JOIN documents d USING (doc_id)
        ),
        own AS (SELECT g, min(doc_id) AS owner FROM occ GROUP BY g),
        cuts AS (
          SELECT o.doc_id, o.p
          FROM occ o JOIN own w USING (g)
          WHERE w.owner <> o.doc_id
        ),
        chars AS (
          SELECT doc_id, unnest(generate_series(1, length(text))) AS cp
          FROM documents
          WHERE length(text) >= 1
        ),
        marked AS (
          SELECT c.doc_id, c.cp, count(t.p) > 0 AS covered
          FROM chars c LEFT JOIN cuts t
            ON t.doc_id = c.doc_id
           AND t.p BETWEEN c.cp - {_DUP_NGRAM_K - 1} AND c.cp
          GROUP BY c.doc_id, c.cp
        )
        SELECT d.doc_id,
               coalesce(string_agg(substr(d.text, m.cp, 1), ''
                                   ORDER BY m.cp)
                          FILTER (WHERE NOT m.covered), '') AS clean_text,
               CAST(coalesce(count(*) FILTER (WHERE m.covered), 0)
                    AS BIGINT) AS n_cut
        FROM documents d LEFT JOIN marked m USING (doc_id)
        GROUP BY d.doc_id
    """,
    "dup_ngram_docs": f"""
        WITH pos AS (
          SELECT doc_id,
                 unnest(generate_series(1, length(text) - {_DUP_NGRAM_K - 1}))
                   AS i
          FROM documents
          WHERE length(text) >= {_DUP_NGRAM_K}
        ),
        per AS (
          SELECT p.doc_id, substr(d.text, p.i, {_DUP_NGRAM_K}) AS g,
                 count(*) AS cnt
          FROM pos p JOIN documents d USING (doc_id)
          GROUP BY p.doc_id, g
        ),
        nd AS (SELECT g FROM per GROUP BY g HAVING count(*) >= 2)
        SELECT per.doc_id,
               CAST(count(*) AS BIGINT) AS dup_grams,
               CAST(sum(per.cnt) AS BIGINT) AS dup_positions
        FROM per JOIN nd USING (g)
        GROUP BY per.doc_id
    """,
    "event_transitions": """
        WITH seq AS (
          SELECT event_type AS next_type,
                 LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS prev_type
          FROM events
        )
        SELECT prev_type, next_type, count(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    """,
    "active_users_hourly": """
        SELECT epoch_us(ts) // 3600000000 AS hour_bucket,
               count(DISTINCT user_id) AS active_users
        FROM events GROUP BY 1
    """,
    "large_orders": f"""
        WITH s AS (
          SELECT l_orderkey,
                 CAST(sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT))
                      AS BIGINT) AS total_qty_c
          FROM lineitem GROUP BY l_orderkey
        )
        SELECT o_orderkey, o_custkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               total_qty_c
        FROM orders JOIN s ON o_orderkey = l_orderkey
        WHERE total_qty_c > {_LARGE_ORDER_MIN_QTY_C}
    """,
    "keep_best_docs": f"""
        WITH RECURSIVE {_shingle_pairs_cte(rep_only=False)},
        e AS (
          SELECT a, b FROM inter
          JOIN sizes sa ON sa.doc_id = a
          JOIN sizes sb ON sb.doc_id = b
          WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.7
          UNION
          SELECT rep_id AS a, doc_id AS b FROM rep WHERE doc_id <> rep_id
        ),
        sym AS (SELECT a AS u, b AS v FROM e UNION SELECT b, a FROM e),
        reach(id, r) AS (
          SELECT doc_id, doc_id FROM docs
          UNION
          SELECT s.u, reach.r FROM reach JOIN sym s ON s.v = reach.id
        ),
        comp AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
        m AS (
          SELECT comp.doc_id, comp.cluster_id, d.n_chars,
                 FIRST_VALUE(comp.doc_id) OVER (
                   PARTITION BY comp.cluster_id
                   ORDER BY d.n_chars DESC, comp.doc_id
                 ) AS keeper_id
          FROM comp JOIN documents d ON d.doc_id = comp.doc_id
        )
        SELECT doc_id, keeper_id,
               CAST(doc_id = keeper_id AS BIGINT) AS kept
        FROM m
    """,
    "clicks_before_purchase": """
        SELECT p.event_id,
               count(c.event_id) AS n_prior
        FROM events p LEFT JOIN events c
          ON c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
        WHERE p.event_type = 'purchase'
        GROUP BY p.event_id
    """,
    "lang_source_rollup": """
        SELECT coalesce(lang, 'ALL') AS lang,
               coalesce(source, 'ALL') AS source,
               count(n_chars) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        GROUP BY ROLLUP (lang, source)
    """,
    # the driver testdata embeds at a fixed 64 dims at every sf level;
    # the Ray side validates the width instead of assuming it
    "label_centroids": """
        SELECT CAST(label AS BIGINT) AS label, d.dim,
               CAST(sum(CAST(floor(CAST(embedding[d.dim + 1] AS DOUBLE)
                                   * 1000000 + 0.5)
                             AS BIGINT)) AS BIGINT) AS sum_milli,
               count(*) AS n_vecs
        FROM embeddings
        CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS dim) d
        GROUP BY 1, 2
    """,
    "json_props_stats": r"""
        WITH e AS (
          SELECT event_type,
                 TRY_CAST(NULLIF(regexp_extract(props,
                     '"k"\s*:\s*(-?\d+)', 1), '') AS BIGINT) AS k
          FROM events
        )
        SELECT event_type, count(*) AS n_events, count(k) AS n_k,
               CAST(sum(k) AS BIGINT) AS sum_k,
               CAST(min(k) AS BIGINT) AS min_k,
               CAST(max(k) AS BIGINT) AS max_k
        FROM e GROUP BY 1
    """,
    # same integer-kilo discipline as label_centroids: the Σ(n·x − s)²
    # > T·n² predicate is all-BIGINT on both sides, so the hash compare
    # is exact (no float centroid ever materializes)
    "embedding_outliers": """
        WITH k AS (
          SELECT CAST(vec_id AS BIGINT) AS vec_id,
                 CAST(label AS BIGINT) AS label, d.dim,
                 CAST(floor(CAST(embedding[d.dim + 1] AS DOUBLE)
                            * 1000 + 0.5) AS BIGINT) AS x
          FROM embeddings
          CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS dim) d
        ),
        c AS (
          SELECT label, dim, CAST(sum(x) AS BIGINT) AS s,
                 CAST(count(*) AS BIGINT) AS n
          FROM k GROUP BY 1, 2
        ),
        dist AS (
          SELECT k.vec_id, k.label,
                 CAST(sum((c.n * k.x - c.s) * (c.n * k.x - c.s))
                      AS BIGINT) AS d2n2,
                 max(c.n) AS n
          FROM k JOIN c ON k.label = c.label AND k.dim = c.dim
          GROUP BY 1, 2
        )
        SELECT vec_id, label, d2n2
        FROM dist WHERE d2n2 > 1020000 * n * n
    """,
    "urgent_orders_by_month": """
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               count(*) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_price_c
        FROM orders WHERE o_orderpriority = '1-URGENT'
        GROUP BY 1
    """,
    "events_profile": """
        WITH v AS (
          SELECT 'event_id' AS col, count(*) AS n_rows,
                 count(*) - count(event_id) AS n_nulls,
                 min(event_id) AS min_v, max(event_id) AS max_v
          FROM events
          UNION ALL
          SELECT 'user_id', count(*), count(*) - count(user_id),
                 min(user_id), max(user_id) FROM events
          UNION ALL
          SELECT 'ts_us', count(*), count(*) - count(ts),
                 min(epoch_us(ts)), max(epoch_us(ts)) FROM events
          UNION ALL
          SELECT 'value_c', count(*), count(*) - count(value),
                 CAST(min(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT),
                 CAST(max(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT)
          FROM events
        )
        SELECT col, n_rows, n_nulls,
               CAST(min_v AS BIGINT) AS min_v, CAST(max_v AS BIGINT) AS max_v
        FROM v
    """,
    "funnel_events": """
        WITH v AS (
          SELECT user_id, min(ts) AS vt FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
          SELECT e.user_id, min(e.ts) AS ct
          FROM events e JOIN v ON v.user_id = e.user_id
          WHERE e.event_type = 'click' AND e.ts > v.vt
          GROUP BY e.user_id
        ),
        p AS (
          SELECT e.user_id, min(e.ts) AS pt
          FROM events e JOIN c ON c.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.ct
          GROUP BY e.user_id
        )
        SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_users,
               (SELECT count(*) FROM v) AS n_viewed,
               (SELECT count(*) FROM c) AS n_clicked,
               (SELECT count(*) FROM p) AS n_purchased
    """,
    # no oracle (rows-only, approximate by design): semantic_dup_pairs
    # (k-means cluster-bounded candidates; recall pinned by pytest)
    # no oracle (rows-only, genuinely non-SQL-expressible): simhash_docs
    # (byte-level rolling-hash bit votes), lsh_bucket_histogram (depends
    # on the minhash family), ann_topk_lsh (approximate by design),
    # sample_events (engine-specific seeded shuffle)
}

# The streaming sessionizer is semantically identical to the batch
# sessionizer, so its oracle IS the batch oracle.
ORACLE_SQL["streaming_session_stats"] = ORACLE_SQL["session_stats"]

# Query-vs-corpus search: string-side shingle sets (the shingle-CTE
# hash-collision argument) between the deterministic query subset and
# every other doc, hits at jaccard >= threshold.
ORACLE_SQL["text_search_docs"] = f"""
WITH docs AS (
  SELECT doc_id, replace(text, chr(13) || chr(10), chr(10)) AS t
  FROM documents
),
pos AS (
  SELECT doc_id, t,
         unnest(generate_series(1, greatest(length(t) - {_SHINGLE_K - 1}, 1))) AS i
  FROM docs
),
sh AS (SELECT DISTINCT doc_id, substr(t, i, {_SHINGLE_K}) AS s FROM pos),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
q AS (SELECT doc_id FROM documents
      WHERE doc_id % {_SEARCH_MOD} = {_SEARCH_REM}),
inter AS (
  SELECT qs.doc_id AS query_id, ds.doc_id AS hit_id, count(*) AS c
  FROM sh qs
  JOIN q ON q.doc_id = qs.doc_id
  JOIN sh ds ON ds.s = qs.s AND ds.doc_id <> qs.doc_id
  GROUP BY 1, 2
)
SELECT query_id, hit_id,
       round(CAST(c AS DOUBLE) / (sq.n + sb.n - c), 6) AS jaccard
FROM inter
JOIN sizes sq ON sq.doc_id = query_id
JOIN sizes sb ON sb.doc_id = hit_id
WHERE CAST(c AS DOUBLE) / (sq.n + sb.n - c) >= {_SEARCH_THRESHOLD}
"""

# The IPC round-trip recomputes the same counts as the JSONL
# round-trip from a different wire format; same parquet-side oracle.
ORACLE_SQL["ipc_roundtrip_docs"] = ORACLE_SQL["jsonl_token_count_docs"]

# WARC round-trip: char + token counts like the other wire formats,
# plus the utf-8 BYTE count (DuckDB strlen = octet length) — the
# Content-Length walk must preserve every byte.
ORACLE_SQL["warc_roundtrip_docs"] = r"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_rt,
           CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
             AS n_tokens,
           CAST(strlen(text) AS BIGINT) AS n_bytes
    FROM documents
"""

# Cumulative window function: the segmented distributed prefix scan's
# oracle is the textbook SUM OVER (PARTITION BY ... ORDER BY ...) with
# the same per-row integer-cents discipline.
ORACLE_SQL["user_running_value"] = """
    SELECT event_id, user_id,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
    FROM events
"""

# Set-similarity join: same \S+ tokenizer as tfidf_docs; bigram = the
# two adjacent tokens joined by one space; Jaccard >= 1/2 in integers.
# shared by set_join_pairs_docs and (as the edge CTE) triangle_count_docs
_SET_JOIN_SQL = r"""
    WITH ll AS (
      SELECT doc_id, regexp_extract_all(text, '\S+') AS l FROM documents
    ),
    toks AS (
      SELECT DISTINCT doc_id, l[i] || ' ' || l[i + 1] AS tok
      FROM ll, unnest(generate_series(1, len(l) - 1)) AS t(i)
    ),
    sz AS (SELECT doc_id, count(*) AS s FROM toks GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n_common
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.a, i.b, CAST(i.n_common AS BIGINT) AS n_common,
           CAST(sa.s + sb.s - i.n_common AS BIGINT) AS n_union
    FROM inter i
    JOIN sz sa ON sa.doc_id = i.a
    JOIN sz sb ON sb.doc_id = i.b
    WHERE 2 * i.n_common >= (sa.s + sb.s - i.n_common)
"""
ORACLE_SQL["set_join_pairs_docs"] = _SET_JOIN_SQL

# each triangle x<y<z appears exactly once: edges are stored a<b, so the
# wedge join picks (x,y),(y,z) and the closure join checks (x,z)
ORACLE_SQL["triangle_count_docs"] = f"""
    WITH e AS (SELECT a, b FROM ({_SET_JOIN_SQL}))
    SELECT count(*) AS n_triangles
    FROM e e1
    JOIN e e2 ON e2.a = e1.b
    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
"""

ORACLE_SQL["degree_histogram_docs"] = f"""
    WITH e AS (SELECT a, b FROM ({_SET_JOIN_SQL})),
    d AS (
      SELECT node, count(*) AS deg FROM (
        SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e
      ) GROUP BY 1
    )
    SELECT CAST(deg AS BIGINT) AS deg, count(*) AS n_nodes
    FROM d GROUP BY 1
"""

ORACLE_SQL["throttle_events"] = """
    WITH x AS (
      SELECT event_id, ts,
             lag(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS pts
      FROM events
    )
    SELECT event_id FROM x
    WHERE pts IS NULL OR ts > pts + INTERVAL 1 HOUR
"""

ORACLE_SQL["mad_value_by_type"] = """
    WITH m AS (
      SELECT event_type, round(median(value), 6) AS med
      FROM events GROUP BY 1
    )
    SELECT e.event_type, round(median(abs(e.value - m.med)), 6) AS mad_value
    FROM events e JOIN m ON m.event_type = e.event_type
    GROUP BY e.event_type
"""

# DuckDB levenshtein() is byte-level over the UTF-8 encoding — the
# engine's _lev_banded kernel matches that convention exactly.  The
# candidate structure mirrors the engine's PROVEN-complete split (see
# q_edit_pairs_docs / _EDIT_MIN_BIGRAMS): prefix-filter arm for pairs
# where both docs clear the 9k unique-bigram floor, byte-length-banded
# brute arm for any pair with a degenerate side — together they cover
# every pair with levenshtein <= k, so this equals the true relation.
ORACLE_SQL["edit_pairs_docs"] = f"""
    WITH ll AS (
      SELECT doc_id, regexp_extract_all(text, '\\S+') AS l FROM documents
    ),
    toks AS (
      SELECT DISTINCT doc_id, l[i] || ' ' || l[i + 1] AS tok
      FROM ll, unnest(generate_series(1, len(l) - 1)) AS t(i)
    ),
    sz AS (SELECT doc_id, count(*) AS s FROM toks GROUP BY doc_id),
    meta AS (
      SELECT d.doc_id, coalesce(sz.s, 0) AS s,
             octet_length(encode(d.text)) AS bl
      FROM documents d LEFT JOIN sz ON sz.doc_id = d.doc_id
    ),
    inter AS (
      SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS c
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    arm1 AS (
      SELECT i.a, i.b FROM inter i
      JOIN meta ma ON ma.doc_id = i.a
      JOIN meta mb ON mb.doc_id = i.b
      WHERE 2 * i.c >= (ma.s + mb.s - i.c)
        AND ma.s >= {_EDIT_MIN_BIGRAMS} AND mb.s >= {_EDIT_MIN_BIGRAMS}
    ),
    arm2 AS (
      SELECT DISTINCT least(x.doc_id, y.doc_id) AS a,
                      greatest(x.doc_id, y.doc_id) AS b
      FROM meta x JOIN meta y
        ON x.doc_id <> y.doc_id AND abs(x.bl - y.bl) <= {_EDIT_MAX}
      WHERE x.s < {_EDIT_MIN_BIGRAMS}
    ),
    cand AS (SELECT a, b FROM arm1 UNION SELECT a, b FROM arm2)
    SELECT c.a, c.b,
           CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist
    FROM cand c
    JOIN documents da ON da.doc_id = c.a
    JOIN documents db ON db.doc_id = c.b
    WHERE levenshtein(da.text, db.text) <= {_EDIT_MAX}
"""

ORACLE_SQL["cube_lineitem"] = """
    SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
           coalesce(l_linestatus, 'ALL') AS l_linestatus,
           count(*) AS n_rows,
           CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_qty_c,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_price_c
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
"""

ORACLE_SQL["mode_event_type"] = """
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
    ),
    m AS (SELECT user_id, max(n) AS mx FROM c GROUP BY 1)
    SELECT c.user_id, min(c.event_type) AS mode_type,
           CAST(m.mx AS BIGINT) AS n_events
    FROM c JOIN m ON c.user_id = m.user_id AND c.n = m.mx
    GROUP BY c.user_id, m.mx
"""

ORACLE_SQL["top_building_orders"] = f"""
    WITH r AS (
      SELECT l_orderkey,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                                 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
      FROM lineitem
      WHERE l_shipdate > TIMESTAMP '{_Q3_CUTOFF}'
      GROUP BY 1
    )
    SELECT r.l_orderkey, r.rev_c,
           CAST(epoch_us(o.o_orderdate) AS BIGINT) AS date_us,
           o.o_orderpriority
    FROM r
    JOIN orders o ON o.o_orderkey = r.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE o.o_orderdate < TIMESTAMP '{_Q3_CUTOFF}'
      AND c.c_mktsegment = 'BUILDING'
    ORDER BY r.rev_c DESC, r.l_orderkey
    LIMIT 10
"""

ORACLE_SQL["user_moving_window"] = """
    SELECT event_id, user_id,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS w_sum_c,
           CAST(COUNT(*) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS w_n
    FROM events
"""

# BM25: the VALUES-CTE query set is generated from _BM25_QUERIES so the
# two sides can never drift; per-term contributions quantize to integer
# micro-units BEFORE the cross-term sum (float-order-free hash).
_BM25_VALUES = ", ".join(
    f"({qid}, '{t}')" for qid, ts in _BM25_QUERIES for t in ts
)
# Boolean AND retrieval: VALUES CTE generated from the SAME constant as
# the engine side, exact whole-token semantics via list_has_all.
ORACLE_SQL["boolean_search_docs"] = (
    "WITH q(query_id, terms) AS (VALUES "
    + ", ".join(
        "({}, [{}])".format(qid, ", ".join(f"'{t}'" for t in ts))
        for qid, ts in _BM25_QUERIES
    )
    + r""")
    SELECT q.query_id, d.doc_id
    FROM q JOIN documents d
      ON list_has_all(regexp_extract_all(d.text, '\S+'), q.terms)
    """
)

ORACLE_SQL["bm25_search_docs"] = rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
  FROM documents
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl
), q AS (
  SELECT * FROM (VALUES {_BM25_VALUES}) AS v(query_id, term)
), tf AS (
  SELECT q.query_id, t.doc_id, t.term, count(*) AS tf
  FROM toks t JOIN q ON t.term = q.term
  GROUP BY 1, 2, 3
), dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks
  WHERE term IN (SELECT term FROM q) GROUP BY term
), contrib AS (
  SELECT tf.query_id, tf.doc_id,
         CAST(floor(
           ln(1.0 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))
           * 1000000 + 0.5) AS BIGINT) AS c
  FROM tf
  JOIN dfreq USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
), scored AS (
  SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_ppm
  FROM contrib GROUP BY 1, 2
)
SELECT query_id, doc_id, score_ppm FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY score_ppm DESC, doc_id) AS rn
  FROM scored
) WHERE rn <= {_BM25_TOPK}
"""

# Snapshot diff: the oracle derives the identical old snapshot in SQL
# and classifies by md5 equality (status-equivalent to the engine hash
# under the repo's hash-collision argument).
ORACLE_SQL["corpus_diff_docs"] = f"""
WITH news AS (
  SELECT doc_id, md5(text) AS h FROM documents
), olds AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 11 = 0 THEN text || ' legacy'
                  ELSE text END) AS h
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id + {_DIFF_REMOVED_OFF}, md5(text)
  FROM documents WHERE doc_id % 13 = 0
)
SELECT COALESCE(n.doc_id, o.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN n.h <> o.h THEN 'changed'
            ELSE 'same' END AS status
FROM news n FULL OUTER JOIN olds o ON n.doc_id = o.doc_id
"""

# Sliding-window chunker: correlated generate_series reproduces the
# same (start while start < n) window schedule.
ORACLE_SQL["chunk_docs"] = rf"""
WITH dl AS (
  SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n FROM documents
), c AS (
  SELECT doc_id, n,
         unnest(range(0, (n - 1) // {_CHUNK_STRIDE} + 1)) AS chunk_id
  FROM dl WHERE n > 0
)
SELECT doc_id, chunk_id, chunk_id * {_CHUNK_STRIDE} AS start_tok,
       LEAST({_CHUNK_SIZE}, n - chunk_id * {_CHUNK_STRIDE}) AS n_toks
FROM c
"""
