"""Oracle-parity gates for EVERY oracle-bearing query at sf0.001.

Each test runs the registered Ray query AND its DuckDB oracle SQL over
the driver testdata and compares with the driver's exact discipline
(row count, column-name set, order-insensitive value hash) so the suite
— not only the per-round driver run — guards these queries.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"
NEW_QUERIES = [
    "p90_event_value",
    "top_tokens_docs",
    "top_orders_by_segment",
    "decontaminate_docs",
    "inactive_customers",
    "hourly_events",
    "hash_sample_events",
    "incremental_dedup_docs",
    "preprocess_corpus_docs",
    "cap_per_source_docs",
    "revenue_by_nation",
    "customer_order_distribution",
    "median_value_by_type",
    "repetition_docs",
    "line_dedup_docs",
    "stopword_docs",
    "bpe_token_count_docs",
    "dup_ngram_docs",
    "scrub_docs",
    "tfidf_docs",
    "mix_sources_docs",
    "pack_sequences_docs",
    "shuffle_rank_docs",
    "quantile_filter_docs",
    "jsonl_token_count_docs",
    "hopping_events",
    "frequent_tokens_docs",
    "event_transitions",
    "active_users_hourly",
    "large_orders",
    "keep_best_docs",
    "clicks_before_purchase",
    "lang_source_rollup",
    "label_centroids",
    "embedding_outliers",
    "json_props_stats",
    "urgent_orders_by_month",
    "events_profile",
    "funnel_events",
    "streaming_session_stats",
    "ipc_roundtrip_docs",
    "text_search_docs",
    "split_docs",
    "weighted_sample_events",
    "user_running_value",
    "bm25_search_docs",
    "corpus_diff_docs",
    "chunk_docs",
    "user_moving_window",
    "set_join_pairs_docs",
    "warc_roundtrip_docs",
    "minmax_norm_events",
    "boolean_search_docs",
    # every remaining oracle-bearing query (driver-era set), so the
    # suite — not only the per-round driver run — guards ALL oracles
    "cube_lineitem",
    "mode_event_type",
    "triangle_count_docs",
    "top_building_orders",
    "mad_value_by_type",
    "edit_pairs_docs",
    "degree_histogram_docs",
    "throttle_events",
    "ann_topk",
    "cluster_radius_docs",
    "cluster_stats_docs",
    "containment_pairs_docs",
    "corpus_stats_docs",
    "distinct_segments",
    "embedding_dup_pairs",
    "events_by_day",
    "explode_lines_docs",
    "filter_agg_events",
    "lang_count_docs",
    "langid_docs",
    "median_event_value",
    "near_dup_pairs_docs",
    "orders_by_nation",
    "purchase_attribution",
    "q1_pricing_summary",
    "quality_docs",
    "recall_eval_docs",
    "supplier_part_stats",
    "tsv_lang_count_docs",
    "user_first_event",
]
# trivially-empty results would vacuously pass the hash compare; pin the
# minimum result sizes observed on the sf0.001 testdata
MIN_ROWS = {
    "p90_event_value": 1,
    "top_tokens_docs": 20,
    "top_orders_by_segment": 15,
    "decontaminate_docs": 480,
    "inactive_customers": 4,
    "hourly_events": 100,
    "hash_sample_events": 10,
    "incremental_dedup_docs": 200,
    "preprocess_corpus_docs": 500,
    "cap_per_source_docs": 10,
    "revenue_by_nation": 20,
    "customer_order_distribution": 5,
    "median_value_by_type": 5,
    "repetition_docs": 500,
    "line_dedup_docs": 500,
    "stopword_docs": 480,
    "bpe_token_count_docs": 500,
    "dup_ngram_docs": 100,
    "scrub_docs": 500,
    "tfidf_docs": 1400,
    "mix_sources_docs": 200,
    "pack_sequences_docs": 500,
    "shuffle_rank_docs": 500,
    "quantile_filter_docs": 300,
    "jsonl_token_count_docs": 500,
    "hopping_events": 300,
    "frequent_tokens_docs": 20,
    "event_transitions": 20,
    "active_users_hourly": 400,
    "large_orders": 20,
    "keep_best_docs": 500,
    "clicks_before_purchase": 150,
    "lang_source_rollup": 50,
    "label_centroids": 640,
    "embedding_outliers": 10,
    "json_props_stats": 5,
    "urgent_orders_by_month": 70,
    "events_profile": 4,
    "funnel_events": 1,
    "streaming_session_stats": 800,
    "ipc_roundtrip_docs": 500,
    "text_search_docs": 100,
    "user_running_value": 1000,
    "bm25_search_docs": 30,
    "corpus_diff_docs": 500,
    "chunk_docs": 2000,
    "user_moving_window": 1000,
    "set_join_pairs_docs": 20,
    "warc_roundtrip_docs": 500,
    "minmax_norm_events": 1000,
    "boolean_search_docs": 500,
    "cube_lineitem": 12,
    "mode_event_type": 15,
    "triangle_count_docs": 1,
    "top_building_orders": 10,
    "mad_value_by_type": 5,
    "edit_pairs_docs": 27,
    "degree_histogram_docs": 3,
    "throttle_events": 986,
}
# driver-era queries: the oracle compare already pins EXACT row-count
# equality; 1 here only guards the vacuously-empty case
for _n in NEW_QUERIES:
    MIN_ROWS.setdefault(_n, 1)


@pytest.fixture(scope="module")
def oracle_con():
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from oracle_check import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_query_matches_oracle(ray_session, oracle_con, name):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from oracle_check import to_pandas, value_hash

    from hsearch_ray.pipelines.queries import ORACLE_SQL, QUERIES

    mine = to_pandas(QUERIES[name](SF))
    oracle = oracle_con.sql(ORACLE_SQL[name]).df()
    assert len(mine) == len(oracle)
    assert len(mine) >= MIN_ROWS[name]
    assert sorted(mine.columns) == sorted(oracle.columns)
    assert value_hash(mine) == value_hash(oracle)


def test_text_search_hit_contract(ray_session):
    """Search-semantics invariants beyond oracle parity: every hit is at
    or above the cutoff, belongs to a real query, and never self-matches."""
    from hsearch_ray.pipelines import queries as Q

    df = Q.QUERIES["text_search_docs"](SF).to_pandas()
    assert len(df) > 0
    assert (df["jaccard"] >= Q._SEARCH_THRESHOLD - 1e-9).all()
    assert (df["query_id"] % Q._SEARCH_MOD == Q._SEARCH_REM).all()
    assert (df["query_id"] != df["hit_id"]).all()


def test_split_docs_properties(ray_session):
    """Split invariants beyond oracle parity: total+disjoint cover of
    the corpus, ~80/10/10 rates, and growth stability — a doc's split
    depends only on its id, so adding docs never moves the holdout."""
    from hsearch_ray.pipelines import queries as Q

    df = Q.QUERIES["split_docs"](SF).to_pandas()
    assert df["doc_id"].is_unique
    assert set(df["split"]) <= {"train", "val", "test"}
    frac = df["split"].value_counts(normalize=True)
    assert frac.get("train", 0) > 0.7
    # growth stability: recompute on the first half only — assignments
    # of those docs are identical to their full-corpus assignments
    half = df[df["doc_id"] < df["doc_id"].median()]
    merged = half.merge(df, on="doc_id", suffixes=("_half", "_full"))
    assert (merged["split_half"] == merged["split_full"]).all()


def test_weighted_sample_pps_properties(ray_session):
    """PPS invariants beyond oracle parity: certainty stratum (value >=
    scale always kept), monotone keep rate in value, determinism."""
    from hsearch_ray.pipelines import queries as Q

    events = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_id", "value"])
    out = Q.QUERIES["weighted_sample_events"](SF).to_pandas()
    kept = set(out["event_id"])
    vc = (events["value"] * 100 + 0.5).apply(int)
    certain = set(events.loc[vc >= Q._PPS_SCALE_C, "event_id"])
    assert certain <= kept
    # keep rate of the top value quartile exceeds the bottom quartile
    lo, hi = events["value"].quantile([0.25, 0.75])
    lo_ids = events.loc[events["value"] <= lo, "event_id"]
    hi_ids = events.loc[events["value"] >= hi, "event_id"]
    rate = lambda ids: np.mean([i in kept for i in ids])  # noqa: E731
    assert rate(hi_ids) > rate(lo_ids)
    out2 = Q.QUERIES["weighted_sample_events"](SF).to_pandas()
    pd.testing.assert_frame_equal(out.sort_values("event_id", ignore_index=True),
                                  out2.sort_values("event_id", ignore_index=True))


def test_cap_per_source_properties(ray_session):
    """Per-group cap invariants beyond oracle parity: at most K docs per
    source, exact run-to-run determinism, and block-size independence
    (the combiner must not depend on how rows land in blocks)."""
    from hsearch_ray.pipelines import queries as Q

    out1 = Q.q_cap_per_source_docs(SF)
    assert (out1.groupby("source").size() <= Q._CAP_PER_SOURCE).all()
    assert (out1.groupby("source")["rnk"].max()
            == out1.groupby("source").size()).all()
    out2 = Q.q_cap_per_source_docs(SF)
    pd.testing.assert_frame_equal(out1, out2)  # deterministic


def test_decontamination_is_discriminative(ray_session):
    """The 24-char decon shingle must separate copied spans from shared
    boilerplate: some — but not all — train docs flagged."""
    from hsearch_ray.pipelines.queries import QUERIES

    df = QUERIES["decontaminate_docs"](SF)
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    n = int(df["contaminated"].sum())
    assert 0 < n < len(df)


def test_incremental_dedup_flags_some_new_docs(ray_session):
    """The snapshot split must produce a non-trivial result: some — but
    not all — new docs match the index, and every flagged doc carries a
    real best match at/above the verify threshold."""
    from hsearch_ray.pipelines.queries import QUERIES

    df = QUERIES["incremental_dedup_docs"](SF)
    dups = df[df["is_dup"]]
    assert 0 < len(dups) < len(df)
    assert (dups["best_match"] >= 0).all()
    assert (dups["best_jaccard"] >= 0.7).all()
    clean = df[~df["is_dup"]]
    assert (clean["best_match"] == -1).all()


def test_preprocess_composite_exercises_every_branch(ray_session):
    """'short', 'dup' and 'kept' must all occur; short docs carry no
    cluster; dup docs point at a kept representative."""
    from hsearch_ray.pipelines.queries import QUERIES

    df = QUERIES["preprocess_corpus_docs"](SF)
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    counts = df["status"].value_counts()
    assert set(counts.index) == {"short", "dup", "kept"}
    assert (df.loc[df["status"] == "short", "rep_id"] == -1).all()
    kept = set(df.loc[df["status"] == "kept", "doc_id"])
    assert set(df.loc[df["status"] == "dup", "rep_id"]) <= kept


def test_p90_on_skewed_column(ray_session):
    """Order-stat recursion with 90% of rows in one histogram bin and a
    driver fetch bound far below the bin population."""
    import numpy as np
    import ray.data

    from hsearch_ray.pipelines.queries import exact_order_stat_distributed

    rng = np.random.default_rng(7)
    v = np.where(rng.random(40_000) < 0.9, 5.0 + rng.random(40_000) * 1e-6,
                 rng.random(40_000) * 1000.0)
    ds = ray.data.from_arrow(
        [__import__("pyarrow").table({"value": c}) for c in np.array_split(v, 8)]
    )
    got = exact_order_stat_distributed(
        ds, "value", kfn=lambda n: ((9 * (n - 1)) // 10,) * 2,
        max_fetch=2_000, nbins=64,
    )
    want = round(float(np.sort(v)[(9 * (v.size - 1)) // 10]), 6)
    assert got == want


def test_grouped_order_stat_forced_recursion(ray_session):
    """Grouped median must equal per-group numpy medians when the fetch
    budget forces several histogram rounds, groups are skewed into
    single bins, and group sizes differ by 100x (parity AND recursion
    exercised together — the sf0.001 oracle run resolves in one round)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from hsearch_ray.pipelines.queries import exact_order_stat_by_group

    rng = np.random.default_rng(11)
    gs, vs = [], []
    for g, size, scale in (("a", 30_000, 1e-6), ("b", 300, 1000.0),
                           ("c", 9_000, 1.0), ("d", 1, 42.0)):
        gs.append(np.full(size, g))
        # group 'a': 90% of mass inside one tiny-width bin (skew)
        vs.append(5.0 + rng.random(size) * scale)
    g = np.concatenate(gs)
    v = np.concatenate(vs)
    perm = rng.permutation(g.size)
    g, v = g[perm], v[perm]
    ds = ray.data.from_arrow(
        [pa.table({"event_type": gc, "value": vc})
         for gc, vc in zip(np.array_split(g, 8), np.array_split(v, 8))]
    )
    out = exact_order_stat_by_group(
        ds, "event_type", "value", max_fetch=500, nbins=16, max_rounds=12,
    ).set_index("event_type")["stat_value"]
    for key in ("a", "b", "c", "d"):
        vals = np.sort(v[g == key])
        n = vals.size
        want = round(float((vals[(n - 1) // 2] + vals[n // 2]) / 2.0), 6)
        assert out[key] == want, key


def test_scrub_kernel_redacts(ray_session):
    """The scrub kernel must actually rewrite text, not just count:
    a synthetic batch with known hits checks count AND redacted bytes
    (an email-shaped PII pattern here — the registered query's term
    pattern is the corpus-matching stand-in for the same kernel)."""
    import pyarrow as pa

    from hsearch_ray.stages.textstats import scrub_batch

    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "contact a@b.com or c@d.org now",
            "no addresses here",
            "x@y.io",
        ], pa.string()),
    })
    out = scrub_batch(batch, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
                      "<EMAIL>")
    assert out["n_hits"].to_pylist() == [2, 0, 1]
    assert out["text"].to_pylist() == [
        "contact <EMAIL> or <EMAIL> now",
        "no addresses here",
        "<EMAIL>",
    ]


def test_dup_ngram_stats_planted_spans(ray_session):
    """Exact duplicated-n-gram ledger on a planted corpus: docs 0 and 1
    share one 32-char span (k=16 -> 17 shared grams each), doc 2 repeats
    a gram INSIDE itself only (must NOT count: cross-doc requires >= 2
    distinct docs), doc 3 is unique, doc 4 is shorter than k (excluded).
    Many 1-row input blocks force gram runs across sort-block edges, so
    the kind=1 spill regroup path is exercised, not just interior runs."""
    import numpy as np
    import pyarrow as pa
    import ray

    from hsearch_ray.stages.ngramdup import dup_ngram_stats

    rng = np.random.default_rng(7)

    def rand(n):
        return "".join(rng.choice(list("abcdefghij"), size=n))

    shared = "THE-QUICK-BROWN-FOX-JUMPS-OVER!!"  # 32 chars
    assert len(shared) == 32
    selfrep = rand(16)
    docs = [
        (0, rand(40) + shared + rand(40)),
        (1, rand(40) + shared + rand(40)),
        (2, selfrep + rand(30) + selfrep),
        (3, rand(120)),
        (4, "tiny"),
    ]
    ds = ray.data.from_arrow([
        pa.table({"doc_id": pa.array([i], pa.int64()),
                  "text": pa.array([t], pa.string())})
        for i, t in docs
    ])
    out = dup_ngram_stats(ds, k=16).to_pandas().set_index("doc_id")
    assert sorted(out.index) == [0, 1]
    # 32-char span -> 32-16+1 = 17 grams, all distinct in this span and
    # absent from the random tails with overwhelming probability
    for d in (0, 1):
        assert out.loc[d, "dup_grams"] == 17
        assert out.loc[d, "dup_positions"] == 17


def test_pack_sequences_multiblock_offsets(ray_session, tmp_path):
    """The distributed prefix sum must be exact when docs arrive in many
    blocks in arbitrary shard order (the sf0.001 single-file read may
    collapse to one block, where per-block offsets are vacuous): shard
    the documents table into 8 interleaved parquet files and check the
    result against a serial cumsum."""
    import re

    import numpy as np
    import pyarrow.parquet as pq

    from hsearch_ray.pipelines.queries import QUERIES, _PACK_BUDGET

    t = pq.read_table(f"{SF}/documents.parquet")
    shard_dir = tmp_path / "documents.parquet"
    shard_dir.mkdir()
    for i in range(8):
        # round-robin: every shard spans the full doc_id range, so block
        # boundaries interleave and every offset is exercised
        pq.write_table(t.take(list(range(i, t.num_rows, 8))),
                       shard_dir / f"part-{i}.parquet")

    got = QUERIES["pack_sequences_docs"](str(tmp_path)).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)

    df = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    ntok = df["text"].map(lambda s: len(re.findall(r"\S+", s))).to_numpy(np.int64)
    excl = np.cumsum(ntok) - ntok
    assert (got["doc_id"].to_numpy() == df["doc_id"].to_numpy()).all()
    assert (got["n_tokens"].to_numpy() == ntok).all()
    assert (got["tok_offset"].to_numpy() == excl).all()
    assert (got["seq_id"].to_numpy() == excl // _PACK_BUDGET).all()
    assert got["seq_id"].nunique() > 10  # budget actually chunks

    # shuffle_rank shares the scan primitive: ranks over the sharded
    # corpus must be the exact permutation 0..n-1 in hash order
    from hsearch_ray.pipelines.queries import _SAMPLE_MULT

    ranks = QUERIES["shuffle_rank_docs"](str(tmp_path)).to_pandas()
    ranks = ranks.sort_values("doc_id").reset_index(drop=True)
    did = df["doc_id"].to_numpy(np.uint64)
    h = (did * np.uint64(_SAMPLE_MULT)) % np.uint64(1 << 32)
    order = np.lexsort((did, h))
    want = np.empty(did.size, dtype=np.int64)
    want[order] = np.arange(did.size)
    assert (ranks["rank"].to_numpy() == want).all()


def test_frequent_tokens_superset_guarantee(ray_session, tmp_path):
    """The per-block survivor filter must not lose a global heavy hitter
    that is DILUTED across blocks (the case the Misra–Gries pigeonhole
    covers): a token just over the global threshold, spread one-per-doc
    across many blocks full of heavier local noise, must still appear in
    the exact output — compared against a serial pandas ground truth."""
    import collections
    import re

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq2

    from hsearch_ray.pipelines.queries import QUERIES

    rng = np.random.default_rng(3)
    docs = []
    # 64 docs; each carries ONE 'rare_heavy' token plus ~90 local-noise
    # tokens, so rare_heavy is never a within-block standout
    for i in range(64):
        noise = [f"noise{i}_{j}" for j in range(30) for _ in range(3)]
        rng.shuffle(noise)
        docs.append("rare_heavy " + " ".join(noise))
    t = pa.table({"doc_id": pa.array(range(64), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    ddir = tmp_path / "documents.parquet"
    ddir.mkdir()
    for i in range(16):  # 16 shards -> many blocks of 4 docs
        pq2.write_table(t.take(list(range(i * 4, i * 4 + 4))),
                        ddir / f"part-{i}.parquet")

    out = QUERIES["frequent_tokens_docs"](str(tmp_path))
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()

    counts = collections.Counter(
        tok for d in docs for tok in re.findall(r"\S+", d))
    total = sum(counts.values())
    thr = total // 512 + 1
    want = {tok: c for tok, c in counts.items() if c >= thr}
    assert "rare_heavy" in want  # the fixture really is a heavy hitter
    got = dict(zip(out["token"], out["n"]))
    assert got == want


def test_jsonl_reader_validates(ray_session, tmp_path):
    """The validating reader must fail loudly on schema drift (missing
    required column, nulls in an id column) and must widen JSON-inferred
    integer types to int64."""
    import pytest as _pytest
    import ray as _ray

    from hsearch_ray.sources import read_jsonl

    ok = tmp_path / "ok.json"
    ok.write_text('{"doc_id": 1, "text": "a b"}\n{"doc_id": 2, "text": "c"}\n')
    out = read_jsonl(str(ok), required=("doc_id", "text"),
                     int_cols=("doc_id",)).to_pandas()
    assert out["doc_id"].dtype == "int64" and len(out) == 2

    drift = tmp_path / "drift.json"
    drift.write_text('{"doc_id": 1}\n')
    with _pytest.raises(_ray.exceptions.RayTaskError, match="required column"):
        read_jsonl(str(drift), required=("doc_id", "text")).materialize()

    nulls = tmp_path / "nulls.json"
    nulls.write_text('{"doc_id": null, "text": "x"}\n')
    with _pytest.raises(_ray.exceptions.RayTaskError, match="has nulls"):
        read_jsonl(str(nulls), required=("doc_id", "text"),
                   int_cols=("doc_id",)).materialize()


def test_repetition_flag_discriminates(ray_session):
    """The duplicate-8-gram filter must flag some — not all — docs
    (vacuous all-true / all-false outputs would still hash-match a
    matching oracle), and the counts must be internally consistent."""
    from hsearch_ray.pipelines.queries import QUERIES

    df = QUERIES["repetition_docs"](SF).to_pandas()
    n = int(df["is_repetitive"].sum())
    assert 0 < n < len(df)
    assert (df["n_dup_grams"] >= 0).all()
    assert (df["n_dup_grams"] < df["n_grams"]).all()


def test_transition_counts_spill_path(ray_session):
    """The sorted-block scan must count transitions identically no
    matter how users land in blocks: a many-block repartition forces
    every user onto a block edge (the kind=1 spill/regroup path) and
    the result must equal the single-block ground truth."""
    import numpy as np
    import ray

    from hsearch_ray.stages.events import transition_counts

    rng = np.random.default_rng(7)
    n, users, types = 3000, 12, list("abcde")
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, users, n).astype(np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, 10**6, n), unit="s"
        ).astype("datetime64[us]"),
        "event_type": rng.choice(types, n),
    })
    # pandas ground truth: LAG over (user, ts, event_id) order
    s = df.sort_values(["user_id", "ts", "event_id"])
    same = s["user_id"].to_numpy()[1:] == s["user_id"].to_numpy()[:-1]
    truth = (
        pd.DataFrame({"prev_type": s["event_type"].to_numpy()[:-1][same],
                      "next_type": s["event_type"].to_numpy()[1:][same]})
        .groupby(["prev_type", "next_type"], as_index=False).size()
        .rename(columns={"size": "n"})
    )
    for nblocks in (1, 16):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        out = transition_counts(ds).sort_values(
            ["prev_type", "next_type"]).reset_index(drop=True)
        expect = truth.sort_values(
            ["prev_type", "next_type"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            out, expect.astype({"n": "int64"}), check_like=True)


def test_keep_best_docs_invariants(ray_session):
    """Policy invariants beyond oracle parity: exactly one keeper per
    cluster, the keeper has the cluster-max n_chars (ties to min
    doc_id), and at least one keeper differs from the min-id
    representative (the policy is not vacuously the old one)."""
    from hsearch_ray.pipelines.queries import QUERIES

    disp = QUERIES["keep_best_docs"](SF).to_pandas()
    clusters = QUERIES["near_dup_clusters_docs"](SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    m = disp.merge(clusters, on="doc_id").merge(docs, on="doc_id")
    per = m.groupby("cluster_id")
    # one keeper per cluster, and it is a member of the cluster
    assert (per["kept"].sum() == 1).all()
    assert (m[m["kept"] == 1]["keeper_id"]
            == m[m["kept"] == 1]["doc_id"]).all()
    # keeper n_chars == cluster max; ties resolve to the min doc_id
    mx = per["n_chars"].transform("max")
    keepers = m[m["kept"] == 1].set_index("cluster_id")
    at_max = m[m["n_chars"] == mx].groupby("cluster_id")["doc_id"].min()
    assert (keepers["doc_id"] == at_max.loc[keepers.index]).all()
    # the quality policy must differ from min-id representative somewhere
    rep = per["doc_id"].transform("min")
    assert (m[m["kept"] == 1]["doc_id"].to_numpy()
            != rep[m["kept"] == 1].to_numpy()).any()


def test_windowed_prior_count_spill_and_kernel(ray_session):
    """The band-join merge-rank kernel must (a) be independent of block
    layout (16-block repartition forces every user through the spill
    regroup) and (b) match a brute-force O(n^2) pandas ground truth,
    including window-boundary ties (ts == t - w included, ts == t
    excluded)."""
    import numpy as np
    import ray

    from hsearch_ray.stages.events import windowed_prior_count

    rng = np.random.default_rng(13)
    n, users, w = 2500, 10, 3600
    # coarse second grid -> plenty of exact boundary ties
    secs = rng.integers(0, 40_000, n) // 600 * 600
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, users, n).astype(np.int64),
        "ts": pd.to_datetime(secs, unit="s").astype("datetime64[us]"),
        "event_type": rng.choice(["purchase", "click", "view"], n,
                                 p=[0.2, 0.6, 0.2]),
    })
    us = df["ts"].astype("int64").to_numpy()  # epoch MICROseconds
    truth = {}
    for i in np.nonzero((df["event_type"] == "purchase").to_numpy())[0]:
        t = int(us[i])
        m = ((df["user_id"] == df["user_id"].iloc[i])
             & (df["event_type"] == "click")
             & (us >= t - w * 10**6) & (us < t))
        truth[int(df["event_id"].iloc[i])] = int(m.sum())
    for nblocks in (1, 16):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        out = windowed_prior_count(ds, "purchase", "click", w).to_pandas()
        got = dict(zip(out["event_id"].astype(int), out["n_prior"].astype(int)))
        assert got == truth, f"nblocks={nblocks}"


def test_hll_sketch_accuracy_and_mergeability(ray_session):
    """The HLL distinct-count sketch must (a) land within 5% of the
    exact distinct token count (4096 registers -> ~1.6% standard
    error), (b) produce IDENTICAL merged registers under any block
    partitioning (the mergeable-aggregate law), and (c) be exactly
    deterministic run to run."""
    import numpy as np
    import polars as pl

    from hsearch_ray.pipelines.queries import QUERIES, _HLL_P
    from hsearch_ray.stages.sketches import (hll_estimate, hll_merge,
                                             hll_partial)

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    toks = docs["text"].str.findall(r"\S+").explode().dropna().astype(str)
    exact = toks.nunique()

    out1 = QUERIES["approx_distinct_tokens"](SF)
    out2 = QUERIES["approx_distinct_tokens"](SF)
    est = int(out1["approx_distinct"].iloc[0])
    assert abs(est - exact) / exact < 0.05, (est, exact)
    pd.testing.assert_frame_equal(out1, out2)  # deterministic

    # merge law: registers from any partitioning merge identically
    h = pl.from_pandas(toks).hash(seed=7).to_numpy()
    whole = hll_partial(h, p=_HLL_P)
    for nchunks in (3, 17):
        parts = np.stack([hll_partial(c, p=_HLL_P)
                          for c in np.array_split(h, nchunks)])
        assert (hll_merge(parts) == whole).all()
    assert hll_estimate(whole) == est


def test_funnel_strictness_and_spill(ray_session):
    """Funnel semantics on adversarial users (the sf testdata is
    degenerate — every user completes): no-view users, click BEFORE the
    first view (must not count), click at exactly the first-view ts
    (strictly-after ⇒ must not count), purchase before the qualifying
    click, and a full funnel — identical at 1 and 16 blocks."""
    import numpy as np
    import ray

    from hsearch_ray.stages.events import funnel_counts

    T = 10**6  # 1s in us

    def ev(u, sec, typ):
        return {"user_id": u, "ts": pd.Timestamp(sec * T, unit="us"),
                "event_type": typ}

    rows = []
    # u0: full funnel
    rows += [ev(0, 1, "view"), ev(0, 2, "click"), ev(0, 3, "purchase")]
    # u1: click before view only -> viewed, not clicked
    rows += [ev(1, 2, "view"), ev(1, 1, "click"), ev(1, 3, "purchase")]
    # wait: u1's purchase at t3 can't count (no qualifying click)
    # u2: click at exactly first-view ts -> strictly-after excludes
    rows += [ev(2, 5, "view"), ev(2, 5, "click")]
    # u3: no view at all (signup noise only)
    rows += [ev(3, 1, "signup"), ev(3, 2, "click"), ev(3, 3, "purchase")]
    # u4: view+click, purchase BEFORE the click -> not purchased
    rows += [ev(4, 1, "view"), ev(4, 3, "click"), ev(4, 2, "purchase")]
    # u5: two views; click after the SECOND view only -> still counts
    #     (strictly after the FIRST view at t1? click t5 > t1 -> counts)
    rows += [ev(5, 1, "view"), ev(5, 4, "view"), ev(5, 5, "click"),
             ev(5, 6, "purchase")]
    df = pd.DataFrame(rows)
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    df["ts"] = df["ts"].astype("datetime64[us]")
    expect = {"n_users": 6, "n_viewed": 5, "n_clicked": 3, "n_purchased": 2}
    for nblocks in (1, 16):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        out = funnel_counts(ds).iloc[0].to_dict()
        assert out == expect, (nblocks, out)


def test_compression_ratio_discriminates(ray_session):
    """The zlib quality signal must order constructed docs correctly
    (repetitive << normal << random) and be exactly deterministic."""
    import tempfile

    import numpy as np

    from hsearch_ray.pipelines.queries import q_compression_ratio_docs

    rng = np.random.default_rng(3)
    docs = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": [
            "spam " * 400,                                   # repetitive
            " ".join("the quick brown fox %d" % i for i in range(80)),
            "".join(chr(rng.integers(33, 0x2FA0)) for _ in range(2000)),
        ],
    })

    with tempfile.TemporaryDirectory() as td:
        docs.assign(lang="en", source="t", n_chars=docs["text"].str.len()) \
            .to_parquet(f"{td}/documents.parquet", index=False)
        out1 = q_compression_ratio_docs(td).to_pandas().sort_values("doc_id")
        out2 = q_compression_ratio_docs(td).to_pandas().sort_values("doc_id")
    r = out1["ratio_ppm"].to_numpy()
    assert r[0] < r[1] < r[2], r
    assert r[0] < 100_000 and r[2] > 700_000
    pd.testing.assert_frame_equal(out1, out2)


def test_ipc_reader_validates(ray_session, tmp_path):
    """The IPC reader must fail loudly on schema drift, and the writer
    must round-trip non-ASCII text byte-exactly."""
    import pyarrow as pa
    import pytest as _pytest
    import ray as _ray

    from hsearch_ray.sources.ipc import read_ipc, write_ipc

    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["héllo\nwörld", "日本語 \t x"])})
    n = write_ipc(_ray.data.from_arrow(tbl), str(tmp_path))
    assert n >= 1
    out = read_ipc(str(tmp_path), required=("doc_id", "text")).to_pandas()
    assert sorted(out["text"]) == sorted(tbl["text"].to_pylist())

    with _pytest.raises(_ray.exceptions.RayTaskError,
                        match="required column"):
        read_ipc(str(tmp_path), required=("missing_col",)).materialize()


def test_approx_quantiles_events_accuracy(ray_session):
    """The one-pass quantile summary must land each estimate within the
    advertised rank bound (n/1024 + blocks, asserted with 2x slack) of
    the exact order statistic on the real events table, and be
    deterministic across runs."""
    import pyarrow.parquet as pq

    from hsearch_ray.pipelines import queries as Q

    df = Q.QUERIES["approx_quantiles_events"](SF)
    again = Q.QUERIES["approx_quantiles_events"](SF)
    pd.testing.assert_frame_equal(df, again)

    vals = pq.read_table(f"{SF}/events.parquet", columns=["value"])
    exact = np.sort(np.floor(
        vals["value"].to_numpy() * 100 + 0.5).astype(np.int64))
    n = exact.size
    slack = 2 * (n // 1024 + 16 + 1)
    for q_ppm, est in zip(df["q_ppm"], df["value_cents"]):
        target = min(n, max(1, int(np.ceil(q_ppm / 1e6 * n))))
        lo = np.searchsorted(exact, est, side="left") + 1
        hi = np.searchsorted(exact, est, side="right")
        assert lo - slack <= target <= hi + slack, (q_ppm, est)


def test_bm25_ranking_contract(ray_session):
    """Retrieval invariants beyond oracle parity: exactly top-k rows per
    query in strictly ranked order, positive scores, and the BM25
    saturation property — a doc stuffed with one query term must not
    outrank the df-weighted multi-term structure (scores bounded by
    sum of idf*(k1+1) micro-units)."""
    import math

    from hsearch_ray.pipelines import queries as Q

    df = Q.QUERIES["bm25_search_docs"](SF)
    qids = [qid for qid, _ in Q._BM25_QUERIES]
    assert sorted(df["query_id"].unique()) == sorted(qids)
    for qid, terms in Q._BM25_QUERIES:
        g = df[df["query_id"] == qid]
        assert len(g) == Q._BM25_TOPK
        s = g["score_ppm"].to_numpy()
        assert (s > 0).all()
        assert (np.diff(s) <= 0).all()  # ranked descending
        # saturation bound: per-term contribution < idf * (k1+1)
        n = 500  # sf0.001 corpus size
        cap = sum(math.log(1.0 + (n + 0.5) / 1.5) * 2.2 for _ in terms)
        assert (s <= cap * 1_000_000).all()


def test_corpus_diff_status_contract(ray_session):
    """Diff invariants beyond oracle parity: statuses partition the id
    space exactly along the derivation rules — added = the %7 family,
    removed = only the offset old-only family, changed = the %11 family
    minus the added set, everything else same."""
    from hsearch_ray.pipelines import queries as Q

    df = Q.QUERIES["corpus_diff_docs"](SF).to_pandas()
    assert df["doc_id"].is_unique
    by = {s: set(df.loc[df["status"] == s, "doc_id"]) for s in
          ("added", "removed", "changed", "same")}
    assert by["added"] == {d for d in df["doc_id"]
                           if d < Q._DIFF_REMOVED_OFF and d % 7 == 0}
    assert all(d >= Q._DIFF_REMOVED_OFF for d in by["removed"])
    assert all((d - Q._DIFF_REMOVED_OFF) % 13 == 0 for d in by["removed"])
    assert by["changed"] == {d for d in df["doc_id"]
                             if d < Q._DIFF_REMOVED_OFF
                             and d % 11 == 0 and d % 7 != 0}
    assert len(by["same"]) > 0


def test_approx_quantiles_by_type_accuracy(ray_session):
    """Grouped sketch accuracy: each per-group estimate lands within the
    advertised rank bound of the exact per-group order statistic;
    deterministic across runs."""
    from hsearch_ray.pipelines import queries as Q

    df = Q.QUERIES["approx_quantiles_by_type"](SF)
    again = Q.QUERIES["approx_quantiles_by_type"](SF)
    pd.testing.assert_frame_equal(df, again)

    events = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_type", "value"])
    events["vc"] = np.floor(
        events["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    for (et, q_ppm), est in zip(
        zip(df["event_type"], df["q_ppm"]), df["value_cents"]
    ):
        g = np.sort(events.loc[events["event_type"] == et, "vc"].to_numpy())
        n = g.size
        slack = 2 * (n // 1024 + 16 + 1)
        target = min(n, max(1, int(np.ceil(q_ppm / 1e6 * n))))
        lo = np.searchsorted(g, est, side="left") + 1
        hi = np.searchsorted(g, est, side="right")
        assert lo - slack <= target <= hi + slack, (et, q_ppm, est)


def test_chunk_docs_empty_and_zero_token_docs(ray_session):
    """The chunk explode must survive empty batches and all-empty docs
    (the np.repeat size-mismatch edge), and cover every token of every
    non-empty doc exactly once per window schedule."""
    import ray.data

    from hsearch_ray.pipelines import queries as Q

    src = pd.DataFrame({"doc_id": [1, 2, 3],
                        "text": ["", "a b c", " ".join(["t"] * 40)]})
    import pyarrow.parquet as pq
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(src), f"{d}/documents.parquet")
        out = Q.QUERIES["chunk_docs"](d).to_pandas()
    assert set(out["doc_id"]) == {2, 3}          # empty doc produces nothing
    g3 = out[out["doc_id"] == 3].sort_values("chunk_id")
    assert list(g3["start_tok"]) == [0, 12, 24, 36]
    assert list(g3["n_toks"]) == [16, 16, 16, 4]
    g2 = out[out["doc_id"] == 2]
    assert len(g2) == 1 and int(g2["n_toks"].iloc[0]) == 3


def test_warc_roundtrip_and_validation(ray_session, tmp_path):
    """The WARC writer/reader must round-trip adversarial payloads
    byte-exactly — non-ASCII, CRLF line endings, and a payload that
    CONTAINS the "WARC/1.0" record marker (the Content-Length walk must
    never split on payload bytes) — and the reader must fail loudly on
    a record missing Content-Length."""
    import pyarrow as pa
    import pytest as _pytest
    import ray as _ray

    from hsearch_ray.sources.warc import read_warc, write_warc

    texts = [
        "héllo\r\nwörld",                       # CRLF inside payload
        "WARC/1.0\r\nContent-Length: 3\r\n\r\nxyz",  # marker inside payload
        "日本語 \t x",
        "",                                      # empty payload
    ]
    tbl = pa.table({
        "uri": pa.array([f"https://example.org/doc/{i}"
                         for i in range(len(texts))], pa.string()),
        "warc_date": pa.array(["2024-01-01T00:00:00Z"] * len(texts),
                              pa.string()),
        "content": pa.array(texts, pa.large_string()),
    })
    n = write_warc(_ray.data.from_arrow(tbl), str(tmp_path))
    assert n >= 1
    out = read_warc(str(tmp_path)).to_pandas().sort_values("uri")
    got = dict(zip(out["uri"], out["content"]))
    for i, t in enumerate(texts):
        assert got[f"https://example.org/doc/{i}"] == t
    got_bytes = dict(zip(out["uri"], out["n_bytes"]))
    for i, t in enumerate(texts):
        assert got_bytes[f"https://example.org/doc/{i}"] == len(t.encode())

    bad = tmp_path / "bad.warc"
    bad.write_bytes(b"WARC/1.0\r\nWARC-Type: resource\r\n\r\noops\r\n\r\n")
    with _pytest.raises(_ray.exceptions.RayTaskError,
                        match="Content-Length"):
        read_warc(str(bad)).materialize()


def test_minmax_norm_bounds_and_constant_group(ray_session, tmp_path):
    """Normalized values must span exactly [0, 1e6] per group (min -> 0,
    max -> 1e6), and a constant group normalizes to 0 by convention."""
    import pandas as pd

    from hsearch_ray.pipelines.queries import q_minmax_norm_events

    df = pd.DataFrame({
        "event_id": np.arange(7, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(7), unit="s"),
        "user_id": np.zeros(7, np.int64),
        "event_type": ["a", "a", "a", "b", "b", "c", "c"],
        "value": [1.0, 2.0, 3.0, 10.0, 20.0, 5.0, 5.0],
        "props": [""] * 7,
    })
    df.to_parquet(f"{tmp_path}/events.parquet", index=False)
    out = q_minmax_norm_events(str(tmp_path)).to_pandas() \
        .set_index("event_id")["norm_ppm"]
    assert out[0] == 0 and out[2] == 1_000_000 and out[1] == 500_000
    assert out[3] == 0 and out[4] == 1_000_000
    assert out[5] == 0 and out[6] == 0  # constant group


def test_boolean_search_conjunctive_semantics(ray_session, tmp_path):
    """AND semantics are exact whole-token: a doc with only 2 of 3
    terms, or with a term as a SUBSTRING of a longer token, must not
    hit; term order and repetition are irrelevant."""
    import pandas as pd

    from hsearch_ray.pipelines.queries import (
        _BM25_QUERIES,
        q_boolean_search_docs,
    )

    qid, terms = _BM25_QUERIES[0]
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            " ".join(terms),                       # all terms -> hit
            " ".join(terms[:-1]),                  # missing one -> no
            " ".join(t + "x" for t in terms),      # substrings -> no
            f"{terms[2]} pad {terms[0]} pad {terms[1]} {terms[0]}",
        ],
        "lang": ["en"] * 4, "source": ["t"] * 4,
    })
    docs["n_chars"] = docs["text"].str.len()
    docs.to_parquet(f"{tmp_path}/documents.parquet", index=False)
    out = q_boolean_search_docs(str(tmp_path)).to_pandas()
    hits = set(out[out["query_id"] == qid]["doc_id"])
    assert hits == {0, 3}


def test_triangle_count_planted_graphs(ray_session):
    """Wedge/closure semantics on hand-built graphs: a 4-clique has
    C(4,3)=4 triangles, a path graph (wedges, no closure) has 0, the
    two components never cross-count, and the result is independent of
    block layout (16 one-edge blocks force every join-key boundary)."""
    import ray

    from hsearch_ray.stages.graph import triangle_count

    # component 1: 4-clique on {0,1,2,3}; component 2: path 10-11-12-13
    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    path = [(10, 11), (11, 12), (12, 13)]
    edges = clique + path
    for nblocks in (1, 16):
        ds = ray.data.from_arrow(pa.table({
            "a": pa.array([e[0] for e in edges], pa.int64()),
            "b": pa.array([e[1] for e in edges], pa.int64()),
        })).repartition(nblocks)
        assert triangle_count(ds) == 4, nblocks


def test_mode_tie_break_and_block_independence(ray_session, tmp_path):
    """Grouped mode must break count ties to the lexicographically
    smallest type, and the argmax-by-join plan must not depend on how
    (user, type) rows land in blocks."""
    import pyarrow.parquet as pq

    from hsearch_ray.pipelines.queries import q_mode_event_type

    rows = (
        [(1, "b")] * 3 + [(1, "a")] * 3 + [(1, "c")] * 2   # tie a/b -> a
        + [(2, "z")] * 5 + [(2, "a")] * 4                   # clear winner z
        + [(3, "m")]                                        # singleton
    )
    df = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype=np.int64),
        "user_id": np.array([r[0] for r in rows], dtype=np.int64),
        "event_type": [r[1] for r in rows],
        "ts": pd.to_datetime(np.arange(len(rows)), unit="s"),
        "value": np.zeros(len(rows)),
        "props": [""] * len(rows),
    })
    ddir = tmp_path / "events.parquet"
    ddir.mkdir()
    t = pa.Table.from_pandas(df, preserve_index=False)
    # interleaved shards: every user's rows span shards/blocks
    for i in range(4):
        pq.write_table(t.take(list(range(i, len(rows), 4))),
                       ddir / f"part-{i}.parquet")
    out = q_mode_event_type(str(tmp_path)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert list(out["user_id"]) == [1, 2, 3]
    assert list(out["mode_type"]) == ["a", "z", "m"]
    assert list(out["n_events"]) == [3, 5, 1]


def test_lev_banded_fuzz_and_duckdb_parity(ray_session):
    """The row-vectorized banded Levenshtein must equal a per-cell DP
    reference whenever the true distance is within the band (and exceed
    the band otherwise), and match DuckDB's byte-level levenshtein()
    convention on multi-byte UTF-8."""
    import random

    from hsearch_ray.pipelines.queries import _lev_banded

    def ref(a: bytes, b: bytes) -> int:
        d = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            nd = [i] + [0] * len(b)
            for j in range(1, len(b) + 1):
                nd[j] = min(d[j] + 1, nd[j - 1] + 1,
                            d[j - 1] + (a[i - 1] != b[j - 1]))
            d = nd
        return d[len(b)]

    rng = random.Random(7)
    for _ in range(300):
        a = bytes(rng.choice(b"abc") for _ in range(rng.randint(0, 20)))
        b = bytes(rng.choice(b"abc") for _ in range(rng.randint(0, 20)))
        k = rng.randint(0, 12)
        want, got = ref(a, b), _lev_banded(a, b, k)
        assert (got == want) if want <= k else (got > k), (a, b, k)

    con = duckdb.connect()
    for s1, s2 in [("kitten", "sitting"), ("héllo", "hello"), ("abc", ""),
                   ("", ""), ("日本語", "日本")]:
        want = con.sql(
            f"SELECT levenshtein('{s1}', '{s2}')").fetchone()[0]
        assert _lev_banded(s1.encode(), s2.encode(), 100) == want, (s1, s2)


def test_mad_is_robust_dispersion(ray_session, tmp_path):
    """MAD semantics on a constructed table: a group with one extreme
    outlier keeps a small MAD (robustness), a constant group has MAD 0,
    and a symmetric group matches the hand value."""
    from hsearch_ray.pipelines.queries import q_mad_value_by_type

    rows = (
        [("a", v) for v in [10.0, 11.0, 12.0, 13.0, 14.0, 1e6]]  # outlier
        + [("b", 5.0)] * 4                                       # constant
        + [("c", v) for v in [1.0, 2.0, 3.0]]                    # |dev|=1,0,1
    )
    df = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype=np.int64),
        "ts": pd.to_datetime(np.arange(len(rows)), unit="s"),
        "user_id": np.zeros(len(rows), np.int64),
        "event_type": [r[0] for r in rows],
        "value": [r[1] for r in rows],
        "props": [""] * len(rows),
    })
    df.to_parquet(f"{tmp_path}/events.parquet", index=False)
    out = q_mad_value_by_type(str(tmp_path)).set_index("event_type")["mad_value"]
    # group a: median 12.5, devs {2.5,1.5,.5,.5,1.5,~1e6} -> MAD 1.5
    assert out["a"] == 1.5
    assert out["b"] == 0.0
    assert out["c"] == 1.0


def test_throttle_strictness_and_spill(ray_session):
    """Debounce semantics on adversarial timelines: gap EXACTLY 1h is
    suppressed (strictly-greater), each kept event resets the LAG
    reference to its own predecessor (not a window anchor), types and
    users throttle independently — identical at 1 and 16 blocks (every
    user through the spill regroup)."""
    import ray

    from hsearch_ray.stages.events import throttle_events

    H = 3600
    rows = [
        # u0/click at 0, +1h (== gap: drop), +1h+1s from PREVIOUS (kept:
        # LAG is per-event, so 7201 - 3600 = 3601 > 3600)
        (0, "click", 0), (0, "click", H), (0, "click", 2 * H + 1),
        # u0/view independent of clicks
        (0, "view", 10),
        # u1: dense burst -> only the first survives
        (1, "click", 0), (1, "click", 1), (1, "click", 2),
        # u1: far-apart pair -> both survive
        (1, "view", 0), (1, "view", 2 * H),
    ]
    df = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype=np.int64),
        "user_id": np.array([r[0] for r in rows], dtype=np.int64),
        "event_type": [r[1] for r in rows],
        "ts": pd.to_datetime([r[2] for r in rows],
                             unit="s").astype("datetime64[us]"),
    })
    want = {0, 2, 3, 4, 7, 8}  # event_ids surviving the debounce
    for nblocks in (1, 16):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = set(throttle_events(ds).to_pandas()["event_id"])
        assert got == want, nblocks

    # heavy-hitter stress: ONE user spanning every block (the case the
    # O(2 rows/block) spill exists for) — alternating 1s/2h gaps, so
    # every other event survives; identical at 1 and 32 blocks
    n = 4096
    gaps = np.where(np.arange(n) % 2 == 1, 1, 2 * H)
    secs = np.cumsum(gaps)
    hot = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.zeros(n, dtype=np.int64),
        "event_type": ["click"] * n,
        "ts": pd.to_datetime(secs, unit="s").astype("datetime64[us]"),
    })
    hot_want = set(range(0, n, 2))  # evens start each 1s-pair
    for nblocks in (1, 32):
        ds = ray.data.from_pandas(hot).repartition(nblocks)
        got = set(throttle_events(ds).to_pandas()["event_id"])
        assert got == hot_want, nblocks


def test_grouped_hll_accuracy_and_determinism(ray_session):
    """Grouped HLL per-group estimates land within 5% of exact distinct
    users (linear counting makes sf-scale groups near-exact), cover
    exactly the group set, and are deterministic run to run."""
    from hsearch_ray.pipelines.queries import QUERIES

    out1 = QUERIES["approx_users_by_type"](SF)
    out2 = QUERIES["approx_users_by_type"](SF)
    pd.testing.assert_frame_equal(out1, out2)

    events = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_type", "user_id"])
    exact = events.groupby("event_type")["user_id"].nunique()
    got = out1.set_index("event_type")["approx_users"]
    assert sorted(got.index) == sorted(exact.index)
    for et in exact.index:
        assert abs(int(got[et]) - int(exact[et])) <= max(1, 0.05 * exact[et]), et


def test_edit_pairs_complete_on_short_doc_adversaries(ray_session, tmp_path):
    """Pairs within 8 byte edits whose docs sit BELOW the 9k
    unique-bigram floor can drop bigram Jaccard under 1/2 (short docs;
    whitespace edits that split tokens) — the prefix-filter arm alone
    would silently miss them.  The brute length-band arm must recover
    every one: the query's output equals the full O(n^2) banded-DP
    relation on an adversarial corpus."""
    import pandas as pd
    import pyarrow.parquet as pq

    from hsearch_ray.pipelines import queries as Q

    # adversary 1: short docs, two substitutions -> bigram jaccard 0
    s1a, s1b = "a b c d e", "a q c r e"
    # adversary 2: one whitespace insert splits a token in a short doc
    s2a, s2b = "alpha beta gamma", "al pha beta gamma"
    # a normal long near-pair that must keep flowing through arm 1
    base = " ".join(f"tok{i}" for i in range(200))
    long_b = base.replace("tok7 ", "tokX ", 1)
    fillers = [" ".join(f"w{i}_{j}" for j in range(150)) for i in range(6)]
    texts = [s1a, s1b, s2a, s2b, base, long_b, *fillers]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    pq.write_table(pa.table(df), tmp_path / "documents.parquet")

    # fixture property: the adversarial pairs are IN the relation but
    # OUT of the unguarded candidate filter (bigram jaccard < 1/2)
    def bigrams(s):
        t = s.split()
        return {f"{x} {y}" for x, y in zip(t, t[1:])}

    for x, y in ((s1a, s1b), (s2a, s2b)):
        inter = len(bigrams(x) & bigrams(y))
        union = len(bigrams(x) | bigrams(y))
        assert 2 * inter < union, "fixture must defeat the prefix filter"
        assert Q._lev_banded(x.encode(), y.encode(), Q._EDIT_MAX) <= Q._EDIT_MAX

    got = Q.QUERIES["edit_pairs_docs"](str(tmp_path)).to_pandas()
    got_pairs = {(int(r.a), int(r.b)): int(r.edit_dist)
                 for r in got.itertuples(index=False)}

    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            d = Q._lev_banded(texts[i].encode(), texts[j].encode(),
                              Q._EDIT_MAX)
            if d <= Q._EDIT_MAX:
                want[(i, j)] = d
    assert (0, 1) in want and (2, 3) in want and (4, 5) in want
    assert got_pairs == want
