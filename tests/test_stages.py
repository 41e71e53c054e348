"""Stage-level tests: textstats, ANN, containment, edge-case contents."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hsearch_ray.config import PipelineConfig


def test_token_count_matches_regex():
    from hsearch_ray.stages.textstats import token_count_batch

    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a b  c", "", "  x "]})
    out = token_count_batch(df)
    assert list(out["n_tokens"]) == [3, 0, 1]


def test_langid_priority_tiebreak():
    from hsearch_ray.stages.textstats import langid_batch

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "x the y and z", "x der y und z", "no markers here",
                " the  der ",  # tie en==de -> en wins
            ],
        }
    )
    out = langid_batch(df)
    assert list(out["predicted"]) == ["en", "de", "other", "en"]


def test_quality_stats_division():
    from hsearch_ray.stages.textstats import quality_stats_batch

    df = pd.DataFrame({"doc_id": [1], "text": ["ab cd"]})
    out = quality_stats_batch(df)
    assert out["n_chars_calc"][0] == 5
    assert out["n_spaces"][0] == 1
    assert out["n_tokens"][0] == 2
    assert out["avg_token_len"][0] == 2.0


def test_stopword_stats_token_exact():
    from hsearch_ray.stages.textstats import stopword_stats_batch

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "The cat and the, dog",  # "the," is NOT a stopword token
                "THE AND OF",            # case-insensitive membership
                "   ",                   # whitespace-only: no row
                "xyz",
            ],
        }
    )
    out = stopword_stats_batch(df).reset_index(drop=True)
    assert list(out["doc_id"]) == [1, 2, 4]
    assert list(out["n_tokens"]) == [5, 3, 1]
    # doc 1: "The", "and" count; "the," does not (token-exact)
    assert list(out["n_stop"]) == [2, 3, 0]
    assert out["stop_ratio"][0] == round(2 / 5, 6)


def test_bpe_token_count_segments():
    from hsearch_ray.stages.textstats import bpe_token_count_batch

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            # "it's  x9!!" -> ["it", "'s", "  ", "x", "9", "!!"] = 6
            "text": ["it's  x9!!", "", "don't stop"],
        }
    )
    out = bpe_token_count_batch(df)
    # doc 3: ["don", "'t", " stop"] = 3
    assert list(out["n_bpe_tokens"]) == [6, 0, 3]


def test_line_dedup_counts_multiplicity(ray_session, tmp_path):
    """Cross-doc line dedup: duplicate lines count by corpus-wide
    multiplicity (two copies INSIDE one doc are dups; empty lines
    shared across docs are dups; a unique line is not)."""
    import pyarrow.parquet as pq

    from hsearch_ray.pipelines.queries import q_line_dedup_docs

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "same\nsame\nunique one",   # internal dup pair
                    "shared\n\ntail a",          # empty line also in doc 3
                    "shared\n\ntail b",
                ],
                pa.string(),
            ),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(docs, d / "documents.parquet")
    out = (
        q_line_dedup_docs(str(d)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out["n_lines"]) == [3, 3, 3]
    # doc 1: same+same dup, unique not; docs 2/3: shared + empty dup
    assert list(out["n_dup_lines"]) == [2, 2, 2]


def test_line_dedup_non_ascii_matches_duckdb(ray_session, tmp_path):
    """Arrow split_pattern + polars hash agree with DuckDB string_split
    + group-by-text on multibyte UTF-8 and CRLF content (the sf fixture
    corpora are all-ASCII, so pin the encoding edge here)."""
    import duckdb
    import pyarrow.parquet as pq

    from hsearch_ray.pipelines.queries import ORACLE_SQL, q_line_dedup_docs

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "café \U0001f600\nzeile eins",
                    "café \U0001f600\r\nzeile zwei",  # CRLF: "...\r" differs
                    "zeile eins\nsolo",
                ],
                pa.string(),
            ),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(docs, d / "documents.parquet")
    mine = (
        q_line_dedup_docs(str(d)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    oracle = (
        con.sql(ORACLE_SQL["line_dedup_docs"]).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert mine.astype("int64").equals(oracle.astype("int64"))
    # the CRLF doc's first line ends in \r -> NOT a dup of doc 1's;
    # only "zeile eins" (docs 1 and 3) is duplicated
    assert list(mine["n_dup_lines"]) == [1, 0, 1]


def test_exact_dedup_queries_on_planted_dups(ray_session, tmp_path):
    """The testdata has no exact-dup texts (the driver check is vacuous
    for the pair form): plant real dups and pin survivors + pairs."""
    import pyarrow.parquet as pq

    from hsearch_ray.pipelines.queries import (q_exact_dedup_docs,
                                               q_exact_dup_pairs_docs)

    docs = pa.table(
        {
            "doc_id": pa.array([10, 20, 30, 40, 50], pa.int64()),
            "text": pa.array(["dup", "dup", "solo", "dup", "other"],
                             pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(docs, d / "documents.parquet")
    surv = q_exact_dedup_docs(str(d)).sort_values("doc_id")
    assert list(surv["doc_id"]) == [10, 30, 50]
    assert list(surv["n_copies"]) == [3, 1, 1]
    pairs = (q_exact_dup_pairs_docs(str(d)).to_pandas()
             .sort_values(["a", "b"]))
    assert list(map(tuple, pairs.to_numpy())) == [(10, 20), (10, 40),
                                                  (20, 40)]


def test_ann_brute_force_exact(ray_session):
    import ray.data

    from hsearch_ray.stages.ann import brute_force_topk

    rng = np.random.Generator(np.random.PCG64(5))
    emb = rng.standard_normal((100, 16)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(100), pa.int64()),
            "embedding": pa.array([list(map(float, e)) for e in emb],
                                  pa.list_(pa.float32())),
        }
    )
    queries = {0: emb[0].astype(np.float64), 7: emb[7].astype(np.float64)}
    got = brute_force_topk(ray.data.from_arrow(tbl), queries, k=3).to_pandas()
    # numpy oracle
    e64 = emb.astype(np.float64)
    norm = e64 / np.linalg.norm(e64, axis=1, keepdims=True)
    for qid in queries:
        sims = norm @ norm[qid]
        sims[qid] = -np.inf
        want = set(np.argsort(-np.round(sims, 6), kind="stable")[:3])
        have = set(got.loc[got["query_id"] == qid, "neighbor_id"])
        assert have == want


def test_containment_finds_planted_pair(ray_session):
    import ray.data

    from hsearch_ray.stages.containment import containment_pairs
    from hsearch_ray.stages.normalize import normalize
    from hsearch_ray.stages.signatures import sign

    base = "def f(x):\n    return x + 1\n" * 30
    big = base + "def g(y):\n    return y * 2\n" * 30
    other = "class Z:\n    pass\n" * 40
    tbl = pa.table(
        {
            "repo": ["r"] * 3, "path": ["a", "b", "c"], "commit": ["c"] * 3,
            "lang": ["py"] * 3, "content": [base, big, other],
        }
    )
    cfg = PipelineConfig()
    corpus = normalize(ray.data.from_arrow(tbl)).materialize()
    pairs = containment_pairs(sign(corpus, cfg, with_fingerprints=True), corpus, cfg)
    rows = pairs.take_all()
    assert len(rows) >= 1
    assert all(r["containment"] >= cfg.containment_threshold for r in rows)
    # base ⊂ big must be among them
    fids = {int(r["a"]) for r in rows} | {int(r["b"]) for r in rows}
    assert len(fids) == 2  # only base & big, not `other`


def test_pipeline_edge_contents(ray_session):
    """Empty, 1-char, shorter-than-k, non-ASCII, huge-line rows survive the
    full pipeline with sha256 intact and no spurious pairs."""
    import hashlib

    import ray.data

    from hsearch_ray.pipelines.dedup import dedup_pipeline

    contents = ["", "x", "ab", "héllo wörld 中文 😀" * 3, "z" * 50000]
    tbl = pa.table(
        {
            "repo": ["r"] * 5, "path": [f"p{i}" for i in range(5)],
            "commit": ["c"] * 5, "lang": ["py"] * 5, "content": contents,
        }
    )
    res = dedup_pipeline(ray.data.from_arrow(tbl), PipelineConfig())
    assert res.clusters.count() == 5
    assert res.pairs.count() == 0
    kept = res.kept.take_all()
    assert {r["sha256"] for r in kept} == {
        hashlib.sha256(c.encode()).hexdigest() for c in contents
    }


def test_crlf_pair_detected(ray_session):
    """CRLF and LF variants: distinct sha256 but near-identical shingles ->
    must land in the same cluster via the MinHash path (F5)."""
    import ray.data

    from hsearch_ray.pipelines.dedup import dedup_pipeline

    lf = "def f(x):\n    return x + 1\n" * 20
    crlf = lf.replace("\n", "\r\n")
    tbl = pa.table(
        {
            "repo": ["r", "r"], "path": ["a.py", "b.py"], "commit": ["c"] * 2,
            "lang": ["py"] * 2, "content": [lf, crlf],
        }
    )
    res = dedup_pipeline(ray.data.from_arrow(tbl), PipelineConfig())
    cl = {int(r["file_id"]): int(r["cluster_id"]) for r in res.clusters.take_all()}
    assert len(set(cl.values())) == 1


def test_cut_dup_spans_matches_bruteforce(ray_session):
    """cut_dup_spans == a per-corpus brute-force reimplementation of the
    Lee-et-al cut semantics (owner = min doc_id keeps; every other
    occurrence's [p, p+k) window is removed; windows merge)."""
    import ray.data

    from hsearch_ray.stages.ngramdup import cut_dup_spans

    k = 8
    shared = "the quick brown fox jumps over the lazy dog"
    docs = {
        1: f"alpha {shared} omega",
        2: f"prefix {shared} suffix text",          # loses the shared span
        3: "completely unrelated content here",
        4: f"{shared}",                              # loses everything
        5: "short",                                  # < k: untouched
        6: "",                                       # empty: untouched
        7: f"tail omega {shared}",                   # 'omega'? too short to share alone
    }

    def brute():
        from collections import defaultdict

        owner: dict[str, int] = {}
        holders = defaultdict(set)
        for d in sorted(docs):
            t = docs[d]
            for p in range(max(0, len(t) - k + 1)):
                g = t[p:p + k]
                holders[g].add(d)
                owner.setdefault(g, d)
        out = {}
        for d, t in docs.items():
            cov = [False] * len(t)
            for p in range(max(0, len(t) - k + 1)):
                g = t[p:p + k]
                if len(holders[g]) >= 2 and owner[g] != d:
                    for j in range(p, p + k):
                        cov[j] = True
            out[d] = ("".join(c for c, m in zip(t, cov) if not m),
                      sum(cov))
        return out

    ds = ray.data.from_items(
        [{"doc_id": d, "text": t} for d, t in docs.items()]
    ).repartition(3)
    got = {
        int(r["doc_id"]): (r["clean_text"], int(r["n_cut"]))
        for r in cut_dup_spans(ds, k=k).to_pandas().to_dict("records")
    }
    want = brute()
    assert got == want
    assert got[5] == ("short", 0) and got[6] == ("", 0)
    assert got[4][0] == "" and got[4][1] == len(shared)
    assert got[1] == (docs[1], 0)  # min-id owner keeps every span


def test_textstats_arrow_kernels_equal_pandas_reference():
    """The Arrow-native kernels (pyarrow.compute, zero pandas copies)
    must agree value-for-value with the readable pandas reference
    kernels on a fuzz corpus covering unicode, CRLF, leading/trailing
    whitespace, zero-token docs and marker-word collisions."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from hsearch_ray.stages import textstats as T

    rng = np.random.default_rng(4)
    words = ["the", "und", "le", "los", "Zürich", "naïve", "x1",
             "...", "a", "--", "der", "que", "et", "of", "die"]
    texts = []
    for i in range(200):
        n = int(rng.integers(0, 30))
        t = " ".join(rng.choice(words, n))
        if i % 7 == 0:
            t = "  " + t + "\t"
        if i % 11 == 0:
            t = t.replace(" ", "\r\n", 1)
        if i % 13 == 0:
            t = ""
        texts.append(t)
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    batch = pa.table(df)

    for arrow_fn, pandas_fn, sort_cols in (
        (T.token_count_arrow, T.token_count_batch, ["doc_id"]),
        (T.quality_stats_arrow, T.quality_stats_batch, ["doc_id"]),
        (T.stopword_stats_arrow, T.stopword_stats_batch, ["doc_id"]),
        (T.bpe_token_count_arrow, T.bpe_token_count_batch, ["doc_id"]),
        (T.langid_arrow, T.langid_batch, ["doc_id"]),
    ):
        got = arrow_fn(batch).to_pandas().sort_values(sort_cols) \
            .reset_index(drop=True)
        want = pandas_fn(df).reset_index(drop=True)
        want = pd.DataFrame({c: want[c].to_numpy() for c in want.columns}) \
            .sort_values(sort_cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False), \
            arrow_fn.__name__
