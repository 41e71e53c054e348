"""Second-tier verification levers: tokenizer canonicalization (M6) and
borderline token-similarity admission (F12/F13).

Reference analogs: compressed-alphabet encode makes matching robust to
symbol churn (hash_search.cpp:34-75), and banded alignment + SumEvalue
admit hits whose matching segments are re-ordered (hash_search.cpp:
718-948, 1199-1273)."""

import numpy as np
import pyarrow as pa
import pytest

from hsearch_ray import hashing as H
from hsearch_ray.config import PipelineConfig


def _mk_corpus(rows):
    return pa.table(
        {
            "repo": pa.array([r[0] for r in rows], pa.string()),
            "path": pa.array([r[1] for r in rows], pa.string()),
            "commit": pa.array(["head"] * len(rows), pa.string()),
            "lang": pa.array(["py"] * len(rows), pa.string()),
            "content": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def _funcs(n, rng, ident):
    out = []
    for i in range(n):
        body = "\n".join(
            f"    {ident}_{i}_{j} = {ident}_{i}_{j} * {int(rng.integers(2, 99))} + {j}"
            for j in range(6)
        )
        out.append(f"def {ident}_fn_{i}(x):\n{body}\n    return {ident}_{i}_0\n")
    return out


def _cluster_map(res):
    return {int(r["file_id"]): int(r["cluster_id"]) for r in res.clusters.take_all()}


def _fid(repo, path):
    return H.file_id_from_key(repo, path, "head")


def test_token_canonicalize_rename_only_clone(ray_session):
    """A rename-only clone (every identifier renamed) is missed at the
    default config and clustered with token_canonicalize=True, with the
    pytest oracle (reference_impl) agreeing in both modes."""
    import ray.data

    from hsearch_ray.pipelines.dedup import dedup_pipeline
    from hsearch_ray.reference_impl import run_reference

    rng = np.random.Generator(np.random.PCG64(11))
    base = "".join(_funcs(8, rng, "alpha"))
    renamed = base.replace("alpha", "omega_zz")
    filler = [
        ("r", f"f{i}.py", "".join(_funcs(8, np.random.Generator(np.random.PCG64(100 + i)), f"id{i}")))
        for i in range(20)
    ]
    corpus = _mk_corpus([("r", "base.py", base), ("r", "clone.py", renamed)] + filler)

    j_raw = H.exact_jaccard(
        H.shingle_hashes(H.normalize_for_shingles(base.encode()), 9),
        H.shingle_hashes(H.normalize_for_shingles(renamed.encode()), 9),
    )
    j_canon = H.exact_jaccard(
        H.shingle_hashes(H.normalize_for_shingles(base.encode(), True), 9),
        H.shingle_hashes(H.normalize_for_shingles(renamed.encode(), True), 9),
    )
    assert j_raw < 0.7 <= j_canon  # the fixture exercises exactly the lever

    a, b = sorted((_fid("r", "base.py"), _fid("r", "clone.py")))
    for canon in (False, True):
        cfg = PipelineConfig(token_canonicalize=canon)
        res = dedup_pipeline(ray.data.from_arrow(corpus), cfg)
        cm = _cluster_map(res)
        ref = run_reference(corpus, cfg)
        ref_cm = {
            int(f): int(c)
            for f, c in zip(ref.clusters["file_id"].to_pylist(),
                            ref.clusters["cluster_id"].to_pylist())
        }
        assert cm == ref_cm  # distributed == single-process oracle
        assert (cm[a] == cm[b]) is canon


def test_edit_tier_admits_reordered_functions(ray_session):
    """A clone with the same functions in a different order (plus noise
    lines) falls below the Jaccard threshold but inside the borderline
    band; the token-similarity tier admits it as method="edit"."""
    import ray.data

    from hsearch_ray.pipelines.dedup import dedup_pipeline

    rng = np.random.Generator(np.random.PCG64(23))
    funcs = _funcs(10, rng, "mix")
    base = "".join(funcs)
    order = list(rng.permutation(10))
    noise = [f"# pad_{i} {int(rng.integers(0, 9999))}\n" for i in range(10)]

    def _tweak(f: str, i: int) -> str:
        # change one constant per function: a small token-level edit that
        # costs a whole line's worth of shingles
        lines = f.split("\n")
        lines[1] = lines[1].rsplit("+", 1)[0] + f"+ {8000 + i}"
        lines[2] = lines[2].rsplit("+", 1)[0] + f"+ {9000 + i}"
        lines[4] = lines[4].rsplit("+", 1)[0] + f"+ {7000 + i}"
        return "\n".join(lines)

    clone = "".join(_tweak(funcs[i], i) + noise[i] for i in order)

    j = H.exact_jaccard(
        H.shingle_hashes(H.normalize_for_shingles(base.encode()), 9),
        H.shingle_hashes(H.normalize_for_shingles(clone.encode()), 9),
    )
    assert 0.55 <= j < 0.7, f"fixture jaccard {j} outside the borderline band"

    filler = [
        ("r", f"g{i}.py", "".join(_funcs(8, np.random.Generator(np.random.PCG64(500 + i)), f"zz{i}")))
        for i in range(20)
    ]
    corpus = _mk_corpus([("r", "base.py", base), ("r", "clone.py", clone)] + filler)
    a, b = sorted((_fid("r", "base.py"), _fid("r", "clone.py")))

    # wide bands (32x4) make LSH recall at borderline jaccard ~1
    off = PipelineConfig(num_bands=32, rows_per_band=4, edit_band=0.15)
    on = PipelineConfig(num_bands=32, rows_per_band=4, edit_band=0.15,
                        edit_verify=True)

    res_off = dedup_pipeline(ray.data.from_arrow(corpus), off)
    cm_off = _cluster_map(res_off)
    assert cm_off[a] != cm_off[b]

    res_on = dedup_pipeline(ray.data.from_arrow(corpus), on)
    cm_on = _cluster_map(res_on)
    assert cm_on[a] == cm_on[b]
    rows = {(int(r["a"]), int(r["b"])): r for r in res_on.pairs.take_all()}
    assert rows[(a, b)]["method"] == "edit"
    assert rows[(a, b)]["jaccard"] >= on.edit_sim_threshold

def test_edit_tier_sharded_store_matches_bag_similarity(ray_session, monkeypatch):
    """The sharded edit tier scores every borderline pair exactly as the
    per-pair token_bag_similarity reference (hash collisions aside), and
    it builds its content through the id-range-sharded token store — the
    corpus is never collected into a driver-side dict."""
    import ray.data

    from hsearch_ray.stages import verify as V
    from hsearch_ray.stages.normalize import normalize

    rng = np.random.Generator(np.random.PCG64(77))
    rows = []
    for i in range(12):
        body = " ".join(str(rng.integers(0, 999)) for _ in range(40))
        rows.append(("r", f"d{i}.py", f"def f{i}():\n    return {body}\n"))
    # a shuffled-token clone of d0: bag-similar, shingle-dissimilar
    toks = rows[0][2].split()
    rng.shuffle(toks)
    rows.append(("r", "shuf.py", " ".join(toks)))
    corpus = normalize(ray.data.from_arrow(_mk_corpus(rows))).materialize()
    ids = corpus.to_pandas()[["file_id"]]["file_id"].to_numpy(np.int64)
    ids.sort()

    # all adjacent-id pairs as the "borderline band"
    import pyarrow as _pa
    pairs = ray.data.from_arrow(_pa.table({
        "a": _pa.array(ids[:-1], _pa.int64()),
        "b": _pa.array(ids[1:], _pa.int64()),
    }))

    calls = {"n": 0}
    real_build = V.build_edit_token_store

    def counting_build(corpus_ds, cand, canon):
        calls["n"] += 1
        return real_build(corpus_ds, cand, canon)

    monkeypatch.setattr(V, "build_edit_token_store", counting_build)

    cfg = PipelineConfig(edit_verify=True, edit_sim_threshold=0.0)
    out = V.edit_verify_pairs(pairs, corpus, cfg).to_pandas()
    assert calls["n"] == 1  # content attach goes through the sharded store

    cmap = {
        int(r["file_id"]):
            r["content"] if isinstance(r["content"], bytes)
            else str(r["content"]).encode()
        for r in corpus.to_pandas().to_dict("records")
    }
    got = {(int(r.a), int(r.b)): float(r.jaccard)
           for r in out.itertuples(index=False)}
    assert len(got) == ids.size - 1
    for x, y in zip(ids[:-1], ids[1:]):
        want = V.token_bag_similarity(
            H.normalize_for_shingles(cmap[int(x)]),
            H.normalize_for_shingles(cmap[int(y)]),
        )
        assert abs(got[(int(x), int(y))] - want) < 1e-6, (x, y)
