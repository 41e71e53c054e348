"""Deterministic synthetic source-code corpus (FIXTURES.md F1/F2).

Shape mandated by BASELINE.json.input_hint:
  (repo:string, path:string, commit:string, lang:string, content:string)

Alongside the corpus a ``truth`` table records planted duplicate
structure (exact clones, near clones at several edit rates, containment
pairs, a hot near-identical bucket, and boilerplate-sharing negatives),
mirroring the reference's planted-cluster fixture strategy
(/root/reference/hclust/src/hclust/shuffle_kmers.cpp:13-65 renames
members ``motif<i>_seq<j>`` so recovery is checkable by name).

Everything is a pure function of ``seed`` — no wall clock, no global RNG.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_LANGS = ["py", "java", "js", "c", "go"]
_KEYWORDS = {
    "py": ["def", "return", "class", "import", "for", "if", "else", "with", "yield"],
    "java": ["public", "static", "void", "class", "return", "new", "int", "final"],
    "js": ["function", "const", "let", "return", "var", "class", "async", "await"],
    "c": ["int", "void", "return", "static", "struct", "char", "for", "while"],
    "go": ["func", "return", "var", "type", "struct", "range", "defer", "go"],
}
_IDENT_PARTS = [
    "data", "index", "node", "hash", "list", "map", "key", "value", "buf",
    "count", "size", "item", "row", "col", "tmp", "res", "acc", "ptr", "ctx",
    "cfg", "job", "task", "queue", "lock", "pool", "span", "leaf", "root",
]
_LICENSE = (
    "// Licensed under the Apache License, Version 2.0 (the \"License\");\n"
    "// you may not use this file except in compliance with the License.\n"
    "// You may obtain a copy of the License at http://www.apache.org/licenses/\n"
)


def _ident(rng: np.random.Generator) -> str:
    parts = rng.choice(_IDENT_PARTS, size=rng.integers(1, 3), replace=True)
    return "_".join(parts) + str(rng.integers(0, 100))


def _function_block(rng: np.random.Generator, lang: str) -> str:
    kw = _KEYWORDS[lang]
    name = _ident(rng)
    lines = [f"{kw[0]} {name}(a, b, c):" if lang == "py" else f"{kw[0]} {name}(a, b, c) {{"]
    for _ in range(int(rng.integers(3, 12))):
        v = _ident(rng)
        op = rng.choice(["+", "-", "*", "%", "|", "&"])
        expr = f"{_ident(rng)} {op} {int(rng.integers(0, 1000))}"
        k = rng.choice(kw)
        lines.append(f"    {v} = {expr}  # {k}")
    lines.append("    return " + _ident(rng) if lang == "py" else "}")
    return "\n".join(lines) + "\n"


def _make_content(rng: np.random.Generator, lang: str, nblocks: int) -> str:
    blocks = [_LICENSE] if rng.random() < 0.4 else []
    blocks += [_function_block(rng, lang) for _ in range(nblocks)]
    return "\n".join(blocks)


def _mutate(rng: np.random.Generator, content: str, n_edits: int) -> str:
    """Seeded near-clone edits: identifier rename / line insert / line delete /
    whitespace churn (FIXTURES.md F2 'near clones')."""
    lines = content.split("\n")
    for _ in range(n_edits):
        kind = rng.integers(0, 4)
        if len(lines) < 3:
            break
        i = int(rng.integers(0, len(lines)))
        if kind == 0:  # rename an identifier occurrence
            lines[i] = lines[i].replace("a", "aa", 1) if "a" in lines[i] else lines[i] + " "
        elif kind == 1:  # insert a line
            lines.insert(i, f"    {_ident(rng)} = {int(rng.integers(0, 1000))}")
        elif kind == 2:  # delete a line
            del lines[i]
        else:  # whitespace churn
            lines[i] = lines[i] + "  "
    return "\n".join(lines)


def generate_corpus(
    n_files: int = 200,
    seed: int = 42,
    dup_fraction: float = 0.35,
    hot_bucket_size: int = 0,
) -> tuple[pa.Table, pa.Table]:
    """Return ``(corpus, truth)`` Arrow tables.

    corpus: repo, path, commit, lang, content   (globally shuffled row order)
    truth:  repo, path, commit, truth_cluster:int64, kind:string
    """
    rng = np.random.Generator(np.random.PCG64(seed))
    rows: list[dict] = []
    truth_cluster = 0

    def emit(content: str, lang: str, cluster: int, kind: str) -> None:
        g, r = int(rng.integers(0, 40)), int(rng.integers(0, 50))
        repo = f"org{g:03d}/repo{r:03d}"
        path = f"src/pkg{int(rng.integers(0, 30)):02d}/{_ident(rng)}{len(rows)}.{lang}"
        commit = hashlib.sha1(f"{repo}:{seed}".encode()).hexdigest()[:12]
        rows.append(
            dict(repo=repo, path=path, commit=commit, lang=lang,
                 content=content, truth_cluster=cluster, kind=kind)
        )

    n_dup_bases = int(n_files * dup_fraction / 3) or 1
    n_unique = n_files - n_dup_bases * 3 - (hot_bucket_size if hot_bucket_size else 0)

    # planted duplicate clusters: base + exact clone + near clones at edit tiers
    for _ in range(n_dup_bases):
        truth_cluster += 1
        lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
        base = _make_content(rng, lang, int(rng.integers(4, 14)))
        emit(base, lang, truth_cluster, "base")
        style = int(rng.integers(0, 3))
        if style == 0:      # exact clone (different repo/path) — sha256 dedup
            emit(base, lang, truth_cluster, "exact")
            emit(base.replace("\n", "\r\n"), lang, truth_cluster, "crlf")
        elif style == 1:    # near clones, light + medium edits
            emit(_mutate(rng, base, 1), lang, truth_cluster, "near_hi")
            emit(_mutate(rng, base, 3), lang, truth_cluster, "near_mid")
        else:               # containment: base embedded in a larger file
            extra = _function_block(rng, lang) + _function_block(rng, lang)
            emit(base + "\n" + extra, lang, truth_cluster, "contains")
            emit(_mutate(rng, base, 1), lang, truth_cluster, "near_hi")

    # hot bucket: one cluster of near-identical files (skew fixture)
    if hot_bucket_size:
        truth_cluster += 1
        base = _make_content(rng, "py", 8)
        for _ in range(hot_bucket_size):
            emit(_mutate(rng, base, 1), "py", truth_cluster, "hot")

    # negatives: unrelated files (some share only the license header)
    for _ in range(max(n_unique, 0)):
        lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
        emit(_make_content(rng, lang, int(rng.integers(3, 16))), lang, 0, "unique")

    # seeded global permutation (analog of shuffle_kmers.cpp:39-57)
    order = rng.permutation(len(rows))
    rows = [rows[i] for i in order]

    corpus = pa.table(
        {
            "repo": pa.array([r["repo"] for r in rows], pa.string()),
            "path": pa.array([r["path"] for r in rows], pa.string()),
            "commit": pa.array([r["commit"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            "content": pa.array([r["content"] for r in rows], pa.string()),
        }
    )
    truth = pa.table(
        {
            "repo": pa.array([r["repo"] for r in rows], pa.string()),
            "path": pa.array([r["path"] for r in rows], pa.string()),
            "commit": pa.array([r["commit"] for r in rows], pa.string()),
            "truth_cluster": pa.array([r["truth_cluster"] for r in rows], pa.int64()),
            "kind": pa.array([r["kind"] for r in rows], pa.string()),
        }
    )
    return corpus, truth


def documents_to_corpus(docs: pa.Table) -> pa.Table:
    """Adapt the driver's ``documents`` table (doc_id, text, lang, source,
    n_chars) to the north-rule corpus shape.  doc_id becomes the path so
    ``file_id`` stays deterministic."""
    n = docs.num_rows
    doc_id = docs["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "repo": pa.array(
                [f"src/{s}" for s in docs["source"].to_pylist()], pa.string()
            ),
            "path": pa.array([f"doc/{int(d)}.txt" for d in doc_id], pa.string()),
            "commit": pa.array(["head"] * n, pa.string()),
            "lang": docs["lang"].cast(pa.string()),
            "content": docs["text"].cast(pa.string()),
        }
    )
