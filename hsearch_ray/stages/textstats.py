"""Text-analysis stages over a documents table: token counting, quality
stats, marker-based language ID, winnowing fingerprint counts.

These are the training-data-pipeline operators layered on the dedup
engine (driver brief): each is a vectorized ``map_batches`` whose
semantics are deliberately SQL-mirrorable so the DuckDB oracle can
verify them value-for-value (pipelines/queries.py holds the SQL).

The marker heuristics use the replace-length counting trick so Python
and SQL agree exactly: count(p) = (len(t) - len(t.replace(p, ''))) / len(p)
— greedy left-to-right non-overlapping in both engines.
"""

from __future__ import annotations

import pandas as pd

# marker words per language, surrounded by spaces (order = tiebreak priority)
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " la ", " et "],
    "es": [" el ", " que ", " los "],
}


def token_count_batch(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, n_tokens): whitespace-separated token count."""
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_tokens": df["text"].str.count(r"\S+").astype("int64"),
        }
    )


def quality_stats_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Per-doc quality stats.  All ratios are one IEEE division of two
    exactly-represented ints -> bit-identical to the SQL oracle."""
    text = df["text"]
    n_chars = text.str.len().astype("int64")
    n_spaces = (n_chars - text.str.replace(" ", "", regex=False).str.len()).astype("int64")
    n_tokens = text.str.count(r"\S+").astype("int64")
    avg_token_len = ((n_chars - n_spaces) / n_tokens.clip(lower=1)).round(6)
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_chars_calc": n_chars,
            "n_spaces": n_spaces,
            "n_tokens": n_tokens,
            "avg_token_len": avg_token_len,
        }
    )


def _marker_count(text: pd.Series, pattern: str) -> pd.Series:
    removed = text.str.replace(pattern, "", regex=False).str.len()
    return ((text.str.len() - removed) // len(pattern)).astype("int64")


def langid_batch(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, predicted): argmax of marker-word counts, priority-order
    tiebreak en > de > fr > es, 'other' when all are zero."""
    text = df["text"]
    scores = {
        lang: sum(_marker_count(text, m) for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }
    c_en, c_de, c_fr, c_es = scores["en"], scores["de"], scores["fr"], scores["es"]
    predicted = pd.Series("other", index=df.index)
    mask_es = c_es > 0
    predicted[mask_es] = "es"
    mask_fr = (c_fr >= c_es) & (c_fr > 0)
    predicted[mask_fr] = "fr"
    mask_de = (c_de >= c_fr) & (c_de >= c_es) & (c_de > 0)
    predicted[mask_de] = "de"
    mask_en = (c_en >= c_de) & (c_en >= c_fr) & (c_en >= c_es) & (c_en > 0)
    predicted[mask_en] = "en"
    return pd.DataFrame({"doc_id": df["doc_id"], "predicted": predicted})


def token_counts(docs_ds):
    return docs_ds.map_batches(token_count_batch, batch_format="pandas", batch_size=4096)


def quality_stats(docs_ds):
    return docs_ds.map_batches(quality_stats_batch, batch_format="pandas", batch_size=4096)


def langid(docs_ds):
    return docs_ds.map_batches(langid_batch, batch_format="pandas", batch_size=4096)
