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


# token-exact English stopword list (lowercased comparison); kept small
# and fixed so the SQL oracle embeds the same literal set
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
    "was", "were", "be", "been", "it", "that", "this", "for", "on",
    "with", "as", "at", "by", "from", "not", "but", "if", "then",
    "they", "we",
)

# GPT-2-style byte-pair pre-tokenizer regex (contractions, letter runs,
# digit runs, punctuation runs, whitespace runs) — RE2 and Python `re`
# agree on it (leftmost-first alternation, no lookarounds)
BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def stopword_stats_batch(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, n_tokens, n_stop, stop_ratio): whitespace tokens whose
    lowercase form is in STOPWORDS, token-EXACT membership (not a
    substring heuristic).  Docs with zero tokens emit no row — the same
    shape the SQL unnest produces.  Ratio is one IEEE division of two
    exactly-represented ints, rounded to 6."""
    toks = df["text"].str.findall(r"\S+")
    n_tokens = toks.str.len().astype("int64")
    ex = toks.explode().dropna()
    n_stop = (
        ex.str.lower().isin(STOPWORDS).groupby(level=0).sum()
        .reindex(n_tokens.index, fill_value=0).astype("int64")
    )
    keep = (n_tokens > 0).to_numpy()
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].to_numpy()[keep],
            "n_tokens": n_tokens.to_numpy()[keep],
            "n_stop": n_stop.to_numpy()[keep],
            "stop_ratio": (
                n_stop.to_numpy()[keep] / n_tokens.to_numpy()[keep]
            ).round(6),
        }
    )


def bpe_token_count_batch(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, n_bpe_tokens): count of BPE_RE pre-tokenizer matches —
    the 'BPE-ish regex' token budget a training pipeline estimates
    before real tokenization."""
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_bpe_tokens": df["text"].str.count(BPE_RE).astype("int64"),
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


# ---------------------------------------------------------------------
# Arrow-native kernels (the scrub_batch discipline: RE2 via
# pyarrow.compute on zero-copy batches, no pandas conversion).  The
# pandas *_batch kernels above stay as the readable reference — a
# pytest pins arrow == pandas on a fuzz corpus, and the SQL oracles
# check the arrow path end to end (the wrappers below use it).
# ---------------------------------------------------------------------

def token_count_arrow(batch):
    import pyarrow as pa
    import pyarrow.compute as pc

    n = pc.count_substring_regex(batch["text"], r"\S+")
    return pa.table({"doc_id": batch["doc_id"].cast(pa.int64()),
                     "n_tokens": n.cast(pa.int64())})


def quality_stats_arrow(batch):
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    text = batch["text"]
    n_chars = pc.utf8_length(text).cast(pa.int64())
    stripped = pc.utf8_length(
        pc.replace_substring(text, pattern=" ", replacement=""))
    n_spaces = pc.subtract(n_chars, stripped.cast(pa.int64()))
    n_tokens = pc.count_substring_regex(text, r"\S+").cast(pa.int64())
    nc = n_chars.to_numpy(zero_copy_only=False)
    nsp = n_spaces.to_numpy(zero_copy_only=False)
    nt = n_tokens.to_numpy(zero_copy_only=False)
    avg = np.round((nc - nsp) / np.maximum(nt, 1), 6)
    return pa.table({
        "doc_id": batch["doc_id"].cast(pa.int64()),
        "n_chars_calc": n_chars,
        "n_spaces": n_spaces,
        "n_tokens": n_tokens,
        "avg_token_len": pa.array(avg, pa.float64()),
    })


def stopword_stats_arrow(batch):
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    toks = pc.split_pattern_regex(
        pc.utf8_lower(batch["text"]), pattern=r"\s+").combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype("int64")
    flat = toks.values
    # split emits empty strings at run boundaries — they are not tokens
    nonempty = pc.greater(pc.utf8_length(flat), 0)
    is_stop = pc.and_(nonempty, pc.is_in(
        flat, value_set=pa.array(STOPWORDS, pa.string())))
    ne = nonempty.to_numpy(zero_copy_only=False).astype("int64")
    st = is_stop.to_numpy(zero_copy_only=False).astype("int64")
    starts = offsets[:-1] - offsets[0]
    ends = offsets[-1] - offsets[0]
    cum_ne = np.concatenate([[0], np.cumsum(ne[: ends])])
    cum_st = np.concatenate([[0], np.cumsum(st[: ends])])
    stops_rel = offsets[1:] - offsets[0]
    n_tokens = cum_ne[stops_rel] - cum_ne[starts]
    n_stop = cum_st[stops_rel] - cum_st[starts]
    keep = n_tokens > 0
    ratio = np.round(n_stop[keep] / n_tokens[keep], 6)
    return pa.table({
        "doc_id": batch["doc_id"].cast(pa.int64()).filter(pa.array(keep)),
        "n_tokens": pa.array(n_tokens[keep], pa.int64()),
        "n_stop": pa.array(n_stop[keep], pa.int64()),
        "stop_ratio": pa.array(ratio, pa.float64()),
    })


def bpe_token_count_arrow(batch):
    import pyarrow as pa
    import pyarrow.compute as pc

    n = pc.count_substring_regex(batch["text"], BPE_RE)
    return pa.table({"doc_id": batch["doc_id"].cast(pa.int64()),
                     "n_bpe_tokens": n.cast(pa.int64())})


def langid_arrow(batch):
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    text = batch["text"]
    n_chars = pc.utf8_length(text).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)

    def count(p: str):
        removed = pc.utf8_length(
            pc.replace_substring(text, pattern=p, replacement="")
        ).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return (n_chars - removed) // len(p)

    s = {lang: sum(count(m) for m in ms)
         for lang, ms in LANG_MARKERS.items()}
    c_en, c_de, c_fr, c_es = s["en"], s["de"], s["fr"], s["es"]
    predicted = np.select(
        [
            (c_en >= c_de) & (c_en >= c_fr) & (c_en >= c_es) & (c_en > 0),
            (c_de >= c_fr) & (c_de >= c_es) & (c_de > 0),
            (c_fr >= c_es) & (c_fr > 0),
            c_es > 0,
        ],
        ["en", "de", "fr", "es"],
        default="other",
    )
    return pa.table({"doc_id": batch["doc_id"].cast(pa.int64()),
                     "predicted": pa.array(predicted, pa.string())})


def token_counts(docs_ds):
    return docs_ds.map_batches(token_count_arrow, batch_format="pyarrow",
                               batch_size=4096)


def quality_stats(docs_ds):
    return docs_ds.map_batches(quality_stats_arrow, batch_format="pyarrow",
                               batch_size=4096)


def langid(docs_ds):
    return docs_ds.map_batches(langid_arrow, batch_format="pyarrow",
                               batch_size=4096)


def stopword_stats(docs_ds):
    return docs_ds.map_batches(stopword_stats_arrow, batch_format="pyarrow",
                               batch_size=4096)


def bpe_token_counts(docs_ds):
    return docs_ds.map_batches(bpe_token_count_arrow, batch_format="pyarrow",
                               batch_size=4096)


def scrub_batch(batch, pattern: str, replacement: str):
    """Vectorized regex redaction over one Arrow batch — the PII-scrub
    kernel (emails, phone numbers, flagged terms): RE2 via
    pyarrow.compute, zero Python per row.  Returns the input columns
    with ``text`` replaced by the scrubbed text plus ``n_hits`` (match
    count before scrubbing).  Callers drop or keep the scrubbed text;
    the registered query reduces it to per-doc evidence columns."""
    import pyarrow as pa
    import pyarrow.compute as pc

    col = batch["text"]
    red = pc.replace_substring_regex(col, pattern=pattern,
                                     replacement=replacement)
    n = pc.count_substring_regex(col, pattern)
    out = batch.drop_columns(["text"])
    out = out.append_column("text", red)
    return out.append_column("n_hits", n.cast(pa.int64()))
