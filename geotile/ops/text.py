"""Text-analysis stages for large-scale training-data pipelines:
token counting, quality scoring, language ID, document fingerprinting.

All stages are vectorized ``map_batches`` transforms (pyarrow.compute
string kernels / numpy) running as stateless tasks with the per-worker
stage cache. Token-stats tokenization is plain single-space split so
the DuckDB oracle (``string_split(text, ' ')``) states the identical
semantics; fingerprints ride the whitespace-split hashed-token kernel
in geotile.ops.hashing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "it")

# tiny per-language marker lexicons for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "a", "in", "that", "it", "for"},
    "es": {"el", "la", "de", "que", "y", "los", "las", "un", "una", "es"},
    "fr": {"le", "la", "les", "des", "et", "un", "une", "est", "du", "que"},
    "de": {"der", "die", "das", "und", "ein", "eine", "ist", "nicht", "mit", "zu"},
}


def token_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized token/quality metrics: n_tokens (single-space split),
    n_chars, stopword count, punctuation count."""
    text = batch[text_col]
    toks = pc.split_pattern(text, " ")
    n_tokens = pc.list_value_length(toks).cast(pa.int64())
    n_chars = pc.utf8_length(text).cast(pa.int64())
    flat = pc.list_flatten(toks)
    is_stop = pc.is_in(flat, pa.array(list(STOPWORDS)))
    # per-row stopword counts: reduce the flattened mask by list offsets
    offsets = np.zeros(len(batch) + 1, dtype=np.int64)
    lens = n_tokens.to_numpy(zero_copy_only=False)
    np.cumsum(lens, out=offsets[1:])
    stop_np = is_stop.to_numpy(zero_copy_only=False).astype(np.int64)
    csum = np.concatenate([[0], np.cumsum(stop_np)])
    n_stop = csum[offsets[1:]] - csum[offsets[:-1]]
    n_punct = pc.count_substring_regex(text, r"[\.,;:!\?]").cast(pa.int64())
    return (
        batch.append_column("n_tokens", n_tokens)
        .append_column("n_chars_calc", n_chars)
        .append_column("n_stopwords", pa.array(n_stop))
        .append_column("n_punct", n_punct)
    )


def quality_score_batch(batch: pa.Table) -> pa.Table:
    """Composite quality score in [0, 1] from the token stats (length,
    stopword ratio, mean token length bands) — the heuristic-scoring
    operator of a pretraining data pipeline."""
    t = batch if "n_tokens" in batch.column_names else token_stats_batch(batch)
    n_tok = t["n_tokens"].to_numpy().astype(np.float64)
    n_chars = t["n_chars_calc"].to_numpy().astype(np.float64)
    n_stop = t["n_stopwords"].to_numpy().astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        stop_ratio = np.where(n_tok > 0, n_stop / n_tok, 0.0)
        mean_len = np.where(n_tok > 0, (n_chars - (n_tok - 1)) / n_tok, 0.0)
    len_ok = np.clip((n_tok - 5) / 45.0, 0.0, 1.0)
    stop_ok = 1.0 - np.abs(stop_ratio - 0.08) * 4.0
    word_ok = 1.0 - np.abs(mean_len - 4.5) / 4.5
    score = np.clip(0.4 * len_ok + 0.3 * np.clip(stop_ok, 0, 1) + 0.3 * np.clip(word_ok, 0, 1), 0, 1)
    return t.append_column("quality", pa.array(np.round(score, 6)))


class LangIdStage:
    """Language ID: CJK codepoint check on a 400-char prefix, then
    marker-word voting over the distinct tokens of a 2000-char prefix
    (first language in en/es/fr/de order wins ties — 'en' default).
    Fully vectorized: one regex count for CJK, one tokenize + vocab
    ``index_in`` + unique-pair bincount for the votes."""

    LANGS = tuple(_LANG_MARKERS)  # vote order = tie-break order

    def __init__(self):
        # one lookup table PER language: marker words shared between
        # languages (e.g. 'un' in es and fr) must vote for every
        # language that lists them, exactly like the per-row set
        # intersection this stage replaced
        self.vocabs = [
            pa.array(sorted(_LANG_MARKERS[lang]), pa.string()) for lang in self.LANGS
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = len(batch)
        cjk = (
            pc.count_substring_regex(
                pc.utf8_slice_codeunits(text, 0, 400), "[一-鿿]"
            )
            .to_numpy(zero_copy_only=False)
            > 0
        )
        toks = pc.utf8_split_whitespace(
            pc.utf8_lower(pc.utf8_slice_codeunits(text, 0, 2000))
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lo = toks.offsets.to_numpy().astype(np.int64)
        flat = toks.values
        doc_of = np.searchsorted(lo, np.arange(len(flat)), side="right") - 1
        votes = np.zeros((n, len(self.LANGS)), dtype=np.int64)
        for li, vocab in enumerate(self.vocabs):
            vi = pc.index_in(flat, vocab)
            hit = pc.is_valid(vi).to_numpy(zero_copy_only=False)
            vi_np = vi.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
            # SET semantics: distinct marker words per doc
            pair = np.unique(doc_of[hit] * np.int64(len(vocab)) + vi_np[hit])
            np.add.at(votes, (pair // len(vocab), li), 1)
        best = np.argmax(votes, axis=1)  # first max in vote order
        pred = np.asarray(self.LANGS, dtype=object)[best]
        pred[cjk] = "zh"
        return batch.append_column("lang_pred", pa.array(pred, pa.string()))


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit rolling document fingerprint: polynomial rolling hash over
    the token-hash sequence (order-sensitive — reordered near-dups get
    different fingerprints, unlike simhash). Fully vectorized: one
    tokenize-and-hash pass + one segmented reduce for the whole batch
    (geotile.ops.hashing.hashed_tokens / rolling_fingerprints)."""
    from geotile.ops.hashing import hashed_tokens, rolling_fingerprints

    h, off = hashed_tokens(batch[text_col])
    out = rolling_fingerprints(h, off)
    return batch.append_column("fingerprint", pa.array(out.view(np.int64)))


def doc_stats(ds: rd.Dataset) -> rd.Dataset:
    """documents → per-doc token/quality stats (vectorized)."""
    return ds.map_batches(quality_score_batch, batch_format="pyarrow", zero_copy_batch=True)


def lang_id(ds: rd.Dataset, concurrency=None) -> rd.Dataset:
    """Stateless tasks + per-worker cached stage (``concurrency`` kept
    for API compat, unused — no actor pool to starve the read)."""
    from geotile.ops.join import _cached_stage

    def fn(t: pa.Table) -> pa.Table:
        return _cached_stage(("langid",), LangIdStage)(t)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=2048, zero_copy_batch=True)
