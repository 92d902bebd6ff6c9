"""Similarity search over an embedding column (``list<float>``):

  topk_bruteforce     exact cosine top-k — per-batch matmul against the
                      broadcast query matrix + PARTIAL top-k per batch,
                      then a tiny groupby(query) final reduce
  hyperplane_buckets  random-hyperplane LSH bucket ids (the scale path:
                      co-partition corpus and queries by bucket, search
                      within bucket ± multiprobe)
  ivf_topk            IVF variant: k-means-lite centroids (driver-side
                      on a sample), per-batch assignment, search only
                      the ``nprobe`` closest centroid lists

The brute-force path is the oracle; IVF recall is measured against it
in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.asarray(col.flatten().to_numpy(zero_copy_only=False), dtype=np.float64).reshape(
        len(batch), -1
    )


class _PartialTopK:
    """Per-batch partial top-k: emits k rows per query per batch."""

    def __init__(self, queries_ref, k: int):
        qids, Q = ray.get(queries_ref)
        self.qids = qids
        self.Q = _normalize(Q)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        V = _normalize(_emb_matrix(batch))
        S = self.Q @ V.T  # (nq, nb)
        k = min(self.k, S.shape[1])
        part = np.argpartition(-S, k - 1, axis=1)[:, :k]
        ps = np.take_along_axis(S, part, axis=1)
        nq = len(self.qids)
        return pa.table(
            {
                "query_id": pa.array(np.repeat(self.qids, k)),
                "vec_id": pa.array(ids[part.ravel()]),
                "cosine": pa.array(np.round(ps.ravel(), 6)),
            }
        )


def _final_topk(df: pd.DataFrame, k: int) -> pd.DataFrame:
    df = df.sort_values(["cosine", "vec_id"], ascending=[False, True], kind="stable").head(k)
    df = df.assign(rank=np.arange(len(df), dtype=np.int64))
    return df


def topk_bruteforce(
    corpus: rd.Dataset,
    query_ids: np.ndarray,
    Q: np.ndarray,
    k: int = 10,
    exclude_self: bool = True,
    concurrency=(1, 4),
) -> rd.Dataset:
    """Exact cosine top-k of each query over the corpus Dataset.
    Shuffle volume is k rows per query per BATCH (partial top-k), not
    the corpus."""
    from geotile.ops.join import _cached_stage

    ref = ray.put((np.asarray(query_ids, dtype=np.int64), np.asarray(Q, dtype=np.float64)))
    kk = k + (1 if exclude_self else 0)

    def partial_fn(batch: pa.Table) -> pa.Table:
        # stateless task + per-worker cached stage (no actor pool to
        # start up or starve the read; ``concurrency`` kept for compat)
        return _cached_stage(("topk", ref.hex(), kk), lambda: _PartialTopK(ref, kk))(batch)

    partial = corpus.select_columns(["vec_id", "embedding"]).map_batches(
        partial_fn, batch_format="pyarrow", batch_size=4096
    )
    if exclude_self:
        import pyarrow.compute as pc

        partial = partial.map_batches(
            lambda t: t.filter(pc.invert(pc.equal(t["query_id"], t["vec_id"]))),
            batch_format="pyarrow",
        )
    return partial.groupby("query_id").map_groups(
        lambda df: _final_topk(df, k), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# LSH buckets (scale path) and IVF
# ---------------------------------------------------------------------------

def hyperplane_buckets(
    ds: rd.Dataset, n_planes: int = 16, seed: int = 7, dim: int | None = None
) -> rd.Dataset:
    """Append a random-hyperplane LSH ``bucket`` column (int64 of sign
    bits). Co-partitioning corpus + queries on this key turns ANN into
    per-bucket brute force. ``dim`` comes from the schema when the
    embedding column is fixed_size_list; pass it explicitly for plain
    list columns to avoid the one-row take() that triggers execution."""
    if dim is None:
        try:
            typ = ds.schema().base_schema.field("embedding").type
            if pa.types.is_fixed_size_list(typ):
                dim = typ.list_size
        except Exception:
            dim = None
    if dim is None:
        dim = len(ds.take(1)[0]["embedding"])
    planes = np.random.default_rng(seed).standard_normal((n_planes, dim))
    ref = ray.put(planes)

    class Stage:
        def __init__(self):
            self.P = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            V = _emb_matrix(batch)
            signs = (V @ self.P.T) > 0
            w = (np.int64(1) << np.arange(signs.shape[1], dtype=np.int64))
            bucket = (signs * w).sum(axis=1)
            return batch.append_column("bucket", pa.array(bucket))

    from geotile.ops.join import _cached_stage

    def bucket_fn(batch: pa.Table) -> pa.Table:
        return _cached_stage(("hplanes", ref.hex()), Stage)(batch)

    return ds.map_batches(bucket_fn, batch_format="pyarrow", batch_size=4096)


def kmeans_lite(M: np.ndarray, n_centroids: int, iters: int = 8, seed: int = 3) -> np.ndarray:
    """Tiny k-means on normalized vectors (driver-side, runs on a
    sample) — the IVF coarse quantizer."""
    M = _normalize(np.asarray(M, dtype=np.float64))
    rng = np.random.default_rng(seed)
    C = M[rng.choice(len(M), size=min(n_centroids, len(M)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(M @ C.T, axis=1)
        for c in range(len(C)):
            members = M[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _normalize(C)
    return C


def ivf_topk(
    corpus: rd.Dataset,
    query_ids: np.ndarray,
    Q: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    sample_for_train: int = 2048,
    concurrency=(1, 4),
) -> rd.Dataset:
    """IVF approximate top-k: centroids trained on a corpus sample; each
    batch searches only queries whose ``nprobe`` nearest centroids
    intersect the batch rows' assignments. Recall vs the brute-force
    oracle is a test metric, not assumed."""
    sample = corpus.select_columns(["embedding"]).limit(sample_for_train).take_all()
    C = kmeans_lite(np.array([r["embedding"] for r in sample]), n_centroids)
    Qn = _normalize(np.asarray(Q, dtype=np.float64))
    q_probe = np.argsort(-(Qn @ C.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), Qn, C, q_probe, k))

    class Stage:
        def __init__(self):
            self.qids, self.Q, self.C, self.q_probe, self.k = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["vec_id"].to_numpy()
            V = _normalize(_emb_matrix(batch))
            v_assign = np.argmax(V @ self.C.T, axis=1)
            out_q, out_v, out_s = [], [], []
            for qi, probes in enumerate(self.q_probe):
                mask = np.isin(v_assign, probes)
                if not mask.any():
                    continue
                s = self.Q[qi] @ V[mask].T
                kk = min(self.k + 1, len(s))
                top = np.argpartition(-s, kk - 1)[:kk]
                out_q.append(np.full(kk, self.qids[qi]))
                out_v.append(ids[mask][top])
                out_s.append(np.round(s[top], 6))
            if not out_q:
                return pa.table(
                    {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
                     "cosine": pa.array([], pa.float64())}
                )
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q)),
                    "vec_id": pa.array(np.concatenate(out_v)),
                    "cosine": pa.array(np.concatenate(out_s)),
                }
            )

    from geotile.ops.join import _cached_stage

    def ivf_fn(batch: pa.Table) -> pa.Table:
        return _cached_stage(("ivf", ref.hex()), Stage)(batch)

    partial = corpus.select_columns(["vec_id", "embedding"]).map_batches(
        ivf_fn, batch_format="pyarrow", batch_size=4096
    )
    import pyarrow.compute as pc

    partial = partial.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t["query_id"], t["vec_id"]))),
        batch_format="pyarrow",
    )
    return partial.groupby("query_id").map_groups(
        lambda df: _final_topk(df, k), batch_format="pandas"
    )
