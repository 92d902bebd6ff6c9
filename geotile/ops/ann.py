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
        # select by the FINAL total order — (ROUNDED cosine desc,
        # vec_id asc): partial selection on the unrounded score could
        # drop a candidate that ties after rounding yet wins the final
        # id tie-break, making the result depend on batch boundaries
        # and diverge from the rank-replay oracle
        Sr = np.round(S, 6)
        order = np.argsort(ids, kind="stable")
        rank = np.empty(len(ids), np.int64)
        rank[order] = np.arange(len(ids), dtype=np.int64)
        key = np.rint(Sr * 1e6).astype(np.int64) * (1 << 40) - rank[None, :]
        part = np.argpartition(-key, k - 1, axis=1)[:, :k]
        ps = np.take_along_axis(Sr, part, axis=1)
        return pa.table(
            {
                "query_id": pa.array(np.repeat(self.qids, k)),
                "vec_id": pa.array(ids[part.ravel()]),
                "cosine": pa.array(ps.ravel()),
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
                # same total-order selection as _PartialTopK: rounded
                # score desc, vec_id asc — batch-boundary-invariant
                sr = np.round(s, 6)
                mids = ids[mask]
                r = np.empty(len(mids), np.int64)
                r[np.argsort(mids, kind="stable")] = np.arange(
                    len(mids), dtype=np.int64)
                key = np.rint(sr * 1e6).astype(np.int64) * (1 << 40) - r
                top = np.argpartition(-key, kk - 1)[:kk]
                out_q.append(np.full(kk, self.qids[qi]))
                out_v.append(mids[top])
                out_s.append(sr[top])
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


def kmeans_lloyd(
    ds: rd.Dataset,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Distributed Lloyd k-means over the embedding column, on an EXACT
    integer lattice so a SQL replay matches bit-for-bit (the formalized
    version of the IVF trainer above — that one is a float sample-based
    heuristic; this one is the deterministic, cluster-scale algorithm).

    Semantics: q = trunc(v·10⁴) int64 per element; init centroids = the
    k rows with smallest ``id_col``; each Lloyd round assigns every
    vector to the argmin of the exact integer squared L2 distance (ties
    → smallest cluster index) and recomputes centroids as the FLOOR
    integer mean (empty clusters drop — documented convention). Returns
    (vec_id, cluster, dist) after ``iters`` rounds.

    Scale shape: per round ONE streaming pass — the distance argmin is
    a single float64 BLAS matmul per batch against the broadcast k×d
    centroid matrix (exact: every product of lattice values stays below
    2^53), and each batch pre-reduces to k×d partial rows (cluster,
    dim, Σq, n), so the shuffle is k·d-cardinality regardless of corpus
    size. The driver holds only the k×d centroid matrix (``ray.put``
    per round) and the k smallest ids — never vector data.
    """

    def to_q(batch: pa.Table) -> np.ndarray:
        return np.trunc(_emb_matrix(batch) * 10000.0)

    # init: k rows with the smallest ids — per-batch partial k-min,
    # then a tiny final reduce (no global sort)
    def partial_min(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return batch.select([id_col, "embedding"])
        sel = np.argsort(ids, kind="stable")[:k]
        return batch.select([id_col, "embedding"]).take(pa.array(sel))

    seed_rows = (
        ds.map_batches(partial_min, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(partial_min, batch_format="pyarrow", batch_size=None)
        .take_all()
    )  # k tiny rows on the driver — the only row data it ever holds
    seed_rows.sort(key=lambda r: r[id_col])
    C = np.trunc(
        np.asarray([r["embedding"] for r in seed_rows], dtype=np.float64) * 10000.0
    )
    labels = np.arange(len(C), dtype=np.int64)  # ORIGINAL cluster ids —
    # survive empty-cluster drops so output labels match the SQL replay
    if C.shape[1] >= 4096:
        # PACKING CONTRACT for the kd = k*4096 + dim groupby key below:
        # checked ONCE on the driver (an assert inside the worker UDF
        # vanishes under -O and distinct (cluster, dim) cells would
        # collide silently)
        raise ValueError(
            f"kmeans packed key needs dim < 4096, got {C.shape[1]}")

    def dists(q: np.ndarray, C: np.ndarray) -> np.ndarray:
        # exact in float64: |q|,|c| ≤ ~2e4 ⇒ every dot/sum < 2^53
        return (
            (q * q).sum(axis=1, keepdims=True)
            - 2.0 * (q @ C.T)
            + (C * C).sum(axis=1)
        )

    for _ in range(iters - 1):
        cref = ray.put(C)

        def part_sums(batch: pa.Table, _cref=cref) -> pa.Table:
            Ck = ray.get(_cref)
            q = to_q(batch)
            a = np.argmin(dists(q, Ck), axis=1)  # first min = smallest k
            kk, d = Ck.shape
            acc = np.zeros((kk, d), dtype=np.int64)
            np.add.at(acc, a, q.astype(np.int64))
            n = np.bincount(a, minlength=kk).astype(np.int64)
            ki = np.repeat(np.arange(kk, dtype=np.int64), d)
            # packed single-int groupby key (k·4096 + dim): Ray's
            # sort-based multi-key aggregate is ~0.7s/block even on
            # tiny partials. PACKING CONTRACT: dim < 4096 — validated
            # once on the driver right after C is built
            return pa.table(
                {
                    "kd": pa.array(ki * 4096 + np.tile(np.arange(d, dtype=np.int64), kk)),
                    "s": pa.array(acc.ravel()),
                    "n": pa.array(np.repeat(n, d)),
                }
            )

        agg = (
            ds.map_batches(
                part_sums, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=65536,  # span tiny read blocks — each call
                # emits k·d rows regardless of input size
            )
            .repartition(4)
            .groupby("kd")
            .sum(["s", "n"])
            .take_all()
        )  # k·d tiny partial rows
        kk, d = C.shape
        S = np.zeros((kk, d), dtype=np.int64)
        N = np.zeros((kk, d), dtype=np.int64)
        for r in agg:
            S[r["kd"] // 4096, r["kd"] % 4096] = r["sum(s)"]
            N[r["kd"] // 4096, r["kd"] % 4096] = r["sum(n)"]
        nonempty = N[:, 0] > 0
        C = (S[nonempty] // N[nonempty]).astype(np.float64)  # floor mean
        labels = labels[nonempty]
        # centroid rows stay ordered by original label, so argmin's
        # first-minimum tie-break remains "smallest surviving label" —
        # exactly SQL's ORDER BY dist, k

    cref = ray.put((C, labels))

    def assign(batch: pa.Table, _cref=cref) -> pa.Table:
        Ck, lab = ray.get(_cref)
        q = to_q(batch)
        D = dists(q, Ck)
        a = np.argmin(D, axis=1)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(lab[a]),
                "dist": pa.array(
                    D[np.arange(len(a)), a].astype(np.int64)
                ),
            }
        )

    return ds.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536
    )
