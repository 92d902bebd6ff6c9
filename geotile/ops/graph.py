"""Distributed connected components over an edge list (hash-to-min).

The dedup endgame: near-dup PAIRS (minhash / simhash / n-gram Jaccard /
embedding-cosine — every pair generator in ``ops/dedup.py``) are only
half the job; grouping pairs into duplicate CLUSTERS and electing one
canonical representative per cluster is what a training-data pipeline
actually applies. That grouping is connected components on the pair
graph.

Algorithm: hash-to-min label propagation (Rastogi et al., "Finding
Connected Components in Map-Reduce in Logarithmic Rounds" — the
simple-neighborhood variant). Every node starts labeled with the
smallest id in its closed 1-hop neighborhood; each round every node
re-labels to the minimum label across itself and its neighbors;
fixpoint = every node carries the minimum id of its component. Each
round ALSO pointer-jumps (``lbl ← lbl[lbl]``), halving label-chain
depth, so rounds needed = O(log diameter) — a handful even for
path-shaped graphs, 2-3 for the dense blobs dup clusters form.

Scale shape per round (nothing leaves node/edge scale):
  - the symmetric edge list is bucketed by dst ONCE (``bucket =
    h(dst) % B`` is label-independent) and materialized; rounds reuse
    the same co-partitioned blocks.
  - labels (node, lbl) are re-bucketed by node (node-scale rows) and
    co-grouped with the edge buckets; within a bucket a numpy
    sort+searchsorted gather emits (src, lbl[dst]) messages.
  - messages ∪ self-labels → ``groupby(node).min(lbl)`` — the only
    all-to-all, over node-scale rows.
  - convergence: labels only ever decrease, so ``sum(lbl)`` is a
    strictly decreasing monotone until fixpoint; one cheap aggregate
    per round replaces a change-count join.

Driver holds per-round scalars only; labels are materialized each
round (node-scale) so the lazy plan does not re-execute the whole
history each iteration.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from geotile.synth import splitmix64


def _bucket_of(v: np.ndarray, n_buckets: int) -> np.ndarray:
    return (splitmix64(v.astype(np.int64).view(np.uint64)) % np.uint64(n_buckets)).astype(np.int64)


def connected_components(
    edges: rd.Dataset,
    a: str = "a",
    b: str = "b",
    n_buckets: int = 32,
    max_rounds: int = 64,
) -> rd.Dataset:
    """Connected components of the undirected graph given by int64 edge
    columns ``(a, b)``. Returns a Dataset ``(node, cluster_id)`` over
    every node incident to at least one edge, where ``cluster_id`` is
    the smallest node id in the component (the canonical-representative
    convention every dedup consumer uses). Self-loops and duplicate /
    reversed edges are tolerated.

    ``max_rounds`` guards pathological path-shaped graphs (diameter
    bound); raises RuntimeError rather than returning partial labels.

    Node ids must be NON-NEGATIVE int64 (-1 is the internal edge/label
    row discriminator in the co-group schema) — true for every id
    column this engine produces.
    """
    # symmetrize + pre-bucket by dst once; reused every round
    def sym(t: pa.Table) -> pa.Table:
        u = t[a].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[b].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([u, v])
        dst = np.concatenate([v, u])
        return pa.table(
            {
                "src": pa.array(src),
                "dst": pa.array(dst),
                "bucket": pa.array(_bucket_of(dst, n_buckets)),
            }
        )

    edges_b = edges.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True).materialize()
    if edges_b.count() == 0:
        # Ray never schedules empty blocks, so an empty edge list would
        # otherwise propagate a schemaless dataset into consumers
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "cluster_id": pa.array([], pa.int64())})
        )

    # round 0 folded in: lbl(u) = min(u, min over neighbors) via one
    # groupby over the symmetric edges plus the self-edge
    def self_min(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"src": t["src"], "dst": pa.array(np.minimum(s, d))}
        )

    # the per-round repartition is load-bearing, not cosmetic: each
    # round's union(3 branches) + groupby otherwise MULTIPLIES the
    # label block count ~3×, and per-round wall time grows
    # geometrically with it (measured 1s → 2.8 → 8.1 → 28.6s/round on
    # a 150-edge graph) — the same blocks-count-not-rows cost law the
    # cell_tile_counts coalesce exists for. Bounding labels to
    # ``n_buckets`` blocks holds rounds at constant cost.
    labels = (
        edges_b.map_batches(self_min, batch_format="pyarrow")
        .groupby("src")
        .min("dst")
        .map_batches(
            lambda t: t.rename_columns(["node", "lbl"]), batch_format="pyarrow"
        )
        .repartition(n_buckets)
        .materialize()
    )
    prev_sum = labels.sum("lbl")

    def tag_labels(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                # one schema for both sides of the co-group: edge rows
                # are (src, dst, -1); label rows are (-1, node, lbl)
                "src": pa.array(np.full(len(node), -1, dtype=np.int64)),
                "dst": pa.array(node),
                "lbl": t["lbl"],
                "bucket": pa.array(_bucket_of(node, n_buckets)),
            }
        )

    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "lbl": pa.array(np.full(len(t), -1, dtype=np.int64)),
                "bucket": t["bucket"],
            }
        )

    def gather(df: pd.DataFrame) -> pa.Table:
        # LOCAL CONTRACTION, not a single lookup: every row in the
        # bucket is an intra-component link (graph edges, node→label
        # links, pointer-jump links — a label is always a member of its
        # node's component, so treating label rows as edges is sound).
        # Running min-propagation to the LOCAL fixpoint collapses every
        # chain that lands in this bucket in one round, so global
        # rounds ≈ how many buckets a component spans, not its
        # diameter (measured 68s → 14s on a 271-edge pair graph).
        # Returns Arrow so the per-round union with the (Arrow) labels
        # dataset keeps one block type.
        is_lbl = df["lbl"].to_numpy() >= 0
        e1 = df["src"].to_numpy().astype(np.int64)
        e2 = df["dst"].to_numpy().astype(np.int64)
        e1 = np.where(is_lbl, e2, e1)  # label row (−1, node, lbl) → link node—lbl
        e2 = np.where(is_lbl, df["lbl"].to_numpy().astype(np.int64), e2)
        ids, inv = np.unique(np.concatenate([e1, e2]), return_inverse=True)
        i1, i2 = inv[: len(e1)], inv[len(e1):]
        l = ids.copy()
        for _ in range(64):  # local diameter bound; values strictly ↓
            before = l.sum()
            np.minimum.at(l, i1, l[i2])
            np.minimum.at(l, i2, l[i1])
            # pointer jump: l values are ids — map back to indices
            l = np.minimum(l, l[np.searchsorted(ids, l)])
            if l.sum() == before:
                break
        return pa.table({"node": pa.array(ids), "lbl": pa.array(l)})

    def tag_jump(t: pa.Table) -> pa.Table:
        # pointer-jumping pairs (u → lbl(u)) in the edge-row schema:
        # looking lbl(u)'s label up through the same co-group gives
        # lbl(lbl(u)), which halves label-chain depth every round and
        # turns diameter-many rounds into O(log diameter)
        lbl = t["lbl"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": t["node"],
                "dst": pa.array(lbl),
                "lbl": pa.array(np.full(len(lbl), -1, dtype=np.int64)),
                "bucket": pa.array(_bucket_of(lbl, n_buckets)),
            }
        )

    for _round in range(max_rounds):
        msgs = (
            edges_b.map_batches(tag_edges, batch_format="pyarrow")
            .union(labels.map_batches(tag_jump, batch_format="pyarrow"))
            .union(labels.map_batches(tag_labels, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(gather, batch_format="pandas")
        )
        labels = (
            msgs.union(labels)
            .groupby("node")
            .min("lbl")
            .map_batches(
                lambda t: t.rename_columns(["node", "lbl"]), batch_format="pyarrow"
            )
            .repartition(n_buckets)
            .materialize()
        )
        cur_sum = labels.sum("lbl")
        if cur_sum == prev_sum:
            return labels.map_batches(
                lambda t: t.rename_columns(["node", "cluster_id"]),
                batch_format="pyarrow",
            )
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds "
        "(graph depth exceeds the guard; raise max_rounds)"
    )


def pagerank_int(
    edges: rd.Dataset,
    a: str = "a",
    b: str = "b",
    iters: int = 3,
    scale: int = 1_000_000,
    damp_num: int = 85,
    den: int = 100,
    n_buckets: int = 32,
) -> rd.Dataset:
    """Fixed-iteration PageRank on the undirected graph ``(a, b)`` in
    EXACT integer arithmetic — the iterative-algorithm shape (BSP
    rounds over a co-partitioned edge list) with a bit-exact SQL
    replay. Scores live on an integer lattice: s0 = ``scale`` for every
    node, and each round

        s'(v) = base + Σ_{u→v} (damp_num · s(u)) // (den · deg(u)),
        base  = (scale · (den − damp_num)) // den

    Floor division per SOURCE (computed once per u, then summed as
    int64) keeps every engine bit-identical — no float summation-order
    hazard, which is why the oracle can be three chained SQL CTEs.

    Scale shape per round (same discipline as connected_components):
    the symmetric edge list is bucketed by SOURCE once and
    materialized; all of u's out-edges land in u's bucket, so deg(u)
    is derived IN-BUCKET from edge multiplicity (no degree join);
    contributions are pre-summed per destination inside the bucket, so
    the per-round shuffle is the node-scale ``groupby(dst).sum``.
    Scores (node-scale) are re-bucketed and materialized each round —
    iterating on a lazy plan would re-execute the whole history.

    Node ids must be NON-NEGATIVE int64 (-1 discriminates score rows
    inside the co-group, as in connected_components).
    """
    base = (scale * (den - damp_num)) // den

    def sym(t: pa.Table) -> pa.Table:
        u = t[a].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[b].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([u, v])
        dst = np.concatenate([v, u])
        return pa.table(
            {
                "src": pa.array(src),
                "dst": pa.array(dst),
                "s": pa.array(np.full(len(src), -1, dtype=np.int64)),
                "bucket": pa.array(_bucket_of(src, n_buckets)),
            }
        )

    edges_b = edges.map_batches(
        sym, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if edges_b.count() == 0:
        # same empty-edge schema guard as connected_components
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "score": pa.array([], pa.int64())})
        )

    scores: rd.Dataset | None = None  # None = implicit uniform s0

    def tag_scores(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(node),
                "dst": pa.array(np.full(len(node), -1, dtype=np.int64)),
                "s": t["score"],
                "bucket": pa.array(_bucket_of(node, n_buckets)),
            }
        )

    def make_contrib(first_round: bool):
        def contrib(df: pd.DataFrame) -> pa.Table:
            is_edge = df["dst"].to_numpy() >= 0
            e_src = df["src"].to_numpy().astype(np.int64)[is_edge]
            e_dst = df["dst"].to_numpy().astype(np.int64)[is_edge]
            if len(e_src) == 0:
                return pa.table(
                    {"node": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
                )
            srcs, sidx = np.unique(e_src, return_inverse=True)
            deg = np.bincount(sidx).astype(np.int64)
            if first_round:
                s = np.full(len(srcs), scale, dtype=np.int64)
            else:
                sn = df["src"].to_numpy().astype(np.int64)[~is_edge]
                sv = df["s"].to_numpy().astype(np.int64)[~is_edge]
                o = np.argsort(sn)
                s = sv[o][np.searchsorted(sn[o], srcs)]
            per_src = (damp_num * s) // (den * deg)
            # pre-sum per destination inside the bucket; int64
            # accumulator (bincount's float64 weights would round past
            # 2^53 on hub nodes)
            dsts, didx = np.unique(e_dst, return_inverse=True)
            csum = np.zeros(len(dsts), dtype=np.int64)
            np.add.at(csum, didx, per_src[sidx])
            return pa.table({"node": pa.array(dsts), "c": pa.array(csum)})

        return contrib

    for it in range(iters):
        stream = edges_b
        if scores is not None:
            stream = stream.union(
                scores.map_batches(tag_scores, batch_format="pyarrow")
            )
        scores = (
            stream.groupby("bucket")
            .map_groups(make_contrib(scores is None), batch_format="pandas")
            .groupby("node")
            .sum("c")
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": t["node"],
                        "score": pc.add(
                            t["sum(c)"].cast(pa.int64()), pa.scalar(base)
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .repartition(n_buckets)
            .materialize()
        )
    return scores
