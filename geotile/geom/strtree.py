"""Packed STR (Sort-Tile-Recursive) R-tree over numpy bbox arrays.

The stateful index the north_star calls for: built ONCE per actor in a
``map_batches`` actor pool's ``__init__`` from the (small, broadcast)
polygon side of the spatial join, then queried per batch. Pure numpy
arrays → cheap to serialize through ``ray.put``.
"""

from __future__ import annotations

import numpy as np


class STRtree:
    """Static packed R-tree. ``boxes`` is (n, 4): xmin, ymin, xmax, ymax."""

    def __init__(self, boxes: np.ndarray, leaf_capacity: int = 16):
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.n = len(boxes)
        self.leaf_capacity = leaf_capacity
        if self.n == 0:
            self.order = np.empty(0, dtype=np.int64)
            self.levels: list[np.ndarray] = []
            return
        cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
        cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        nleaf = int(np.ceil(self.n / leaf_capacity))
        s = int(np.ceil(np.sqrt(nleaf)))
        # STR packing: sort by cx into s vertical slices, by cy within
        ox = np.argsort(cx, kind="stable")
        slice_size = int(np.ceil(self.n / s))
        order = np.empty(self.n, dtype=np.int64)
        pos = 0
        for i in range(0, self.n, slice_size):
            sl = ox[i:i + slice_size]
            sl = sl[np.argsort(cy[sl], kind="stable")]
            order[pos:pos + len(sl)] = sl
            pos += len(sl)
        self.order = order
        leaf_boxes = boxes[order]
        # build levels bottom-up: each level groups `leaf_capacity` children
        self.levels = [leaf_boxes]
        cur = leaf_boxes
        while len(cur) > 1:
            ng = int(np.ceil(len(cur) / leaf_capacity))
            nxt = np.empty((ng, 4), dtype=np.float64)
            for g in range(ng):
                blk = cur[g * leaf_capacity:(g + 1) * leaf_capacity]
                nxt[g] = (blk[:, 0].min(), blk[:, 1].min(), blk[:, 2].max(), blk[:, 3].max())
            self.levels.append(nxt)
            cur = nxt

    def query_box(self, xmin: float, ymin: float, xmax: float, ymax: float) -> np.ndarray:
        """Original indices of boxes intersecting the query box."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        cap = self.leaf_capacity
        nodes = np.zeros(1, dtype=np.int64)  # root of levels[-1]
        for li in range(len(self.levels) - 1, 0, -1):
            b = self.levels[li][nodes]
            hit = ~((b[:, 2] < xmin) | (b[:, 0] > xmax) | (b[:, 3] < ymin) | (b[:, 1] > ymax))
            nodes = nodes[hit]
            if len(nodes) == 0:
                return np.empty(0, dtype=np.int64)
            nodes = (nodes[:, None] * cap + np.arange(cap)[None, :]).ravel()
            nodes = nodes[nodes < len(self.levels[li - 1])]
        b = self.levels[0][nodes]
        hit = ~((b[:, 2] < xmin) | (b[:, 0] > xmax) | (b[:, 3] < ymin) | (b[:, 1] > ymax))
        return self.order[nodes[hit]]

    def query_points(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Batch candidate lookup: for n points return (point_idx,
        box_idx) pairs where the point lies inside the box. Vectorized
        level-descent over all points at once."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        if self.n == 0 or len(px) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        cap = self.leaf_capacity
        pt = np.arange(len(px), dtype=np.int64)
        nodes = np.zeros(len(px), dtype=np.int64)
        for li in range(len(self.levels) - 2, -1, -1):
            level = self.levels[li]
            childs = nodes[:, None] * cap + np.arange(cap)[None, :]
            pts = np.repeat(pt, cap)
            childs = childs.ravel()
            ok = childs < len(level)
            pts, childs = pts[ok], childs[ok]
            b = level[childs]
            hit = (
                (px[pts] >= b[:, 0]) & (px[pts] <= b[:, 2])
                & (py[pts] >= b[:, 1]) & (py[pts] <= b[:, 3])
            )
            pt, nodes = pts[hit], childs[hit]
        # final containment check (covers the single-level tree case)
        b = self.levels[0][nodes]
        hit = (
            (px[pt] >= b[:, 0]) & (px[pt] <= b[:, 2])
            & (py[pt] >= b[:, 1]) & (py[pt] <= b[:, 3])
        )
        return pt[hit], self.order[nodes[hit]]
