"""Host-side binned-SAH BVH build over world-space triangles.

Numpy re-design of the reference builder (src/core/bvh.hpp:41-348): same
algorithm family — binned SAH, N_BINS bins per axis, two-direction cost
sweep, leaf-vs-split cost test — but built iteratively with vectorized
binning per node instead of scalar recursion, and emitting the flat array
layout `FlatBVH` directly (the reference's 32-byte node, bvh.hpp:21-33,
becomes four SoA arrays).

Differences from the reference, on purpose:
- ONE global BVH over the whole scene (the reference is per-mesh bottom-level
  only, README.md:46) — removes scene-graph recursion from the device loop.
- Triangles are permuted so each leaf is a contiguous range, and leaves are
  capped at a small `max_leaf` so the TPU traversal does one fixed-width
  masked triangle test per leaf visit (reference MAX_LEAF_SIZE=20 suits a
  scalar CPU loop, bvh.hpp:14).
- All three axes are SAH-scanned (the reference bins the largest-extent axis
  choice per axis loop too, bvh.hpp:281-307).

A C++ implementation with the same contract lives in yart_tpu/native; this
numpy version is the portable fallback and correctness oracle.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class HostBVH(NamedTuple):
    node_min: np.ndarray  # [N, 3] f32
    node_max: np.ndarray  # [N, 3] f32
    left: np.ndarray  # [N] i32 (inner: left child; leaf: first tri)
    count: np.ndarray  # [N] i32 (0 = inner)
    tri_order: np.ndarray  # [T] i32 permutation old->new: tri_order[new] = old
    depth: int  # max tree depth (stack bound for traversal)


def build_bvh(
    v0: np.ndarray,
    v1: np.ndarray,
    v2: np.ndarray,
    max_leaf: int = 4,
    n_bins: int = 20,
    leaf_cost_test: bool = False,
) -> HostBVH:
    """Build from triangle vertex positions [T, 3] each."""
    tri_lo = np.minimum(np.minimum(v0, v1), v2).astype(np.float32)
    tri_hi = np.maximum(np.maximum(v0, v1), v2).astype(np.float32)
    cent = ((v0 + v1 + v2) / 3.0).astype(np.float32)
    return build_bvh_boxes(tri_lo, tri_hi, cent, max_leaf, n_bins,
                           leaf_cost_test)


def build_bvh_boxes(
    tri_lo: np.ndarray,
    tri_hi: np.ndarray,
    cent: np.ndarray = None,
    max_leaf: int = 4,
    n_bins: int = 20,
    leaf_cost_test: bool = False,
) -> HostBVH:
    """Build over arbitrary primitive AABBs [T, 3] (used both for triangles
    and for the coarse cluster-level BVH of the bin-trace pipeline)."""
    t = tri_lo.shape[0]
    assert t > 0, "empty scene"
    if cent is None:
        cent = ((tri_lo + tri_hi) * 0.5).astype(np.float32)

    order = np.arange(t, dtype=np.int32)

    # Preallocate 2t-1 nodes like the reference (bvh.hpp:55); trim at the end.
    cap = max(1, 2 * t - 1)
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    left = np.zeros(cap, np.int32)
    count = np.zeros(cap, np.int32)
    n_nodes = 1

    # Stack of (node_idx, first, span, depth).
    stack = [(0, 0, t, 1)]
    max_depth = 1

    while stack:
        node, first, span, depth = stack.pop()
        max_depth = max(max_depth, depth)
        # Copy: `order[a:b]` is a view, and the partition below writes back
        # into the same range while reading from idx.
        idx = order[first : first + span].copy()
        lo = tri_lo[idx]
        hi = tri_hi[idx]
        node_min[node] = lo.min(axis=0)
        node_max[node] = hi.max(axis=0)

        if span <= max_leaf:
            # Fixed-cap rule (default): always leaf — the device leaf test
            # is fixed-width so fatter leaves cost nothing extra per visit.
            # leaf_cost_test additionally applies the REFERENCE's rule
            # (bvh.hpp:341-345): below the cap, still SPLIT when the SAH
            # says traversing two children beats testing all span
            # triangles — deeper trees, thinner leaves. Measured on the
            # 132k-tri scene by tools/diag_leafrule.py.
            do_leaf = True
            if leaf_cost_test and span > 1:
                split = _sah_split(cent[idx], lo, hi, n_bins, span)
                if split is not None:
                    do_leaf = False
            if do_leaf:
                left[node] = first
                count[node] = span
                continue
        else:
            split = _sah_split(cent[idx], lo, hi, n_bins, span)
        if split is None:
            # Degenerate (all centroids equal): median split
            # (reference fallback, bvh.hpp:159-161).
            axis = int(np.argmax(node_max[node] - node_min[node]))
            key = np.argsort(cent[idx][:, axis], kind="stable")
            order[first : first + span] = idx[key]
            mid = span // 2
        else:
            axis, thresh = split
            mask = cent[idx][:, axis] < thresh
            mid = int(mask.sum())
            if mid == 0 or mid == span:
                key = np.argsort(cent[idx][:, axis], kind="stable")
                order[first : first + span] = idx[key]
                mid = span // 2
            else:
                order[first : first + mid] = idx[mask]
                order[first + mid : first + span] = idx[~mask]

        l_child = n_nodes
        n_nodes += 2
        left[node] = l_child
        count[node] = 0
        stack.append((l_child + 1, first + mid, span - mid, depth + 1))
        stack.append((l_child, first, mid, depth + 1))

    return HostBVH(
        node_min[:n_nodes],
        node_max[:n_nodes],
        left[:n_nodes],
        count[:n_nodes],
        order,
        max_depth,
    )


def _sah_split(cent, lo, hi, n_bins, span):
    """Binned SAH over all 3 axes (bvh.hpp:273-347). Returns (axis, thresh)
    or None when unsplittable / leaf is cheaper than any split."""
    c_lo = cent.min(axis=0)
    c_hi = cent.max(axis=0)
    ext = c_hi - c_lo
    best = (np.inf, -1, 0.0)

    for axis in range(3):
        if ext[axis] <= 0.0:
            continue
        scale = n_bins / ext[axis]
        b = np.minimum(
            (n_bins - 1), ((cent[:, axis] - c_lo[axis]) * scale).astype(np.int32)
        )
        # Per-bin counts and bounds via minimum.at/maximum.at scatter-reduce.
        cnt = np.bincount(b, minlength=n_bins)
        blo = np.full((n_bins, 3), np.inf, np.float32)
        bhi = np.full((n_bins, 3), -np.inf, np.float32)
        np.minimum.at(blo, b, lo)
        np.maximum.at(bhi, b, hi)

        # Leftward and rightward running bounds/counts.
        llo = np.minimum.accumulate(blo, axis=0)
        lhi = np.maximum.accumulate(bhi, axis=0)
        rlo = np.minimum.accumulate(blo[::-1], axis=0)[::-1]
        rhi = np.maximum.accumulate(bhi[::-1], axis=0)[::-1]
        lcnt = np.cumsum(cnt)
        rcnt = span - lcnt

        def area(a_lo, a_hi):
            d = np.maximum(a_hi - a_lo, 0.0)
            return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]

        # Split after bin i: left = bins [0..i], right = bins [i+1..]
        a_l = area(llo[:-1], lhi[:-1])
        a_r = area(rlo[1:], rhi[1:])
        cost = a_l * lcnt[:-1] + a_r * rcnt[:-1]
        cost = np.where((lcnt[:-1] == 0) | (rcnt[:-1] == 0), np.inf, cost)
        i = int(np.argmin(cost))
        if cost[i] < best[0]:
            thresh = c_lo[axis] + (i + 1) / scale
            best = (cost[i], axis, thresh)

    if best[1] < 0:
        return None

    # Leaf-vs-split test (bvh.hpp:320-329): compare SAH cost against the cost
    # of intersecting all span triangles at this node.
    node_lo = lo.min(axis=0)
    node_hi = hi.max(axis=0)
    d = node_hi - node_lo
    parent_area = d[0] * d[1] + d[1] * d[2] + d[2] * d[0]
    if parent_area > 0.0 and best[0] / parent_area >= span:
        return None
    return best[1], best[2]


def sah_cost(bvh: HostBVH, c_trav: float = 1.0, c_isect: float = 1.0) -> float:
    """Total SAH cost of the built tree (diagnostic, like the reference's
    printStats, bvh.hpp:189-214)."""
    d = np.maximum(bvh.node_max - bvh.node_min, 0.0)
    area = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]
    root = max(area[0], 1e-20)
    inner = bvh.count == 0
    return float(
        c_trav * area[inner].sum() / root
        + c_isect * (area * bvh.count).sum() / root
    )


class HostBVH8(NamedTuple):
    """8-wide BVH collapsed from the binary SAH tree.

    boxes: [M, 8, 6] child AABBs (min3, max3); empty slots +inf/-inf
    child: [M, 8] int32 encoded refs:
           >= 0: inner node index; == -1: empty;
           <= -2: leaf, v = -(child+2); first = v >> 4; count = v & 15
    depth: wide-tree depth (stack bound = 7 * depth)
    """

    boxes: np.ndarray
    child: np.ndarray
    depth: int


def encode_leaf8(first: int, count: int) -> int:
    assert count <= 15
    return -(((first << 4) | count) + 2)


def collapse_bvh8(hb: HostBVH, width: int = 8) -> HostBVH8:
    """Collapse the binary tree: greedily expand the largest-area inner slot
    until `width` children per node (the standard wide-BVH construction for
    vector machines — replaces the reference's binary-only layout,
    bvh.hpp:21-33, with a TPU-friendly 8-ary one)."""

    def area(i):
        d = np.maximum(hb.node_max[i] - hb.node_min[i], 0.0)
        return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]

    boxes_out = []
    child_out = []

    # Root special case: binary root may itself be a leaf.
    if hb.count[0] > 0:
        boxes = np.zeros((1, width, 6), np.float32)
        boxes[:, :, 0:3] = np.inf
        boxes[:, :, 3:6] = -np.inf
        boxes[0, 0, 0:3] = hb.node_min[0]
        boxes[0, 0, 3:6] = hb.node_max[0]
        child = np.full((1, width), -1, np.int64)
        child[0, 0] = encode_leaf8(int(hb.left[0]), int(hb.count[0]))
        return HostBVH8(boxes.astype(np.float32), child.astype(np.int32), 1)

    # Iterative build: each work item is (binary_node, slot_index_in_output).
    # First pass: create groups, recording child binary nodes needing groups.
    group_of = {}
    order = []
    stack = [0]
    while stack:
        b = stack.pop()
        if b in group_of:
            continue
        group_of[b] = len(order)
        order.append(b)
        # expand slots
        slots = [b]
        while len(slots) < width:
            inner = [i for i, s in enumerate(slots) if hb.count[s] == 0]
            if not inner:
                break
            best = max(inner, key=lambda i: area(slots[i]))
            s = slots.pop(best)
            slots.extend([int(hb.left[s]), int(hb.left[s]) + 1])
        # queue inner children (each becomes its own group)
        for s in slots:
            if hb.count[s] == 0:
                stack.append(s)

    m = len(order)
    boxes = np.full((m, width, 6), 0.0, np.float32)
    boxes[:, :, 0:3] = np.inf
    boxes[:, :, 3:6] = -np.inf
    child = np.full((m, width), -1, np.int64)
    depths = np.zeros(m, np.int32)

    for gi, b in enumerate(order):
        slots = [b]
        while len(slots) < width:
            inner = [i for i, s in enumerate(slots) if hb.count[s] == 0]
            if not inner:
                break
            best = max(inner, key=lambda i: area(slots[i]))
            s = slots.pop(best)
            slots.extend([int(hb.left[s]), int(hb.left[s]) + 1])
        for k, s in enumerate(slots):
            boxes[gi, k, 0:3] = hb.node_min[s]
            boxes[gi, k, 3:6] = hb.node_max[s]
            if hb.count[s] > 0:
                child[gi, k] = encode_leaf8(int(hb.left[s]), int(hb.count[s]))
            else:
                child[gi, k] = group_of[s]

    # depth via reverse topological walk (children have larger group ids than
    # parents is NOT guaranteed with a stack -> compute iteratively)
    depth = 1
    level = {0}
    seen = {0}
    while level:
        nxt = set()
        for g in level:
            for c in child[g]:
                if c >= 0 and c not in seen:
                    seen.add(int(c))
                    nxt.add(int(c))
        if nxt:
            depth += 1
        level = nxt

    return HostBVH8(boxes, child.astype(np.int32), depth)
