"""Triangle clustering for the bin-trace traversal pipeline.

TPU-native alternative to per-ray deep BVH traversal (the reference walks a
binary SAH tree per ray with a 64-deep stack, src/cpu/ray-integrator.cpp:
84-160). Deep per-lane traversal is bandwidth-bound on TPU: every lockstep
iteration moves whole-wavefront state and gathers node rows from HBM.

The bin-trace design instead splits intersection into:

1. a *coarse* traversal over a few hundred cluster AABBs (tiny tree, few
   iterations, small per-lane stacks), collecting per ray the clusters whose
   boxes it enters, and
2. dense brute-force triangle tests of (ray, cluster) pairs inside a Pallas
   kernel, where each cluster's triangles are prepacked as plane+barycentric
   row vectors so the test becomes two [B,3]x[3,3C] MXU matmuls plus VPU
   elementwise — the shape TPUs are built for.

This module is the host-side compiler for that pipeline:
- `cut_clusters`: cut the binary SAH tree (scene/bvh.py) into subtrees of at
  most C triangles. Because the SAH build partitions the triangle order in
  place, every subtree owns a CONTIGUOUS triangle range — clusters are
  (first, count) ranges over the already-permuted triangle arrays.
- `build_coarse`: a small SAH BVH over cluster AABBs, collapsed to the same
  8-wide layout the wavefront traversal uses (leaf payload = cluster id).
- `woop_rows`: per-triangle plane/barycentric constants, packed per cluster
  as a [n_clus, 8, 3C] matmul operand.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from yart_tpu.scene.bvh import HostBVH, HostBVH8, build_bvh_boxes, collapse_bvh8


class ClusterCut(NamedTuple):
    first: np.ndarray  # [n_clus] i32 first triangle (in BVH leaf order)
    count: np.ndarray  # [n_clus] i32 triangle count (<= max_cluster)
    lo: np.ndarray  # [n_clus, 3] f32 cluster AABB
    hi: np.ndarray  # [n_clus, 3] f32


def _subtree_spans(hb: HostBVH):
    """(first, span) per node. Children are created after their parent in
    scene/bvh.py (l_child = n_nodes), so a reverse-index sweep sees children
    before parents."""
    n = hb.left.shape[0]
    first = np.zeros(n, np.int64)
    span = np.zeros(n, np.int64)
    leaf = hb.count > 0
    first[leaf] = hb.left[leaf]
    span[leaf] = hb.count[leaf]
    for i in range(n - 1, -1, -1):
        if not leaf[i]:
            l = hb.left[i]
            first[i] = first[l]
            span[i] = span[l] + span[l + 1]
    return first, span


def cut_clusters(hb: HostBVH, max_cluster: int) -> ClusterCut:
    """DFS from the root, emitting every maximal subtree with span <=
    max_cluster as one cluster (near-first DFS order keeps cluster ids
    spatially coherent)."""
    first, span = _subtree_spans(hb)
    out_first, out_count, out_lo, out_hi = [], [], [], []
    stack = [0]
    while stack:
        i = stack.pop()
        if span[i] <= max_cluster or hb.count[i] > 0:
            out_first.append(first[i])
            out_count.append(span[i])
            out_lo.append(hb.node_min[i])
            out_hi.append(hb.node_max[i])
        else:
            l = int(hb.left[i])
            stack.append(l + 1)
            stack.append(l)
    return ClusterCut(
        np.asarray(out_first, np.int32),
        np.asarray(out_count, np.int32),
        np.stack(out_lo).astype(np.float32),
        np.stack(out_hi).astype(np.float32),
    )


class CoarseTree(NamedTuple):
    wide_pack: np.ndarray  # [G, 56] f32: 8x(min3,max3) + 8 bitcast child refs
    depth: int  # wide-tree depth (stack bound = 7 * depth)
    max_leaf: int  # max clusters per coarse leaf
    cut: ClusterCut  # clusters, permuted into coarse leaf order


def build_coarse(cut: ClusterCut, max_leaf: int = 2, n_bins: int = 20) -> CoarseTree:
    hb = build_bvh_boxes(cut.lo, cut.hi, max_leaf=max_leaf, n_bins=n_bins)
    # Permute clusters into coarse leaf order so leaves reference contiguous
    # cluster id ranges (leaf payload encodes (first_cluster, count)).
    perm = hb.tri_order
    cut = ClusterCut(cut.first[perm], cut.count[perm], cut.lo[perm], cut.hi[perm])
    hb8 = collapse_bvh8(hb)
    bits = lambda a: np.ascontiguousarray(a, np.int32).view(np.float32)
    wide_pack = np.concatenate(
        [hb8.boxes.reshape(-1, 48), bits(hb8.child).reshape(-1, 8)], axis=1
    ).astype(np.float32)
    return CoarseTree(wide_pack, hb8.depth, int(hb.count.max()), cut)


def woop_rows(v0, v1, v2, cut: ClusterCut, c: int) -> np.ndarray:
    """Pack per-triangle plane + barycentric constants for the pair kernel.

    For triangle (p0, e1=p1-p0, e2=p2-p0):
        n  = e1 x e2,          cn = n . p0
        eu = (|e2|^2 e1 - (e1.e2) e2) / gram,  cu = eu . p0
        ev = (|e1|^2 e2 - (e1.e2) e1) / gram,  cv = ev . p0
    so that for a ray (o, d):
        nd = n.d  (== the Moller-Trumbore determinant up to sign: back = nd>0)
        t  = (cn - n.o) / nd
        u  = eu.o + t (eu.d) - cu,  v likewise.
    Six ray-triangle dot products = two [B,3]x[3,3C] matmuls per cluster.

    Output [n_clus, 8, 3C] f32: rows 0..2 hold component x/y/z of
    [n | eu | ev] over column blocks [0:C | C:2C | 2C:3C]; row 3 holds
    (cn | cu | cv); row 4 lane 0 holds the cluster's first-triangle id
    (bitcast i32); rows 5..7 are zero padding (sublane alignment).
    Padding triangles (cluster count < C) get all-zero columns: nd == 0
    makes them unconditionally invalid, same as degenerate triangles in the
    reference test (|det| < epsilon, ray-integrator.cpp:162-229).
    """
    n_clus = cut.first.shape[0]
    e1 = (v1 - v0).astype(np.float64)
    e2 = (v2 - v0).astype(np.float64)
    n = np.cross(e1, e2)
    a = np.einsum("ij,ij->i", e1, e1)
    b = np.einsum("ij,ij->i", e1, e2)
    cc = np.einsum("ij,ij->i", e2, e2)
    gram = a * cc - b * b
    ok = gram > 1e-30
    inv = np.where(ok, 1.0 / np.where(ok, gram, 1.0), 0.0)
    eu = (cc[:, None] * e1 - b[:, None] * e2) * inv[:, None]
    ev = (a[:, None] * e2 - b[:, None] * e1) * inv[:, None]
    n = np.where(ok[:, None], n, 0.0)
    cn = np.einsum("ij,ij->i", n, v0.astype(np.float64))
    cu = np.einsum("ij,ij->i", eu, v0.astype(np.float64))
    cv = np.einsum("ij,ij->i", ev, v0.astype(np.float64))

    pack = np.zeros((n_clus, 8, 3 * c), np.float32)
    for ci in range(n_clus):
        f, cnt = int(cut.first[ci]), int(cut.count[ci])
        sl = slice(f, f + cnt)
        pack[ci, 0:3, 0:cnt] = n[sl].T
        pack[ci, 0:3, c : c + cnt] = eu[sl].T
        pack[ci, 0:3, 2 * c : 2 * c + cnt] = ev[sl].T
        pack[ci, 3, 0:cnt] = cn[sl]
        pack[ci, 3, c : c + cnt] = cu[sl]
        pack[ci, 3, 2 * c : 2 * c + cnt] = cv[sl]
        # First-triangle id bitcast into row 4 lane 0: the fused traversal
        # kernel (kernels/pallas_fusedtrace.py) reads it back as a vector
        # so no dynamic scalar-memory lookup is needed per cluster.
        pack[ci, 4, 0] = np.int32(f).view(np.float32)
    return pack
