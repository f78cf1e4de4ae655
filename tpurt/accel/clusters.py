"""Host-side cluster-BVH build (SURVEY.md §2 row R4 — the reference builds a
BVH on the C++ host; here the build is host-side numpy, with a C++ builder in
tpurt/accel/native for large scenes).

TPU-native traversal wants neither per-thread stacks nor pointer chasing
(SURVEY.md §7 "hard parts": divergent traversal on a vector machine).  The
structure built here is therefore a TWO-LEVEL flattening of a median-split
BVH: the tree is descended only until leaves hold ≤ LEAF triangles; each
leaf becomes a CLUSTER stored as one contiguous padded block.  The kernel
culls whole clusters against a ray tile with the same batched slab-test it
uses for triangles (one (128-cluster × R-ray) VPU pass), then streams only
surviving blocks from HBM and intersects them densely on the MXU — masked
vector work instead of divergent scalar traversal.

Padding uses DUPLICATES of the cluster's first triangle: duplicates are
harmless under closest-hit (ties resolve to the same triangle id) and under
any-hit (boolean or).
"""
from __future__ import annotations

import dataclasses

import numpy as np

LEAF = 128  # triangles per cluster block (= kernel lane width)


@dataclasses.dataclass(frozen=True)
class ClusterSet:
    """Flattened cluster partition of a triangle set.

    tri_ids:  (C, LEAF) int32 — global triangle index per slot (duplicates
              pad short clusters; a cluster is never empty).
    aabb_lo:  (C, 3) f32, aabb_hi: (C, 3) f32 — cluster bounds.
    """

    tri_ids: np.ndarray
    aabb_lo: np.ndarray
    aabb_hi: np.ndarray

    @property
    def n_clusters(self) -> int:
        return self.tri_ids.shape[0]


def build_clusters(vertices, triangles, leaf: int = LEAF) -> ClusterSet:
    """Median-split partition of triangles into ≤leaf-sized spatial clusters.

    vertices (V, 3) f32, triangles (T, 3) i32 (numpy or anything
    np.asarray-able).  O(T log T) host build, geometry-only (no materials).
    """
    verts = np.asarray(vertices, np.float32)
    tris = np.asarray(triangles, np.int64)
    T = tris.shape[0]
    v0 = verts[tris[:, 0]]
    v1 = verts[tris[:, 1]]
    v2 = verts[tris[:, 2]]
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    cent = (lo + hi) * 0.5

    leaves: list[np.ndarray] = []

    # iterative median split (avoids python recursion limits at 1M tris)
    stack = [np.arange(T)]
    while stack:
        idx = stack.pop()
        if len(idx) <= leaf:
            leaves.append(idx)
            continue
        c = cent[idx]
        axis = int(np.argmax(c.max(0) - c.min(0)))
        order = np.argsort(c[:, axis], kind="stable")
        # split at a multiple of `leaf` so leaves come out full (a plain
        # halving of e.g. 81920 tris bottoms out at 80-tri leaves — 60% more
        # clusters to cull and stream for the same geometry)
        n = len(idx)
        half = max(leaf, ((n // 2 + leaf // 2) // leaf) * leaf)
        half = min(half, n - 1)
        stack.append(idx[order[:half]])
        stack.append(idx[order[half:]])

    C = len(leaves)
    tri_ids = np.empty((C, leaf), np.int32)
    aabb_lo = np.empty((C, 3), np.float32)
    aabb_hi = np.empty((C, 3), np.float32)
    for ci, idx in enumerate(leaves):
        pad = np.full(leaf - len(idx), idx[0], np.int64)
        tri_ids[ci] = np.concatenate([idx, pad])
        aabb_lo[ci] = lo[idx].min(0)
        aabb_hi[ci] = hi[idx].max(0)
    return ClusterSet(tri_ids=tri_ids, aabb_lo=aabb_lo, aabb_hi=aabb_hi)
