"""Acceleration-structure invariants (SURVEY.md §4 item 5): every triangle
referenced at least once, cluster AABBs contain their triangles, and
traversal hit set == brute force on random rays."""
import numpy as np

from tpurt.accel import build_clusters, build_grid
from tpurt.scene import meshes


def _mesh():
    v, t = meshes.displaced_blob(3, radius=1.0, center=(0, 0, 0))  # 1280 tris
    return v, t


def test_cluster_coverage_and_bounds():
    v, t = _mesh()
    cs = build_clusters(v, t)
    # every tri appears at least once
    assert set(np.unique(cs.tri_ids)) == set(range(len(t)))
    # bounds contain their triangles
    for c in range(cs.n_clusters):
        ids = cs.tri_ids[c]
        pts = v[t[ids]].reshape(-1, 3)
        assert (pts >= cs.aabb_lo[c] - 1e-5).all()
        assert (pts <= cs.aabb_hi[c] + 1e-5).all()
    # blocks are full-width
    assert cs.tri_ids.shape[1] == 128


def test_cluster_counts_reasonable():
    v, t = _mesh()
    cs = build_clusters(v, t)
    # median split halves until <=128: 1280 tris -> 16 leaves of 80
    assert cs.n_clusters <= 2 * (len(t) // 64 + 1)


def test_grid_coverage_and_bounds():
    v, t = _mesh()
    gs = build_grid(v, t)
    cs = gs.clusters
    assert set(np.unique(cs.tri_ids)) == set(range(len(t)))
    assert (cs.aabb_hi >= cs.aabb_lo - 1e-6).all()


def test_cluster_cull_preserves_hits():
    """A ray that brute-force hits triangle X must slab-hit some cluster
    containing X (the correctness condition of cull+stream traversal)."""
    rng = np.random.default_rng(3)
    v, t = _mesh()
    cs = build_clusters(v, t)
    # random rays toward the blob
    o = rng.normal(size=(64, 3)).astype(np.float32) * 4
    o += np.where(np.linalg.norm(o, axis=1, keepdims=True) < 2, 4.0, 0.0)
    d = -o + rng.normal(size=(64, 3)).astype(np.float32) * 0.3
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    v0 = v[t[:, 0]]
    e1 = v[t[:, 1]] - v0
    e2 = v[t[:, 2]] - v0
    # brute force MT in float64
    O = o[:, None].astype(np.float64)
    D = d[:, None].astype(np.float64)
    pv = np.cross(D, e2[None])
    det = np.sum(e1[None] * pv, -1)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / det
        tv = O - v0[None]
        U = np.sum(tv * pv, -1) * inv
        Q = np.cross(tv, e1[None])
        V = np.sum(D * Q, -1) * inv
        T_ = np.sum(e2[None] * Q, -1) * inv
    hit = (np.abs(det) > 1e-12) & (U >= 0) & (V >= 0) & (U + V <= 1) & (T_ > 1e-4)

    def slab(o1, d1, lo, hi):
        inv = np.where(np.abs(d1) < 1e-12, 1e30, 1.0 / d1)
        t0 = (lo - o1) * inv
        t1 = (hi - o1) * inv
        tn = np.minimum(t0, t1).max(-1)
        tf = np.maximum(t0, t1).min(-1)
        return (tn <= tf) & (tf > 0)

    for r in range(64):
        hit_tris = np.where(hit[r])[0]
        for x in hit_tris:
            # clusters containing x
            cls = np.where((cs.tri_ids == x).any(1))[0]
            ok = any(
                slab(o[r], d[r], cs.aabb_lo[c], cs.aabb_hi[c]) for c in cls
            )
            assert ok, f"ray {r} hits tri {x} but culls away all its clusters"
