"""Unit tests for intersection math (SURVEY.md §4 item 1: oracle parity at
the unit level — random rays vs numpy brute-force ground truth)."""
import jax.numpy as jnp
import numpy as np

from tpurt import constants as C
from tpurt.core import geom, vec


def _rand_rays(n, rng):
    o = rng.normal(size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def test_moller_trumbore_known_hit():
    # triangle in z=0 plane, ray straight down the z axis
    v0 = jnp.asarray([[-1.0, -1.0, 0.0]])
    e1 = jnp.asarray([[2.0, 0.0, 0.0]])   # v1 = (1,-1,0)
    e2 = jnp.asarray([[0.0, 2.0, 0.0]])   # v2 = (-1,1,0)
    o = jnp.asarray([0.0, 0.0, 5.0])
    d = jnp.asarray([0.0, 0.0, -1.0])
    hit, t, u, v = geom.intersect_tris(o, d, v0, e1, e2)
    assert bool(hit[0])
    np.testing.assert_allclose(t[0], 5.0, rtol=1e-6)
    # barycentric of center: p=(0,0) → u=v=0.5
    np.testing.assert_allclose(u[0], 0.5, rtol=1e-6)
    np.testing.assert_allclose(v[0], 0.5, rtol=1e-6)


def test_moller_trumbore_miss_outside():
    v0 = jnp.asarray([[-1.0, -1.0, 0.0]])
    e1 = jnp.asarray([[2.0, 0.0, 0.0]])
    e2 = jnp.asarray([[0.0, 2.0, 0.0]])
    o = jnp.asarray([5.0, 5.0, 5.0])
    d = jnp.asarray([0.0, 0.0, -1.0])
    hit, t, _, _ = geom.intersect_tris(o, d, v0, e1, e2)
    assert not bool(hit[0])
    assert float(t[0]) == float(np.float32(C.T_NONE))


def test_moller_trumbore_vs_numpy_random():
    rng = np.random.default_rng(0)
    n, T = 128, 64
    o, d = _rand_rays(n, rng)
    v0 = rng.normal(size=(T, 3)).astype(np.float32)
    v1 = v0 + rng.normal(size=(T, 3)).astype(np.float32)
    v2 = v0 + rng.normal(size=(T, 3)).astype(np.float32)
    hit, t, u, v = geom.intersect_tris(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(v0),
        jnp.asarray(v1 - v0), jnp.asarray(v2 - v0),
    )
    # numpy float64 ground truth
    e1, e2 = (v1 - v0).astype(np.float64), (v2 - v0).astype(np.float64)
    O = o[:, None, :].astype(np.float64)
    D = d[:, None, :].astype(np.float64)
    pv = np.cross(D, e2[None])
    det = np.sum(e1[None] * pv, -1)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / det
        tv = O - v0[None]
        U = np.sum(tv * pv, -1) * inv
        qv = np.cross(tv, e1[None])
        V = np.sum(D * qv, -1) * inv
        T_ = np.sum(e2[None] * qv, -1) * inv
    ref_hit = (
        (np.abs(det) >= C.MT_DET_EPS) & (U >= 0) & (V >= 0)
        & (U + V <= 1) & (T_ > C.T_MIN) & (T_ < C.T_MAX)
    )
    # allow disagreement only near decision boundaries
    margin = (
        np.minimum.reduce([np.abs(U), np.abs(V), np.abs(1 - U - V)]) > 1e-4
    ) & (np.abs(det) > 1e-5)
    agree = (np.asarray(hit) == ref_hit) | ~margin
    assert agree.mean() > 0.9999
    both = np.asarray(hit) & ref_hit & margin
    np.testing.assert_allclose(np.asarray(t)[both], T_[both], rtol=2e-3, atol=1e-4)


def test_sphere_known():
    c = jnp.asarray([[0.0, 0.0, 0.0]])
    r = jnp.asarray([1.0])
    o = jnp.asarray([0.0, 0.0, 5.0])
    d = jnp.asarray([0.0, 0.0, -1.0])
    hit, t = geom.intersect_spheres(o, d, c, r)
    assert bool(hit[0])
    np.testing.assert_allclose(t[0], 4.0, rtol=1e-6)
    # from inside: nearest positive root is the far side
    hit_in, t_in = geom.intersect_spheres(jnp.zeros(3), d, c, r)
    assert bool(hit_in[0])
    np.testing.assert_allclose(t_in[0], 1.0, rtol=1e-6)


def test_sphere_vs_numpy_random():
    rng = np.random.default_rng(1)
    n, S = 256, 16
    o, d = _rand_rays(n, rng)
    c = rng.normal(size=(S, 3)).astype(np.float32) * 2
    r = rng.uniform(0.2, 1.5, size=S).astype(np.float32)
    hit, t = geom.intersect_spheres(jnp.asarray(o), jnp.asarray(d), jnp.asarray(c), jnp.asarray(r))
    oc = o[:, None, :].astype(np.float64) - c[None].astype(np.float64)
    b = np.sum(oc * d[:, None, :], -1)
    cc = np.sum(oc * oc, -1) - (r.astype(np.float64) ** 2)[None]
    disc = b * b - cc
    sq = np.sqrt(np.maximum(disc, 0))
    t0, t1 = -b - sq, -b + sq
    ref_t = np.where(
        (disc > 0) & (t0 > C.T_MIN), t0, np.where((disc > 0) & (t1 > C.T_MIN), t1, C.T_NONE)
    )
    ref_hit = ref_t < C.T_MAX
    margin = np.abs(disc) > 1e-4
    assert ((np.asarray(hit) == ref_hit) | ~margin).mean() > 0.999
    both = np.asarray(hit) & ref_hit & margin
    np.testing.assert_allclose(np.asarray(t)[both], ref_t[both], rtol=2e-3, atol=1e-4)


def test_generate_rays_center_and_norm():
    from tpurt.scene.scene import Camera

    cam = Camera.make((0.0, 0.0, 5.0), (0.0, 0.0, 0.0), fov_y=np.pi / 2)
    o, d = geom.generate_rays(cam, 64, 64)
    assert o.shape == (64, 64, 3) and d.shape == (64, 64, 3)
    np.testing.assert_allclose(np.asarray(vec.length(d)), 1.0, atol=1e-6)
    # central rays point roughly along -z
    center_d = np.asarray(d)[31:33, 31:33].reshape(-1, 3).mean(0)
    assert center_d[2] < -0.99
    # top rows have +y component, left columns -x
    assert np.asarray(d)[0, 32, 1] > 0
    assert np.asarray(d)[32, 0, 0] < 0
