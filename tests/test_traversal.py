"""Cluster-traversal kernel + deferred shading parity (SURVEY.md §4 items
1-2, §7 step 4).  Interpret mode on CPU; the same kernel compiles on TPU."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.accel import build_clusters, build_grid
from tpurt.kernels import traversal as TV
from tpurt.ref import render_ref
from tpurt.render import RenderPlan, prepare, render
from tpurt.scene import configs


def _plan_for(scene, kind="bvh"):
    verts = np.asarray(scene.vertices)
    tris = np.asarray(scene.triangles)
    cs = build_clusters(verts, tris) if kind == "bvh" else build_grid(verts, tris).clusters
    return jnp.asarray(cs.tri_ids)


def test_clustered_matches_oracle_mesh():
    scene, cfg = configs.config4_bunny(32, 32, subdiv=2)
    tri_ids = _plan_for(scene)
    img = np.asarray(TV.render_rows_clustered(scene, cfg, tri_ids, 0, 32))
    ref = np.asarray(render_ref(scene, config=cfg))
    np.testing.assert_allclose(img, ref, atol=2e-4)


def test_clustered_matches_oracle_spheres_reflections():
    scene, cfg = configs.config3_spheres(32, 32)  # depth-2, 2 lights
    tri_ids = _plan_for(scene)
    img = np.asarray(TV.render_rows_clustered(scene, cfg, tri_ids, 0, 32))
    ref = np.asarray(render_ref(scene, config=cfg))
    np.testing.assert_allclose(img, ref, atol=2e-4)


def test_grid_accel_matches_oracle():
    scene, cfg = configs.config4_bunny(24, 24, subdiv=2)
    tri_ids = _plan_for(scene, kind="grid")
    img = np.asarray(TV.render_rows_clustered(scene, cfg, tri_ids, 0, 24))
    ref = np.asarray(render_ref(scene, config=cfg))
    np.testing.assert_allclose(img, ref, atol=2e-4)


def test_clustered_textured_config5():
    scene, cfg = configs.config5_multimesh(24, 32, n_blobs=2, subdiv=2)
    tri_ids = _plan_for(scene)
    img = np.asarray(TV.render_rows_clustered(scene, cfg, tri_ids, 0, 24))
    ref = np.asarray(render_ref(scene, config=cfg))
    np.testing.assert_allclose(img, ref, atol=2e-4)


def test_shadow_rebin_matches_in_kernel_shadows(monkeypatch):
    """The Morton-re-binned shadow pass (shadow_rebin=True, gated to large
    cluster counts) produces bit-identical occlusion to in-kernel shadows
    over pixel tiles — same ray construction and (T_MIN, dist − eps) band,
    different tiling.  Covers the textured mesh+sphere scene (two lights);
    the size gate is lowered so the test scene takes the re-binned path."""
    monkeypatch.setattr(TV, "SHADOW_REBIN_MIN_CLUSTERS", 0)
    scene, cfg = configs.config5_multimesh(24, 32, n_blobs=2, subdiv=2)
    tri_ids = _plan_for(scene)
    img_rb = np.asarray(TV.render_rows_clustered(scene, cfg, tri_ids, 0, 24))
    img_nk = np.asarray(
        TV.render_rows_clustered(
            scene, cfg.replace(shadow_rebin=False), tri_ids, 0, 24
        )
    )
    np.testing.assert_array_equal(img_rb, img_nk)


def test_clustered_gradients_match_oracle():
    scene, cfg = configs.config4_bunny(16, 16, subdiv=1)
    tri_ids = _plan_for(scene)

    def loss_c(s):
        return jnp.sum(TV.render_rows_clustered(s, cfg, tri_ids, 0, 16) ** 2)

    def loss_r(s):
        return jnp.sum(render_ref(s, config=cfg) ** 2)

    gc = jax.grad(loss_c, allow_int=True)(scene)
    gr = jax.grad(loss_r, allow_int=True)(scene)
    for f in ("vertices", "vnormals", "light_pos", "light_color"):
        a, b = np.asarray(getattr(gr, f)), np.asarray(getattr(gc, f))
        assert np.isfinite(b).all(), f
        np.testing.assert_allclose(b, a, atol=2e-4 * (np.abs(a).max() + 1e-6), err_msg=f)


def test_render_auto_routes_big_scene_through_clusters():
    scene, cfg = configs.config4_bunny(16, 16, subdiv=4)  # 5122 tris > phase1 cap
    plan = prepare(scene, cfg)
    assert plan.kind == "clusters"
    img = np.asarray(render(scene, cfg, plan=plan))
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()


def test_train_step_clustered_plan():
    from tpurt.dist import make_mesh, make_train_step

    scene, cfg = configs.config4_bunny(16, 16, subdiv=2)
    plan = RenderPlan(tri_ids=_plan_for(scene), kind="clusters")
    mesh = make_mesh(8)
    step = make_train_step(cfg, mesh, plan=plan)
    target = jnp.zeros((16, 16, 3), jnp.float32)
    s2, loss = step(scene, target, jnp.float32(1e-3))
    assert np.isfinite(float(loss))
    # vertices actually moved (grads flowed through refit + traversal)
    assert not np.allclose(np.asarray(s2.vertices), np.asarray(scene.vertices))


def test_wavefront_matches_multibounce_records_and_image():
    """Wavefront re-binned bounces produce the same records + image as the
    single multi-bounce kernel (config3: reflective spheres → live secondary
    rays through argsort binning)."""
    from tpurt.kernels.packc import pack_clusters

    scene, cfg = configs.config3_spheres(32, 32)
    tri_ids = _plan_for(scene)
    packed = pack_clusters(scene, tri_ids)

    ids_m, occ_m, _, _ = TV.trace_records(packed, cfg, 0, 32)
    ids_m = TV._untile(ids_m, 32, 32)
    occ_m = TV._untile(occ_m, 32, 32)
    ids_w, occ_w = TV._wavefront_records(scene, cfg, packed, 0, 32)
    np.testing.assert_array_equal(np.asarray(ids_w), np.asarray(ids_m))
    np.testing.assert_array_equal(np.asarray(occ_w), np.asarray(occ_m))

    img_w = np.asarray(
        TV.render_rows_clustered(scene, cfg.replace(wavefront=True), tri_ids, 0, 32)
    )
    img_m = np.asarray(
        TV.render_rows_clustered(scene, cfg.replace(wavefront=False), tri_ids, 0, 32)
    )
    np.testing.assert_allclose(img_w, img_m, atol=1e-6)


def test_kernel_records_match_oracle_records():
    """Record-level parity: the traversal kernel's (ids, occ) equal
    records_oracle lane by lane, including -1/0 on dead paths."""
    from tpurt.core import geom
    from tpurt.kernels.packc import pack_clusters
    from tpurt.shading.deferred import records_oracle

    scene, cfg = configs.config3_spheres(32, 32)
    tri_ids = _plan_for(scene)
    packed = pack_clusters(scene, tri_ids)
    ids_w, occ_w = TV._wavefront_records(scene, cfg, packed, 0, 32)

    o, d = geom.generate_rays(scene.camera, 32, 32)
    recs = records_oracle(
        scene, o.reshape(-1, 3), d.reshape(-1, 3), cfg.max_depth, cfg.shadows
    )
    T = scene.n_tris
    miss = ids_w < 0
    is_tri = (~miss) & (ids_w < T)
    prim = jnp.where(miss, -1, jnp.where(is_tri, ids_w, ids_w - T))
    np.testing.assert_array_equal(np.asarray(prim), np.asarray(recs.prim))
    np.testing.assert_array_equal(np.asarray(occ_w), np.asarray(recs.occ))


def test_chunked_hit_points_shadow_equality(monkeypatch):
    """The (miss, pid)-sorted chunk-cond hit-geometry recompute feeding the
    shadow-wavefront pass (r3) must produce occlusion bit-identical to the
    unchunked recompute — same formulas, same lanes, only skipped all-miss
    chunks differ (and those lanes are dead)."""
    from tpurt.shading import deferred as D

    scene, cfg = configs.config5_multimesh(16, 48, n_blobs=1, subdiv=3)
    cfg = cfg.replace(max_depth=1, shadow_rebin=True)
    tri_ids = _plan_for(scene)
    monkeypatch.setattr(TV, "SHADOW_REBIN_MIN_CLUSTERS", 0)

    def run():
        jax.clear_caches()
        from tpurt.kernels.packc import pack_clusters

        packed = pack_clusters(scene, tri_ids)
        ids, occ = TV._wavefront_records(scene, cfg, packed, 0, cfg.height)
        return np.asarray(ids), np.asarray(occ)

    monkeypatch.setattr(D, "SHADE_COMPACT", False)
    ids0, occ0 = run()
    monkeypatch.setattr(D, "SHADE_COMPACT", True)
    monkeypatch.setattr(D, "SHADE_COMPACT_MIN", 1)
    monkeypatch.setattr(D, "SHADE_CHUNKS", 4)
    ids1, occ1 = run()
    assert (ids0 == ids1).all()
    assert (occ0 == occ1).all()


def test_bf16x6_matches_highest(monkeypatch):
    """The single-pass K-concat bf16x6 intersection matmul (the r4 default,
    design.md item 24) computes exactly XLA HIGHEST's six product groups in
    one dot, so the render must match the f32-HIGHEST kernel to float-ulp
    noise (bit-identical in interpret mode — the accumulation order of the
    K=48 dot matches the 6-pass sum here).  Mesh + spheres + shadows +
    reflections path."""
    scene, cfg = configs.config3_spheres(32, 32)
    tri_ids = _plan_for(scene)
    img_6x = np.asarray(TV.render_rows_clustered(scene, cfg, tri_ids, 0, 32))
    monkeypatch.setattr(TV, "MM3X", False)
    monkeypatch.setattr(TV, "_MM_PREC_STR", "highest")
    img_hi = np.asarray(TV.render_rows_clustered(scene, cfg, tri_ids, 0, 32))
    np.testing.assert_allclose(img_6x, img_hi, atol=2e-6)
