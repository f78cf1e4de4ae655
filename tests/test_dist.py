"""Distributed tile-parallel tests on the 8-virtual-CPU-device mesh
(SURVEY.md §4 item 4): sharded == single-device, grads psum correctly,
the full training step runs, and the driver entry points work."""
import jax
import jax.numpy as jnp
import numpy as np

from tpurt.dist import make_mesh, make_train_step, render_sharded
from tpurt.render import render, render_and_grad
from tpurt.scene import configs


def test_sharded_matches_single_device():
    scene, cfg = configs.config3_spheres(32, 32)
    cfg = cfg.replace(max_depth=1)
    img1 = np.asarray(render(scene, cfg))
    mesh = make_mesh(8)
    img8 = np.asarray(render_sharded(scene, cfg, mesh))
    np.testing.assert_allclose(img1, img8, atol=2e-6)


def test_sharded_various_mesh_sizes():
    scene, cfg = configs.config1_sphere(24, 24)
    ref = np.asarray(render(scene, cfg))
    for n in (1, 2, 4):
        mesh = make_mesh(n)
        out = np.asarray(render_sharded(scene, cfg, mesh))
        np.testing.assert_allclose(ref, out, atol=2e-6)


def test_sharded_grads_match_single_device():
    scene, cfg = configs.config2_cornell(16, 16)
    mesh = make_mesh(8)

    def loss_single(lc):
        import dataclasses

        s = dataclasses.replace(scene, light_color=lc)
        return jnp.sum(render(s, cfg))

    def loss_sharded(lc):
        import dataclasses

        s = dataclasses.replace(scene, light_color=lc)
        return jnp.sum(render_sharded(s, cfg, mesh))

    g1 = np.asarray(jax.grad(loss_single)(scene.light_color))
    g8 = np.asarray(jax.grad(loss_sharded)(scene.light_color))
    np.testing.assert_allclose(g1, g8, rtol=1e-5, atol=1e-5)


def test_train_step_reduces_loss():
    scene, cfg = configs.config1_sphere(16, 16)
    mesh = make_mesh(8)
    step = make_train_step(cfg, mesh)
    # target: the same scene with dimmer light — recoverable by sgd
    import dataclasses

    target_scene = dataclasses.replace(scene, light_color=scene.light_color * 0.5)
    target = render(target_scene, cfg)
    losses = []
    s = scene
    for _ in range(5):
        s, loss = step(s, target, jnp.float32(0.5))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, example_args = ge.entry()
    out = jax.jit(fn)(*example_args)
    assert out.shape == (256, 256, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
