"""Oracle renderer behavioral tests (SURVEY.md §4 item 1) — the oracle is the
frozen ground truth, so these pin its physical behavior, not numbers."""
import jax.numpy as jnp
import numpy as np

from tpurt import constants as C
from tpurt.ref import render_ref
from tpurt.scene import configs


def test_config1_sphere_image():
    scene, cfg = configs.config1_sphere(64, 64)
    img = np.asarray(render_ref(scene, config=cfg))
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    assert (img >= 0).all() and (img <= 1).all()
    # corners miss the sphere → background
    np.testing.assert_allclose(img[0, 0], C.BACKGROUND, atol=1e-6)
    np.testing.assert_allclose(img[-1, -1], C.BACKGROUND, atol=1e-6)
    # center hits the sphere; red diffuse material, lit from upper right
    assert img[32, 32, 0] > 0.3
    assert img[32, 32, 0] > img[32, 32, 2]
    # light at (3,4,5): upper-right of the sphere is brighter than lower-left
    assert img[24, 40, 0] > img[40, 24, 0]


def test_config2_cornell_shadows():
    scene, cfg = configs.config2_cornell(96, 96)
    img = np.asarray(render_ref(scene, config=cfg))
    assert np.isfinite(img).all()
    # left wall red-dominant, right wall green-dominant
    left = img[48, 4]
    right = img[48, 91]
    assert left[0] > left[1]
    assert right[1] > right[0]
    # shadows on: image with shadows has strictly darker floor under boxes
    img_ns = np.asarray(render_ref(scene, config=cfg.replace(shadows=False)))
    assert img.sum() < img_ns.sum()


def test_config3_reflections_depth():
    scene, cfg = configs.config3_spheres(96, 96)
    img2 = np.asarray(render_ref(scene, config=cfg))
    img0 = np.asarray(render_ref(scene, config=cfg.replace(max_depth=0)))
    assert np.isfinite(img2).all()
    # reflective spheres: depth-2 image differs measurably from depth-0
    assert np.abs(img2 - img0).max() > 0.05


def test_oracle_deterministic():
    scene, cfg = configs.config1_sphere(32, 32)
    a = np.asarray(render_ref(scene, config=cfg))
    b = np.asarray(render_ref(scene, config=cfg))
    np.testing.assert_array_equal(a, b)


def test_config4_small_render():
    # tiny subdivision level: same code path (mesh + smooth normals), cheap
    scene, cfg = configs.config4_bunny(32, 32, subdiv=2)
    img = np.asarray(render_ref(scene, config=cfg))
    assert np.isfinite(img).all()
    # blob occupies image center
    assert img[16, 16].sum() > sum(C.BACKGROUND) + 0.05


def test_config5_textures_tiny():
    scene, cfg = configs.config5_multimesh(24, 32, n_blobs=2, subdiv=1)
    img = np.asarray(render_ref(scene, config=cfg))
    assert np.isfinite(img).all()
    # the checkerboard floor produces spatial variance in the lower image
    floor = img[18:, :, :].std()
    assert floor > 0.01
