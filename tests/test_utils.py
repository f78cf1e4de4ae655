"""Utility-layer tests: obj loader, image IO, checkpointing, CLI render."""
import io
import os

import numpy as np

from tpurt.scene.obj import load_obj, scene_from_obj
from tpurt.utils import load_png, save_png, save_pytree, load_pytree

OBJ = """
# cube-ish sample
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vn 0 0 1
usemtl red
f 1/1/1 2/2/1 3/3/1 4/1/1
usemtl blue
f -4 -3 -2
"""


def test_load_obj_basic():
    mesh = load_obj(io.StringIO(OBJ).read().splitlines())
    assert mesh["vertices"].shape == (4, 3)
    # quad fan-triangulated into 2 + extra tri = 3
    assert mesh["triangles"].shape == (3, 3)
    assert mesh["groups"] == ["default", "red", "blue"]
    assert list(mesh["tri_group"]) == [1, 1, 2]
    assert mesh["normals"] is not None
    np.testing.assert_allclose(mesh["normals"][0], [0, 0, 1])


def test_scene_from_obj(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text(OBJ)
    scene = scene_from_obj(str(p))
    assert scene.n_tris >= 3
    from tpurt.ref import render_ref

    img = np.asarray(render_ref(scene, 8, 8))
    assert np.isfinite(img).all()


def test_png_roundtrip(tmp_path):
    img = np.random.default_rng(0).uniform(size=(8, 10, 3)).astype(np.float32)
    p = str(tmp_path / "x.png")
    save_png(p, img)
    back = load_png(p)
    assert back.shape == (8, 10, 3)
    np.testing.assert_allclose(back, img, atol=1 / 255 + 1e-6)


def test_checkpoint_roundtrip_scene(tmp_path):
    from tpurt.scene import configs

    scene, _ = configs.config3_spheres(8, 8)
    p = str(tmp_path / "scene.npz")
    save_pytree(p, scene)
    back = load_pytree(p)
    np.testing.assert_array_equal(
        np.asarray(back.vertices), np.asarray(scene.vertices)
    )
    np.testing.assert_array_equal(
        np.asarray(back.materials.kd), np.asarray(scene.materials.kd)
    )
    assert back.smooth == scene.smooth


def test_cli_render(tmp_path):
    from tpurt.cli import main

    out = str(tmp_path / "r.png")
    main(["render", "--config", "1", "--res", "16x16", "--out", out])
    assert os.path.exists(out)
    img = load_png(out)
    assert img.shape == (16, 16, 3)


def test_cli_inverse_reduces_loss(capsys, tmp_path):
    import json

    from tpurt.cli import main

    main(["inverse", "--config", "1", "--res", "12x12", "--steps", "6",
          "--lr", "0.5", "--ckpt", str(tmp_path / "ck.npz")])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    losses = [l["loss"] for l in lines if "loss" in l]
    assert losses[-1] < losses[0]
    assert os.path.exists(tmp_path / "ck.npz")
