"""The five benchmark scene configs of BASELINE.json:6-12, as builders.

Each returns (scene, RenderConfig).  These are the parity/benchmark fixtures
(SURVEY.md §6); resolutions can be overridden for cheap tests.

`pad_to` controls primitive padding (kernels want lane-aligned counts).
"""
from __future__ import annotations

import numpy as np

from tpurt import constants as C
from tpurt.core.types import RenderConfig
from tpurt.scene import meshes
from tpurt.scene.scene import Camera, build_scene


def config1_sphere(height=256, width=256, pad_to=1):
    """BASELINE config 1: single diffuse sphere + point light, primary rays."""
    scene = build_scene(
        spheres=[((0.0, 0.0, 0.0), 1.0, 0)],
        materials=[{"ka": 0.1, "kd": (0.8, 0.3, 0.3), "ks": 0.0}],
        lights=[((3.0, 4.0, 5.0), (1.0, 1.0, 1.0))],
        camera=Camera.make((0.0, 0.0, 4.0), (0.0, 0.0, 0.0)),
        pad_tris_to=pad_to,
        pad_spheres_to=pad_to,
    )
    cfg = RenderConfig(width=width, height=height, max_depth=0, shadows=False)
    return scene, cfg


def config2_cornell(height=512, width=512, pad_to=1):
    """BASELINE config 2: Cornell box (~36 tris) with shadow rays; gradient
    targets are wall albedo and light intensity."""
    white, red, green, boxm = 0, 1, 2, 3
    room_v, room_t = meshes.box((-1, 0, -1), (1, 2, 1), inward=True)
    # per-wall materials: identify walls by face order in meshes.box
    # faces: back(z0), front(z1), floor(y0), ceil(y1), left(x0), right(x1)
    room_m = np.asarray(
        [white] * 2 + [white] * 2 + [white] * 2 + [white] * 2 + [red] * 2 + [green] * 2,
        np.int32,
    )
    # drop the front wall (camera looks through it): faces index 2,3
    keep = np.ones(12, bool)
    keep[2:4] = False
    room_t, room_m = room_t[keep], room_m[keep]

    tall_v, tall_t = meshes.box((-0.65, 0.0, -0.6), (-0.15, 1.2, -0.1))
    short_v, short_t = meshes.box((0.15, 0.0, 0.0), (0.65, 0.6, 0.5))

    verts = np.concatenate([room_v, tall_v, short_v], 0)
    tris = np.concatenate(
        [room_t, tall_t + len(room_v), short_t + len(room_v) + len(tall_v)], 0
    )
    tmat = np.concatenate([room_m, np.full(12, boxm), np.full(12, boxm)], 0)

    scene = build_scene(
        vertices=verts,
        triangles=tris,
        tri_mat=tmat,
        materials=[
            {"ka": 0.1, "kd": (0.73, 0.73, 0.73)},
            {"ka": 0.1, "kd": (0.65, 0.05, 0.05)},
            {"ka": 0.1, "kd": (0.12, 0.45, 0.15)},
            {"ka": 0.1, "kd": (0.73, 0.73, 0.68)},
        ],
        lights=[((0.0, 1.9, 0.0), (1.0, 1.0, 1.0))],
        # generic-position camera: exact axis alignment puts pixel centers
        # precisely on wall-seam diagonals, where fp tie-breaking between
        # intersectors is ill-defined
        camera=Camera.make((0.013, 1.004, 3.4), (0.0, 1.0, 0.0), fov_y=np.pi / 4),
        pad_tris_to=pad_to,
        pad_spheres_to=pad_to,
    )
    cfg = RenderConfig(width=width, height=height, max_depth=0, shadows=True)
    return scene, cfg


def config3_spheres(height=512, width=512, pad_to=1):
    """BASELINE config 3: multi-sphere scene with specular reflection
    (depth-2 Whitted); gradient targets are sphere centers/radii."""
    floor_v, floor_t = meshes.quad(
        (-6, 0, -6), (-6, 0, 6), (6, 0, 6), (6, 0, -6)
    )
    scene = build_scene(
        vertices=floor_v,
        triangles=floor_t,
        tri_mat=np.zeros(2, np.int32),
        spheres=[
            ((-1.2, 1.0, 0.0), 1.0, 1),
            ((1.2, 0.7, 0.8), 0.7, 2),
            ((0.2, 0.45, -1.3), 0.45, 3),
        ],
        materials=[
            {"ka": 0.1, "kd": (0.6, 0.6, 0.6), "ks": 0.1, "reflectivity": 0.15},
            {"ka": 0.05, "kd": (0.7, 0.2, 0.2), "ks": 0.6, "shininess": 64.0,
             "reflectivity": 0.4},
            {"ka": 0.05, "kd": (0.2, 0.3, 0.7), "ks": 0.6, "shininess": 64.0,
             "reflectivity": 0.4},
            {"ka": 0.05, "kd": (0.9, 0.8, 0.2), "ks": 0.3, "shininess": 16.0,
             "reflectivity": 0.25},
        ],
        lights=[
            ((4.0, 6.0, 4.0), (0.9, 0.9, 0.9)),
            ((-5.0, 4.0, 1.0), (0.35, 0.35, 0.4)),
        ],
        camera=Camera.make((0.0, 1.6, 5.0), (0.0, 0.8, 0.0), fov_y=np.pi / 4),
        pad_tris_to=pad_to,
        pad_spheres_to=pad_to,
    )
    cfg = RenderConfig(width=width, height=height, max_depth=2, shadows=True)
    return scene, cfg


def config4_bunny(height=1024, width=1024, subdiv=6, pad_to=1):
    """BASELINE config 4: ~70k-tri mesh (bunny stand-in: displaced icosphere,
    20*4**subdiv tris; subdiv=6 → 81920) with acceleration + shading; vertex
    position gradients."""
    blob_v, blob_t = meshes.displaced_blob(subdiv, radius=1.0, center=(0, 1.1, 0))
    floor_v, floor_t = meshes.quad((-8, 0, -8), (-8, 0, 8), (8, 0, 8), (8, 0, -8))
    verts, tris, tmat, _ = meshes.merge(
        [(blob_v, blob_t, 1), (floor_v, floor_t, 0)]
    )
    scene = build_scene(
        vertices=verts,
        triangles=tris,
        tri_mat=tmat,
        materials=[
            {"ka": 0.1, "kd": (0.55, 0.55, 0.55)},
            {"ka": 0.08, "kd": (0.75, 0.65, 0.5), "ks": 0.25, "shininess": 32.0},
        ],
        lights=[
            ((4.0, 6.0, 4.0), (1.0, 1.0, 1.0)),
            ((-4.0, 3.0, 2.0), (0.3, 0.3, 0.35)),
        ],
        camera=Camera.make((0.0, 1.8, 4.2), (0.0, 1.0, 0.0), fov_y=np.pi / 4),
        smooth=True,
        pad_tris_to=pad_to,
        pad_spheres_to=pad_to,
    )
    cfg = RenderConfig(width=width, height=height, max_depth=1, shadows=True)
    return scene, cfg


def _checkerboard(n=64, c0=(0.9, 0.9, 0.9), c1=(0.2, 0.25, 0.3)):
    ij = np.add.outer(np.arange(n) // 8, np.arange(n) // 8) % 2
    tex = np.where(ij[..., None] == 0, np.asarray(c0), np.asarray(c1))
    return tex.astype(np.float32)


def config5_multimesh(height=1080, width=1920, pad_to=1, n_blobs=12, subdiv=6):
    """BASELINE config 5: multi-mesh scene (~1M tris, textured Phong) at
    1080p; full fwd+bwd, sharded across the device mesh.

    n_blobs=12 × 81920 tris ≈ 983k tris + floor ≈ 1M.
    """
    rng = np.random.default_rng(7)
    parts = []
    for k in range(n_blobs):
        ang = 2 * np.pi * k / n_blobs
        ring = 1 + (k % 3)
        r = 1.4 * ring
        c = (r * np.cos(ang), 0.55 + 0.1 * (k % 4), r * np.sin(ang))
        bv, bt = meshes.displaced_blob(subdiv, radius=0.55, center=c, seed=k)
        parts.append((bv, bt, 1 + (k % 3)))
    # textured floor (material 0 has texture_id 0)
    fv, ft = meshes.quad((-12, 0, -12), (-12, 0, 12), (12, 0, 12), (12, 0, -12))
    fuv = np.asarray([[0, 0], [0, 8], [8, 8], [8, 0]], np.float32)
    parts.append((fv, ft, 0, fuv))
    verts, tris, tmat, uvs = meshes.merge(parts)

    scene = build_scene(
        vertices=verts,
        triangles=tris,
        tri_mat=tmat,
        uvs=uvs,
        materials=[
            {"ka": 0.1, "kd": (1.0, 1.0, 1.0), "ks": 0.05, "texture_id": 0},
            {"ka": 0.06, "kd": (0.75, 0.3, 0.25), "ks": 0.35, "shininess": 48.0},
            {"ka": 0.06, "kd": (0.25, 0.55, 0.3), "ks": 0.35, "shininess": 48.0},
            {"ka": 0.06, "kd": (0.3, 0.35, 0.7), "ks": 0.35, "shininess": 48.0},
        ],
        textures=_checkerboard()[None],
        lights=[
            ((8.0, 10.0, 6.0), (1.0, 1.0, 1.0)),
            ((-7.0, 6.0, -4.0), (0.35, 0.3, 0.3)),
        ],
        camera=Camera.make((0.0, 3.2, 8.5), (0.0, 0.7, 0.0), fov_y=np.pi / 4),
        smooth=True,
        pad_tris_to=pad_to,
        pad_spheres_to=pad_to,
    )
    cfg = RenderConfig(width=width, height=height, max_depth=1, shadows=True)
    return scene, cfg


ALL_CONFIGS = {
    1: config1_sphere,
    2: config2_cornell,
    3: config3_spheres,
    4: config4_bunny,
    5: config5_multimesh,
}
