"""Wavefront .obj mesh loader (SURVEY.md §2 row R11 — the reference's C++
scene loader; its exact mesh format is unknown this round, so the loader
covers the de-facto standard interchange format).

Supports: v / vn / vt / f (tri + polygon fan triangulation), negative
indices, per-face v/vt/vn index triples, usemtl grouping (returns a
material-name id per triangle), ignores unknown directives.  Host-side
numpy only.
"""
from __future__ import annotations

import numpy as np


def load_obj(path_or_lines):
    """Parse an .obj file → dict with:

    vertices   (V, 3) f32
    triangles  (T, 3) i32
    uvs        (V, 2) f32 (zero where the file has none; per-corner uvs are
               averaged onto vertices — lossy but Scene stores per-vertex uv)
    normals    (V, 3) f32 or None (file normals, same vertex-averaging)
    tri_group  (T,) i32 — usemtl group index per triangle
    groups     list[str] — group names, index = tri_group value
    """
    if isinstance(path_or_lines, (str, bytes)):
        with open(path_or_lines) as f:
            lines = f.readlines()
    else:
        lines = list(path_or_lines)

    vs, vts, vns, faces = [], [], [], []
    groups = ["default"]
    cur_group = 0
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        tag = parts[0]
        if tag == "v":
            vs.append([float(x) for x in parts[1:4]])
        elif tag == "vt":
            vts.append([float(parts[1]), float(parts[2]) if len(parts) > 2 else 0.0])
        elif tag == "vn":
            vns.append([float(x) for x in parts[1:4]])
        elif tag == "usemtl":
            name = parts[1] if len(parts) > 1 else "default"
            if name not in groups:
                groups.append(name)
            cur_group = groups.index(name)
        elif tag == "f":
            corners = []
            for c in parts[1:]:
                ids = c.split("/")
                vi = int(ids[0])
                ti = int(ids[1]) if len(ids) > 1 and ids[1] else 0
                ni = int(ids[2]) if len(ids) > 2 and ids[2] else 0
                corners.append((vi, ti, ni))
            # fan-triangulate polygons
            for k in range(1, len(corners) - 1):
                faces.append((corners[0], corners[k], corners[k + 1], cur_group))

    V = len(vs)

    def resolve(i, n):
        return (i - 1) if i > 0 else (n + i)

    verts = np.asarray(vs, np.float32).reshape(-1, 3)
    tris = np.empty((len(faces), 3), np.int32)
    tri_group = np.empty(len(faces), np.int32)
    uvs = np.zeros((V, 2), np.float32)
    uv_cnt = np.zeros(V, np.int32)
    nrms = np.zeros((V, 3), np.float32)
    nrm_cnt = np.zeros(V, np.int32)

    for t, (c0, c1, c2, g) in enumerate(faces):
        tri_group[t] = g
        for k, (vi, ti, ni) in enumerate((c0, c1, c2)):
            v = resolve(vi, V)
            tris[t, k] = v
            if ti and vts:
                uvs[v] += np.asarray(vts[resolve(ti, len(vts))], np.float32)
                uv_cnt[v] += 1
            if ni and vns:
                nrms[v] += np.asarray(vns[resolve(ni, len(vns))], np.float32)
                nrm_cnt[v] += 1

    uvs = np.where(uv_cnt[:, None] > 0, uvs / np.maximum(uv_cnt[:, None], 1), 0.0)
    has_normals = nrm_cnt.sum() > 0
    if has_normals:
        lens = np.linalg.norm(nrms, axis=-1, keepdims=True)
        nrms = (nrms / np.maximum(lens, 1e-20)).astype(np.float32)

    return {
        "vertices": verts,
        "triangles": tris,
        "uvs": uvs.astype(np.float32),
        "normals": nrms if has_normals else None,
        "tri_group": tri_group,
        "groups": groups,
    }


def scene_from_obj(path, materials=None, lights=None, camera=None, smooth=True,
                   **kw):
    """Load an .obj straight into a Scene; usemtl groups map to material ids
    in order of first appearance."""
    from tpurt.scene.scene import build_scene

    mesh = load_obj(path)
    return build_scene(
        vertices=mesh["vertices"],
        triangles=mesh["triangles"],
        tri_mat=mesh["tri_group"],
        vnormals=mesh["normals"],
        uvs=mesh["uvs"],
        materials=materials or [{"kd": 0.7} for _ in mesh["groups"]],
        lights=lights,
        camera=camera,
        smooth=smooth,
        **kw,
    )
