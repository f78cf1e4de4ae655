"""On-chip rate measurement: Pallas sorted-segsum vs the XLA serial scatter.

VERDICT r4 item 1: the "7M updates/s serial-scatter floor" was costed
against XLA-level shapes only, never against a hand-written kernel.  This
script measures, at config-5's REAL backward shapes (V=491548-row vertex
table, hit-triangle-coherent corner indices):

  - jnp argsort cost at the per-compaction-chunk and whole-frame sizes;
  - the permutation gather;
  - the XLA scatter (plain and range-partitioned K=2 — the r4 production
    form);
  - the Pallas segsum kernel (sorted input, and end-to-end with sort).

Run (real TPU): python scripts/ablate_segsum.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpurt_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import jax
import jax.numpy as jnp
import numpy as np

from tpurt.kernels.segsum import segsum_rows, sorted_segsum
from tpurt.scene import configs


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0:1][0])


def bench(name, fn, *a, iters=5):
    fetch(fn(*a))
    fetch(fn(*a))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*a)
    fetch(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name}: {dt:.2f} ms", file=sys.stderr)
    return dt


scene, cfg = configs.config5_multimesh(1080, 1920)
T = scene.n_tris
V = scene.vertices.shape[0]
W = 8
tri = np.asarray(scene.triangles)
rng = np.random.default_rng(0)

# realistic per-compaction-chunk update stream: pid sorted with real runs
# (mean 1.5 — design.md item 26), corners = tri[pid]  ⇒ the EXACT index
# distribution _pack_gather_bwd scatters with
for n_pix in (65536, 303000):
    pid = np.sort(rng.integers(0, T, max(n_pix * 2 // 3, 1)))
    pid = np.repeat(pid, 2)[:n_pix]                      # runs ≈ 1.5
    i3 = tri[pid]                                        # (n, 3)
    idx = jnp.asarray(i3.T.reshape(-1))                  # (3n,) corner-major
    upd = jnp.asarray(rng.standard_normal((3 * n_pix, W)).astype(np.float32))
    n_upd = 3 * n_pix
    print(f"--- n_pix={n_pix} (updates={n_upd}) into ({V}, {W}) ---",
          file=sys.stderr)

    t = bench("argsort", jax.jit(lambda i: jnp.argsort(i)), idx)
    print(f"    ({t / n_upd * 1e6:.1f} ns/upd)", file=sys.stderr)

    order = jnp.argsort(idx)
    t = bench("permute gather (N,8)",
              jax.jit(lambda u, o: u[o]), upd, order)

    def scat_plain(i, u):
        return jnp.zeros((V, W), jnp.float32).at[i].add(u)

    t = bench("XLA scatter (plain)", jax.jit(scat_plain), idx, upd)
    print(f"    ({t / n_upd * 1e6:.1f} ns/upd)", file=sys.stderr)

    def scat_k2(i, u):
        Vk = -(-V // 2)
        out = []
        for kk in range(2):
            loc = i - kk * Vk
            m = (loc >= 0) & (loc < Vk)
            dk = jnp.zeros((Vk, W), jnp.float32).at[
                jnp.clip(loc, 0, Vk - 1)].add(jnp.where(m[:, None], u, 0.0))
            out.append(dk)
        return jnp.concatenate(out)[:V]

    t = bench("XLA scatter (K=2 ranges)", jax.jit(scat_k2), idx, upd)
    print(f"    ({t / n_upd * 1e6:.1f} ns/upd)", file=sys.stderr)

    idx_s = idx[order]
    upd_s = upd[order]
    for br in (256, 512, 1024):
        t = bench(f"pallas sorted_segsum BR={br}",
                  jax.jit(lambda i, u, _br=br: sorted_segsum(
                      i, u, V, block_rows=_br)), idx_s, upd_s)
        print(f"    ({t / n_upd * 1e6:.1f} ns/upd)", file=sys.stderr)

    t = bench("pallas segsum_rows (sort+kernel)",
              jax.jit(lambda i, u: segsum_rows(i, u, V)), idx, upd)
    print(f"    ({t / n_upd * 1e6:.1f} ns/upd)", file=sys.stderr)

    # numerical check vs the scatter on device
    a = np.asarray(jax.jit(scat_plain)(idx, upd))
    b = np.asarray(jax.jit(lambda i, u: segsum_rows(i, u, V))(idx, upd))
    rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-9)
    print(f"max rel diff vs scatter: {rel:.2e}", file=sys.stderr)
