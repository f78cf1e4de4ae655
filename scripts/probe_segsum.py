"""Probes for the segsum kernel design (round 5, VERDICT item 1).

Measures on the real chip:
  1. Mosaic ABt dot_general support: contract ((1,),(1,)) with bf16.
  2. Pallas grid-step overhead: an N-block kernel that only zero-writes.
  3. XLA row-gather rates: coherent wide gather (N,25), random
     permutation gather (N,8), static-order gather (T,8) — the question
     is whether gathers run at bandwidth or at ~26 ns/row like argsort.
  4. argsort scaling 196k vs 576k vs 2M.

Run: python scripts/probe_segsum.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpurt_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


# ---- 1. ABt dot form ------------------------------------------------------
def _abt_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = lax.dot_general(
        a_ref[...], b_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.DEFAULT,
    )


def abt(a, b):
    return pl.pallas_call(
        _abt_kernel,
        out_shape=jax.ShapeDtypeStruct((a.shape[0], b.shape[0]), jnp.float32),
    )(a, b)


try:
    A = jnp.asarray(np.random.default_rng(0).standard_normal((8, 1536)),
                    jnp.bfloat16)
    B = jnp.asarray(np.random.default_rng(1).standard_normal((512, 1536)),
                    jnp.bfloat16)
    out = jax.jit(abt)(A, B)
    ref = np.asarray(A, np.float32) @ np.asarray(B, np.float32).T
    err = np.abs(np.asarray(out) - ref).max()
    print(f"ABt bf16 dot: OK, maxerr {err:.3e}", file=sys.stderr)
    bench("ABt (8,1536)x(512,1536)", jax.jit(abt), A, B)
except Exception as e:  # noqa: BLE001
    print(f"ABt bf16 dot: FAILED — {type(e).__name__}: {str(e)[:300]}",
          file=sys.stderr)


# ---- 2. grid-step overhead ------------------------------------------------
def _zero_kernel(o_ref):
    o_ref[...] = jnp.zeros_like(o_ref)


def zeros_blocks(nblocks, br, w):
    return pl.pallas_call(
        _zero_kernel,
        grid=(nblocks,),
        out_specs=pl.BlockSpec((w, br), lambda b: (0, b)),
        out_shape=jax.ShapeDtypeStruct((w, nblocks * br), jnp.float32),
    )()


for nb in (960, 3840):
    t = bench(f"zero-write grid nblocks={nb} (8,512) blocks",
              jax.jit(functools.partial(zeros_blocks, nb, 512, 8)))
    print(f"    ({t / nb * 1e3:.2f} us/block)", file=sys.stderr)


# ---- 3. gather rates ------------------------------------------------------
rng = np.random.default_rng(0)
T = 983042
V = 491548
pack = jnp.asarray(rng.standard_normal((T, 25)).astype(np.float32))
tab8 = jnp.asarray(rng.standard_normal((V, 8)).astype(np.float32))

# coherent wide gather (the shading fwd shape): sorted pids with runs 1.5
pid = np.sort(rng.integers(0, T, 2073600 * 2 // 3))
pid = np.repeat(pid, 2)[:2073600]
pid_j = jnp.asarray(pid.astype(np.int32))
t = bench("gather (2.07M,25) coherent", jax.jit(lambda i: pack[i]), pid_j)
print(f"    ({t / 2073600 * 1e6:.1f} ns/row)", file=sys.stderr)

for n in (196608, 589824):
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    upd8 = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    t = bench(f"permutation gather ({n},8)",
              jax.jit(lambda u, p: u[p]), upd8, perm)
    print(f"    ({t / n * 1e6:.1f} ns/row)", file=sys.stderr)

# static corner-order gather: (3T, 8) rows of a (T, 8) table
order = jnp.asarray(rng.permutation(3 * T).astype(np.int32) % T)
tabT = jnp.asarray(rng.standard_normal((T, 8)).astype(np.float32))
t = bench("static-order gather (3T,8) of (T,8)",
          jax.jit(lambda tab, o: tab[o]), tabT, order)
print(f"    ({t / (3 * T) * 1e6:.1f} ns/row)", file=sys.stderr)

# ---- 4. argsort scaling ---------------------------------------------------
for n in (196608, 589824, 2073600):
    keys = jnp.asarray(rng.integers(0, V, n).astype(np.int32))
    t = bench(f"argsort {n}", jax.jit(jnp.argsort), keys)
    print(f"    ({t / n * 1e6:.1f} ns/elem)", file=sys.stderr)
