"""Sorted-segment row accumulation on the MXU — the sub-serial scatter.

XLA lowers TPU `scatter-add` SERIALLY, one update row at a time — measured
~13 ns/update standalone into a cache-resident target but ~50-80 ns/update
inside the real backward graph (scripts/ablate_bwd_real.py r5 tier: the
vertex-table scatters alone are ~67 ms of config 5's backward).  This
kernel replaces the serial scatter for SORTED update streams with an MXU
formulation:

    out[r, :] = Σ_{n : idx[n] == r} upd[n, :]        (idx ascending)

Mechanism: the output is cut into (BR, W) row blocks; because `idx` is
sorted, each block's updates form one contiguous range [starts[b],
starts[b+1]) — found with ONE vectorized searchsorted outside the kernel.
Each grid step streams its range in U-column chunks (double-buffered DMA)
and accumulates `upd · onehotᵀ` per chunk: the one-hot is exact in bf16
and the f32 updates ride as an exact 3-term bf16 split (8+8+8 mantissa
bits — the same Sterbenz argument as the traversal kernel's bf16x6 stacks,
traversal.py `_bf16_split`), lane-concatenated so the whole chunk is ONE
native bf16 MXU pass (the A·Bᵀ contraction — lanes × lanes — lowers
natively, probed on-chip in scripts/probe_segsum.py).

Layout (everything lane-native — Mosaic pads narrow minor dims of HBM
operands to 128 lanes, a 16× copy for (N, 8) arrays, so ALL kernel arrays
keep the big axis minor):
  - updates enter TRANSPOSED as one (W+1, N_pad) f32 panel; row W carries
    idx as exact f32 (requires n_rows < 2^24);
  - chunk DMA offsets are aligned DOWN to 128 — head rows belong to
    earlier blocks and fail the one-hot compare by sortedness, so no mask
    is needed (likewise tail rows of later blocks);
  - the output is (W, R_pad), transposed back by XLA (one cheap copy).

Accumulation order within a row is ascending update order, so results
differ from the serial scatter only in f32 summation order: allclose, not
bit-equal.

The reference has no backward pass at all (SURVEY.md §1a — forward OpenCL
renderer); this subsystem serves BASELINE.json:5's "hand-derived backward
kernels" requirement.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32

#: sentinel idx for padding lanes: ≥ any real row, exact in f32
_SENTINEL = float(1 << 24)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _segsum_kernel(starts_ref, updt_hbm, out_ref, buf, sems, *,
                   block_rows, chunk, width):
    # updt panel rows: [0:width) update cols, row `width` = idx as f32,
    # rest zero-pad to a sublane multiple (HBM slices need 8-aligned dims)
    b = pl.program_id(0)
    base = (b * block_rows).astype(f32)
    r0 = starts_ref[b]
    r1 = starts_ref[b + 1]
    r0a = (r0 // 128) * 128          # align the DMA offset down to lanes
    out_ref[...] = jnp.zeros((width, block_rows), f32)
    nch = lax.div(r1 - r0a + (chunk - 1), chunk)

    def copy(slot, ci):
        off = r0a + ci * chunk
        return pltpu.make_async_copy(
            updt_hbm.at[:, pl.ds(off, chunk)], buf.at[slot], sems.at[slot])

    @pl.when(nch > 0)
    def _():
        copy(0, 0).start()

        def body(ci, carry):
            slot = lax.rem(ci, 2)

            @pl.when(ci + 1 < nch)
            def _():
                copy(lax.rem(ci + 1, 2), ci + 1).start()

            copy(slot, ci).wait()
            idx_row = buf[slot][width:width + 1, :]          # (1, U) f32
            upd = buf[slot][0:width, :]                      # (W, U) f32
            rows = lax.broadcasted_iota(
                jnp.int32, (block_rows, chunk), 0).astype(f32) + base
            oh = (rows == idx_row).astype(jnp.bfloat16)      # (BR, U) 0/1
            # exact 3-term bf16 split of the f32 updates (module doc)
            u1 = upd.astype(jnp.bfloat16)
            r = upd - u1.astype(f32)
            u2 = r.astype(jnp.bfloat16)
            u3 = (r - u2.astype(f32)).astype(jnp.bfloat16)
            up3 = jnp.concatenate([u1, u2, u3], axis=1)      # (W, 3U)
            oh3 = jnp.concatenate([oh, oh, oh], axis=1)      # (BR, 3U)
            part = lax.dot_general(
                up3, oh3, (((1,), (1,)), ((), ())),          # A·Bᵀ on lanes
                preferred_element_type=f32,
                precision=lax.Precision.DEFAULT,             # native bf16
            )                                                # (W, BR)
            out_ref[...] = out_ref[...] + part
            return carry

        lax.fori_loop(0, nch, body, 0)


@functools.partial(jax.jit, static_argnames=("n_rows", "block_rows", "chunk"))
def sorted_segsum(idx_sorted, upd_sorted, n_rows: int, *, block_rows=512,
                  chunk=512):
    """out[r] = Σ upd rows whose (ASCENDING) idx == r; out (n_rows, W) f32.

    `idx_sorted` (N,) int32 ascending in [0, n_rows); `upd_sorted` (N, W)
    f32.  Callers sort (see `segsum_rows`).  Entries with idx outside
    [0, n_rows) contribute nothing.  Requires n_rows < 2^24 (idx rides as
    exact f32).
    """
    N, width = upd_sorted.shape
    assert n_rows < (1 << 24), n_rows
    R_pad = -(-n_rows // block_rows) * block_rows
    nblocks = R_pad // block_rows
    N_pad = -(-(N + chunk) // chunk) * chunk
    Wo = -(-width // 8) * 8            # sublane-aligned update/out width
    Wp = -(-(Wo + 1) // 8) * 8         # panel height (+1 idx row)
    idx_f = jnp.where(idx_sorted < n_rows,
                      idx_sorted.astype(f32), _SENTINEL)
    updw = jnp.pad(upd_sorted.astype(f32), ((0, 0), (0, Wo - width)))
    updt = jnp.concatenate(
        [updw.T, idx_f[None, :],
         jnp.zeros((Wp - Wo - 1, N), f32)], axis=0)           # (Wp, N)
    updt = jnp.pad(updt, ((0, 0), (0, N_pad - N)),
                   constant_values=_SENTINEL)
    bounds = (jnp.arange(nblocks + 1, dtype=jnp.int32) * block_rows)
    starts = jnp.searchsorted(idx_sorted.astype(jnp.int32), bounds,
                              side="left").astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((Wo, block_rows), lambda b, *_: (0, b)),
        scratch_shapes=[
            pltpu.VMEM((2, Wp, chunk), f32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_t = pl.pallas_call(
        functools.partial(_segsum_kernel, block_rows=block_rows,
                          chunk=chunk, width=Wo),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Wo, R_pad), f32),
        interpret=_interpret(),
    )(starts, updt)
    return out_t.T[:n_rows, :width]


def segsum_rows(idx, upd, n_rows: int, *, block_rows=512, chunk=512):
    """Unsorted segment-sum: argsort + permutation gather + the kernel.

    The argsort and the row-permutation gather both run at GATHER speed;
    only the accumulation itself needed rescuing from the serial scatter.
    `idx` entries outside [0, n_rows) contribute nothing (padding lanes).
    """
    flat = idx.reshape(-1).astype(jnp.int32)
    updf = upd.reshape(-1, upd.shape[-1])
    order = jnp.argsort(flat)
    return sorted_segsum(flat[order], updf[order], n_rows,
                         block_rows=block_rows, chunk=chunk)
