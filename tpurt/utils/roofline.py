"""Roofline sanity analysis (SURVEY.md §5 "Tracing/profiling": per-kernel
roofline check — bytes moved vs HBM bandwidth, flops vs VPU/MXU peak).

Analytic model of the traversal megakernel's cost per frame from scene/
config shape; used to judge whether a measured ms/frame is bandwidth-,
compute-, or overhead-bound, and how far from speed-of-light it sits.
"""
from __future__ import annotations

import dataclasses

# TPU v5e (per chip) — public figures
V5E_HBM_GBPS = 819.0
V5E_MXU_BF16_TFLOPS = 394.0
V5E_MXU_F32_TFLOPS = 98.0     # f32 via bf16x6 passes
V5E_VPU_GFLOPS = 3_900.0      # 8x128 lanes × ~4 ALUs × 0.94 GHz


@dataclasses.dataclass
class TraversalCost:
    passes: int                # closest + occlusion passes per frame
    tiles: int
    survivors_per_pass: float  # avg clusters streamed per tile per pass
    chunks_hit_frac: float     # fraction of NCH sub-chunks computed

    dma_bytes: float = 0.0
    mxu_flops: float = 0.0
    vpu_flops: float = 0.0

    def lower_bound_ms(self) -> dict:
        dma_ms = self.dma_bytes / (V5E_HBM_GBPS * 1e9) * 1e3
        mxu_ms = self.mxu_flops / (V5E_MXU_F32_TFLOPS * 1e12) * 1e3
        vpu_ms = self.vpu_flops / (V5E_VPU_GFLOPS * 1e9) * 1e3
        return {
            "dma_ms": dma_ms,
            "mxu_ms": mxu_ms,
            "vpu_ms": vpu_ms,
            "bound_ms": max(dma_ms, mxu_ms, vpu_ms),
        }


def traversal_cost(height, width, max_depth, shadows, n_lights,
                   survivors_per_pass, chunks_hit_frac=0.5,
                   rays_per_tile=1024, leaf=128, nch=4) -> TraversalCost:
    """Estimate per-frame cost of the streaming traversal kernel."""
    tiles = -(-height * width // rays_per_tile)
    passes = (max_depth + 1) * (1 + (n_lights if shadows else 0))
    cluster_bytes = (8 * 6 * leaf + 16 * leaf) * 4       # forms + attrs
    dma = tiles * passes * survivors_per_pass * cluster_bytes
    # MXU: form matmul (8×6·leaf per chunk-ray) + attr one-hot
    chunk_rays = rays_per_tile // nch
    per_chunk_mxu = 2 * 8 * 6 * leaf * chunk_rays + 2 * leaf * 16 * chunk_rays
    mxu = tiles * passes * survivors_per_pass * (nch * chunks_hit_frac) * per_chunk_mxu
    # VPU: ~16 elementwise ops on (leaf, chunk_rays) per computed chunk
    per_chunk_vpu = 16 * leaf * chunk_rays
    vpu = tiles * passes * survivors_per_pass * (nch * chunks_hit_frac) * per_chunk_vpu
    return TraversalCost(
        passes=passes, tiles=tiles, survivors_per_pass=survivors_per_pass,
        chunks_hit_frac=chunks_hit_frac, dma_bytes=dma, mxu_flops=mxu,
        vpu_flops=vpu,
    )


def report(measured_ms, **kw) -> str:
    cost = traversal_cost(**kw)
    lb = cost.lower_bound_ms()
    eff = lb["bound_ms"] / measured_ms if measured_ms > 0 else 0.0
    return (
        f"passes={cost.passes} tiles={cost.tiles} "
        f"dma={cost.dma_bytes/1e9:.2f}GB "
        f"lower-bound dma={lb['dma_ms']:.1f}ms mxu={lb['mxu_ms']:.1f}ms "
        f"vpu={lb['vpu_ms']:.1f}ms | measured={measured_ms:.1f}ms "
        f"(roofline efficiency ≈ {100*eff:.0f}%)"
    )
