from tpurt.ref.oracle import render_ref, trace_rays, shade_hits

__all__ = ["render_ref", "trace_rays", "shade_hits"]
