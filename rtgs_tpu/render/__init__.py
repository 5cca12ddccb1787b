from rtgs_tpu.render.oracle import (
    composite_hits,
    composite_rays,
    render_oracle,
    render_peeled_reference,
    topk_hits,
)

__all__ = [
    "composite_hits",
    "composite_rays",
    "render_oracle",
    "render_peeled_reference",
    "topk_hits",
]
