from rtgs_tpu.render.oracle import composite_rays, render_oracle, render_peeled_reference

__all__ = [
    "composite_rays",
    "render_oracle",
    "render_peeled_reference",
]
