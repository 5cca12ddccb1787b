from rtgs_tpu.ops.peel import peel_pallas

__all__ = ["peel_pallas"]
