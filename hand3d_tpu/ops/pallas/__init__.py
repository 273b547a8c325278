"""Pallas TPU kernels for the cascade's hot non-conv ops."""

from hand3d_tpu.ops.pallas.floodfill import flood_fill_pallas

__all__ = ["flood_fill_pallas"]
