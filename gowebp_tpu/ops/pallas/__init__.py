"""Pallas TPU kernels (fused VMEM-resident hot paths).

See encode_plane.py for the dispatch/opt-in policy (GOWEBP_PALLAS=1).
"""

from .encode_plane import encode_plane_core_pallas, encode_plane_step_pallas

__all__ = ["encode_plane_core_pallas", "encode_plane_step_pallas"]
