"""TPU-native point-cloud ops.

Mirrors the 7-function API of the reference
`third_party/pvcnn/functional/__init__.py` plus chamfer / EMD, rebuilt as
pure-XLA (MXU-friendly) ops with JAX-autodiff backwards; Pallas fast paths
live in `lion_tpu.ops.pallas`.
"""
from .points import (ball_query, ball_query_group, furthest_point_sample,
                     furthest_point_sample_idx, gather, grouping,
                     pairwise_sqdist)
from .voxel import (avg_voxelize, normalize_coords, trilinear_devoxelize,
                    voxelize)
from .interpolate import nearest_neighbor_interpolate, three_nn
from .chamfer import chamfer, chamfer_dist, chamfer_l1
from .emd import emd_approx

__all__ = [
    "ball_query", "ball_query_group", "furthest_point_sample",
    "furthest_point_sample_idx", "gather", "grouping", "pairwise_sqdist",
    "avg_voxelize", "normalize_coords", "trilinear_devoxelize", "voxelize",
    "nearest_neighbor_interpolate", "three_nn",
    "chamfer", "chamfer_dist", "chamfer_l1", "emd_approx",
]
