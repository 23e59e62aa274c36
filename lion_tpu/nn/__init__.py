"""Neural building blocks (Flax linen, channels-last)."""
from .common import (AdaGN, GroupNorm8, LinearAttention, Normalizer,
                     RandomFourierEmbedding, SE, SharedMLP, swish,
                     timestep_embedding, variance_scaling_init)
from .pvconv import PVConv
from .pointnet import PointNetAModule, PointNetFPModule, PointNetSAModule
from .unet import (ConvSpec, FPStage, PVCNN2Unet, SASpec, SAStage,
                   build_fp_stages, build_sa_stages)

__all__ = [
    "AdaGN", "GroupNorm8", "LinearAttention", "Normalizer",
    "RandomFourierEmbedding", "SE", "SharedMLP", "swish",
    "timestep_embedding", "variance_scaling_init", "PVConv",
    "PointNetAModule", "PointNetFPModule", "PointNetSAModule",
    "ConvSpec", "FPStage", "PVCNN2Unet", "SASpec", "SAStage",
    "build_fp_stages", "build_sa_stages",
]
