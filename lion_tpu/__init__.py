"""LION-TPU: a TPU-native (JAX / Flax / pjit / Pallas) rebuild of the LION
latent point diffusion framework (reference: nv-tlabs/LION).

Layout (mirrors reference layers, redesigned TPU-first; see SURVEY.md):
  config/    yacs-compatible config tree (reference: default_config.py,
             third_party/yacs_config.py)
  ops/       point-cloud ops: fps, ball_query, grouping, voxelize,
             devoxelize, knn-interpolate, chamfer, emd
             (reference: third_party/pvcnn/functional, ChamferDistancePytorch,
             PyTorchEMD -- rebuilt as pure-XLA + Pallas kernels)
  nn/        neural building blocks: AdaGN, SharedMLP, PVConv, SA/FP modules,
             LinearAttention (reference: models/pvcnn2*.py, models/adagn.py)
  models/    VAE, priors, LION api (reference: models/vae_adain.py,
             models/score_sde/resnet.py, models/latent_points_ada*.py,
             models/lion.py)
  diffusion/ beta schedules, discrete DDPM/DDIM (scan-based), VPSDE + ODE
             (reference: utils/diffusion*.py)
  trainers/  train loops as pjit'd steps (reference: trainers/)
  data/      ShapeNet15k loader (reference: datasets/pointflow_datasets.py)
  eval/      CD/EMD/1-NNA/COV/MMD/JSD metrics (reference:
             utils/evaluation_metrics_fast.py, utils/eval_helper.py)
  parallel/  mesh / sharding helpers (replaces torch.distributed NCCL path)
  ckpt/      orbax checkpointing + torch .pt import shim
"""

__version__ = "0.1.0"
