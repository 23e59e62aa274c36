#!/bin/bash
# Stage-2 CLIP-conditioned prior training (reference: script/train_prior_clip.sh).
# Single-controller JAX: the mesh covers all local devices; no NGPU arg.
loss="mse_sum"
BS=10
lr=2e-4
ckpt=${1:?usage: train_prior_clip.sh VAE_CKPT [CFG]}
CFG=${2:-}
EXTRA=""
[ -n "$CFG" ] && EXTRA="--config $CFG"
python train_dist.py $EXTRA \
    latent_pts.pvd_mse_loss 1 \
    num_val_samples 24 \
    ddpm.ema 1 \
    ddpm.use_bn False ddpm.use_gn True \
    ddpm.time_dim 64 \
    ddpm.beta_T 0.02 \
    sde.vae_checkpoint "$ckpt" \
    sde.learning_rate_dae $lr sde.learning_rate_min_dae $lr \
    trainer.epochs 18000 \
    sde.num_channels_dae 2048 \
    sde.dropout 0.3 \
    sde.prior_model 'models.latent_points_ada_localprior.PVCNN2Prior' \
    sde.train_vae False \
    sde.embedding_scale 1.0 \
    viz.save_freq 1000 \
    data.batch_size $BS \
    trainer.type 'trainers.train_2prior' \
    clipforge.enable 1 \
    data.clip_forge_enable 1 \
    data.clip_model 'ViT-B/32' \
    clipforge.clip_model 'ViT-B/32' \
    latent_pts.style_prior 'models.score_sde.resnet.PriorSEClip'
