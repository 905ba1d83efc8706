"""GLENet CVAE: conditional VAE over per-object point crops producing
stochastic box predictions, whose across-sample variance becomes the
per-label uncertainty (reference cvae_uncertainty/model.py + point_net.py).

Faithful semantic notes (reference quirks preserved deliberately):
  - encoders output (mu, logvar) and the Gaussian used for the KL has
    scale sigma = exp(logvar) + 3e-22 (model.py:49 — logvar acts as log-STD
    in the KL), while reparametrized sampling uses std = exp(0.5 * logvar)
    (model.py:195-198).  We replicate both conventions exactly.
  - PointNetfeat: 1D convs 64x/128x/512x + BN, NO ReLU before the global
    max-pool (point_net.py:27).
  - Generator output layout: [center(3), size(3), heading(1), dir_bins(2)].
  - losses: sin-diff smooth-L1 on dims :7 (loc_weight), dir-bin CE
    (dir_weight), KL(posterior || prior) * latent_weight (annealed by the
    trainer), plus 1e-4 * sum of L2 norms of all parameters.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils import common, losses


class PointNetFeat(nn.Module):
    """(B, N, C) points -> (B, 512 * x) global features."""
    x: float = 1.0

    @nn.compact
    def __call__(self, pts, train: bool = True):
        def block(h, ch, relu=True):
            h = nn.Dense(ch, use_bias=True)(h)
            h = nn.BatchNorm(use_running_average=not train,
                             momentum=0.99, epsilon=1e-5)(h)
            return nn.relu(h) if relu else h

        h = block(pts, int(64 * self.x))
        h = block(h, int(128 * self.x))
        h = block(h, int(512 * self.x), relu=False)  # no ReLU before pool
        return h.max(axis=1)


class SimPointNetFeat(nn.Module):
    x: float = 1.0

    @nn.compact
    def __call__(self, pts, train: bool = True):
        ch = int(16 * self.x)

        def block(h, relu=True):
            h = nn.Dense(ch, use_bias=True)(h)
            h = nn.BatchNorm(use_running_average=not train,
                             momentum=0.99, epsilon=1e-5)(h)
            return nn.relu(h) if relu else h

        h = block(pts)
        h = block(h)
        h = block(h, relu=False)
        return h.max(axis=1)


class EncoderX(nn.Module):
    """Prior encoder: points -> (mu, logvar)."""
    latent_size: int = 3
    x: float = 1.0

    @nn.compact
    def __call__(self, pts, train: bool = True):
        feat = PointNetFeat(self.x)(pts, train=train)
        mu = nn.Dense(self.latent_size)(feat)
        logvar = nn.Dense(self.latent_size)(feat)
        return mu, logvar


class EncoderXY(nn.Module):
    """Posterior encoder: points + 8-dim gt box encoding -> (mu, logvar)."""
    latent_size: int = 3
    x: float = 1.0

    @nn.compact
    def __call__(self, pts, y, train: bool = True):
        feat = PointNetFeat(self.x)(pts, train=train)
        feat = jnp.concatenate([feat, y], axis=1)
        mu = nn.Dense(self.latent_size)(feat)
        logvar = nn.Dense(self.latent_size)(feat)
        return mu, logvar


class ObjectFeatEncoder(nn.Module):
    """Decoder: points + z -> [center(3), size(3), heading(1), dir(2)]."""
    latent_dim: int = 3
    num_bins: int = 2

    @nn.compact
    def __call__(self, pts, z, train: bool = True):
        feat = SimPointNetFeat(x=0.5)(pts, train=train)  # 8-dim
        h = jnp.concatenate([feat, z], axis=1)
        w = 64  # 256 * fc_scale(0.25)

        def bn_relu_dense(h, name):
            h = nn.Dense(w, name=name)(h)
            h = nn.BatchNorm(use_running_average=not train,
                             momentum=0.99, epsilon=1e-5)(h)
            return nn.relu(h)

        h = bn_relu_dense(h, 'fc1')
        feat = bn_relu_dense(h, 'fc2')

        def head(feat, out, name):
            h = nn.relu(nn.Dense(w, name=name + '_1')(feat))
            return nn.Dense(out, use_bias=False, name=name + '_2')(h)

        centers = head(feat, 3, 'fc_ce')
        sizes = head(feat, 3, 'fc_s')
        headings = head(feat, 1, 'fc_hr')
        dirs = head(feat, self.num_bins, 'fc_dir')
        return jnp.concatenate([centers, sizes, headings, dirs], axis=1)


class CVAEGenerator(nn.Module):
    """Full GLENet generator (train + inference forward)."""
    latent_dim: int = 3
    num_bins: int = 2
    scale: float = 1.0

    def setup(self):
        self.obj_encoder = ObjectFeatEncoder(self.latent_dim, self.num_bins)
        self.xy_encoder = EncoderXY(self.latent_dim, self.scale)
        self.x_encoder = EncoderX(self.latent_dim, self.scale)

    def __call__(self, pts, y, rng, train: bool = True):
        """Training forward.

        Args: pts (B, N, C); y (B, 8) gt box encoding; rng PRNG key.
        Returns dict with box_pred_post (B, 9), kl (B,), mus/logvars.
        """
        mu_post, logvar_post = self.xy_encoder(pts, y, train=train)
        mu_prior, logvar_prior = self.x_encoder(pts, train=train)

        # KL between diagonal Gaussians with sigma = exp(logvar) + 3e-22
        sp = jnp.exp(logvar_post) + 3e-22
        pp = jnp.exp(logvar_prior) + 3e-22
        kl = (jnp.log(pp / sp)
              + (sp ** 2 + (mu_post - mu_prior) ** 2) / (2.0 * pp ** 2)
              - 0.5).sum(axis=1)

        # reparametrize with std = exp(0.5 * logvar) (reference convention)
        eps = jax.random.normal(rng, mu_post.shape)
        z_post = mu_post + jnp.exp(0.5 * logvar_post) * eps
        box_pred_post = self.obj_encoder(pts, z_post, train=train)
        return {
            'box_pred_post': box_pred_post,
            'kl': kl,
            'mu_post': mu_post, 'logvar_post': logvar_post,
            'mu_prior': mu_prior, 'logvar_prior': logvar_prior,
        }

    def sample(self, pts, rng, dir_offset=0.78539, dir_limit_offset=0.0):
        """Inference: z ~ prior (reparametrized), decode, dir-corrected
        heading (reference model.py:245-265). Returns (B, 7) boxes."""
        mu, logvar = self.x_encoder(pts, train=False)
        eps = jax.random.normal(rng, mu.shape)
        z = mu + jnp.exp(0.5 * logvar) * eps
        pred = self.obj_encoder(pts, z, train=False)

        dir_labels = pred[:, -self.num_bins:].argmax(axis=-1)
        period = 2 * np.pi / self.num_bins
        dir_rot = common.limit_period(pred[:, 6] - dir_offset,
                                      dir_limit_offset, period)
        heading = dir_rot + dir_offset + period * dir_labels.astype(pred.dtype)
        return jnp.concatenate([pred[:, :6], heading[:, None]], axis=1)


def cvae_loss(out, gt_boxes7, params, loss_weights, num_bins=2,
              dir_offset=0.78539):
    """Loss tuple (reg_loss_post, latent_loss, regular_loss).

    Matches Generator.get_training_loss / reg_loss (model.py:293-366):
      reg = sin-diff smooth-L1(pred[:, :7], gt7).sum()/B * loc_weight
          + CE(dir_logits, dir_bins(gt heading)).sum()/B * dir_weight
      latent = mean(KL) * latent_weight   (annealing applied by trainer)
      regular = 1e-4 * sum of L2 norms of all parameter tensors
    """
    b = out['box_pred_post'].shape[0]
    pred7 = out['box_pred_post'][:, :7]
    code_weights = loss_weights.get('code_weights', None)
    pred_sin, gt_sin = losses.add_sin_difference(pred7[None], gt_boxes7[None])
    loc = losses.weighted_smooth_l1(pred_sin, gt_sin,
                                    code_weights=code_weights).sum() / b
    loc = loc * loss_weights['loc_weight']

    rot_gt = gt_boxes7[:, 6]
    offset_rot = common.limit_period(rot_gt - dir_offset, 0, 2 * np.pi)
    dir_t = jnp.clip(jnp.floor(offset_rot / (2 * np.pi / num_bins)),
                     0, num_bins - 1).astype(jnp.int32)
    dir_logits = out['box_pred_post'][:, None, -num_bins:]
    one_hot = jax.nn.one_hot(dir_t[:, None], num_bins)
    dir_loss = losses.weighted_cross_entropy(
        dir_logits, one_hot, jnp.ones((b, 1))).sum() / b
    dir_loss = dir_loss * loss_weights['dir_weight']
    reg_loss = loc + dir_loss

    latent = out['kl'].mean() * loss_weights['latent_weight']
    # L2 norm with eps inside the sqrt: torch's norm has a zero subgradient
    # at 0 while jnp.linalg.norm's is NaN (zero-init biases would kill grads)
    regular = 1e-4 * sum(jnp.sqrt(jnp.sum(p * p) + 1e-12)
                         for p in jax.tree.leaves(params))
    return reg_loss, latent, regular, {'loss_loc': loc, 'loss_dir': dir_loss}
