"""Shared NN building blocks (flax.linen).

The reference uses BatchNorm(eps=1e-3, momentum=0.01) everywhere.  Because
our tensors carry *padding* (fixed voxel/pillar budgets), plain BatchNorm
would pollute statistics with zero rows — `MaskedBatchNorm` computes masked
moments instead, and syncs across devices when `axis_name` is set (the
TPU-native replacement for SyncBatchNorm, SURVEY.md §2.5).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

BN_EPS = 1e-3
BN_MOMENTUM = 0.01  # torch convention: new = (1 - m) * old + m * batch

# Trace-time hook: when True every MaskedBatchNorm normalizes with its
# RUNNING stats even under train=True (stats are not updated).  Used by the
# convergence harnesses' frozen-BN fine-tune tail: tiny-dataset overfit
# makes train-mode (batch moments) and eval-mode (dataset moments)
# normalize each scene differently, which flips direction-bin argmaxes and
# depresses APH while IoU-based AP stays high (the round-3 Waymo APH
# artifact).  Freezing BN for a short parameter-adaptation phase makes
# train and eval numerically identical.  Set it BEFORE jitting a step —
# it is read at trace time.
BN_FORCE_RUNNING_STATS = False


class MaskedBatchNorm(nn.Module):
    """BatchNorm over axis(-1)-channels with an optional validity mask.

    Moments are computed over all leading axes, counting only rows where
    `mask` is True.  `axis_name` (if set and present) psums the moments
    across the device mesh.
    """
    use_running_average: Optional[bool] = None
    momentum: float = BN_MOMENTUM
    eps: float = BN_EPS
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param(
            'use_running_average', self.use_running_average, use_running_average)
        use_ra = use_ra or BN_FORCE_RUNNING_STATS
        features = x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((features,), jnp.float32))
        scale = self.param('scale', nn.initializers.ones, (features,))
        bias = self.param('bias', nn.initializers.zeros, (features,))

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            x32 = x.astype(jnp.float32)
            if mask is None:
                cnt = jnp.asarray(x32.size / features, jnp.float32)
                total = x32.sum(axis=tuple(range(x.ndim - 1)))
                total_sq = (x32 * x32).sum(axis=tuple(range(x.ndim - 1)))
            else:
                m = mask.astype(jnp.float32)[..., None]
                cnt = m.sum()
                total = (x32 * m).sum(axis=tuple(range(x.ndim - 1)))
                total_sq = (x32 * x32 * m).sum(axis=tuple(range(x.ndim - 1)))
            if self.axis_name is not None:
                try:
                    cnt = jax.lax.psum(cnt, self.axis_name)
                    total = jax.lax.psum(total, self.axis_name)
                    total_sq = jax.lax.psum(total_sq, self.axis_name)
                except NameError:
                    pass
            cnt = jnp.clip(cnt, 1.0, None)
            mean = total / cnt
            var = jnp.clip(total_sq / cnt - mean * mean, 0.0, None)
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * var

        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        if mask is not None:
            y = jnp.where(mask[..., None], y, 0.0)
        return y.astype(x.dtype)


class ConvBlock(nn.Module):
    """Conv2D + BN + ReLU (NHWC).

    `transpose` with `output_padding=None` is the stride==kernel deconv the
    BEV backbones use (flax ConvTranspose, 'SAME').  With `output_padding`
    set it reproduces torch ConvTranspose2d(k, s, p, op) exactly: input
    dilated by the stride, padded (k-1-p, k-1-p+op), correlated with the
    (kH, kW, I, O) kernel — the layout t2f_conv_transpose produces, so
    reference deconv weights transplant with the same rule."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bn: bool = True
    use_relu: bool = True
    padding: str | int = 'SAME'
    transpose: bool = False
    output_padding: Optional[int] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        if self.transpose and self.output_padding is not None:
            k, s, op = self.kernel_size, self.stride, self.output_padding
            p = self.padding if isinstance(self.padding, int) else 0
            kernel = self.param(
                'kernel', nn.initializers.lecun_normal(),
                (k, k, x.shape[-1], self.features))
            lo, hi = k - 1 - p, k - 1 - p + op
            x = jax.lax.conv_general_dilated(
                x, kernel, window_strides=(1, 1),
                padding=((lo, hi), (lo, hi)), lhs_dilation=(s, s),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            if not self.use_bn:
                x = x + self.param('bias', nn.initializers.zeros,
                                   (self.features,))
        elif self.transpose:
            x = nn.ConvTranspose(
                self.features, (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride), padding='SAME',
                use_bias=not self.use_bn)(x)
        else:
            x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                        strides=(self.stride, self.stride), padding=pad,
                        use_bias=not self.use_bn)(x)
        if self.use_bn:
            x = MaskedBatchNorm(axis_name=self.axis_name)(
                x, use_running_average=not train)
        if self.use_relu:
            x = nn.relu(x)
        return x


class MLP(nn.Module):
    """Dense stack with BN+ReLU between layers (masked-BN aware)."""
    features: Sequence[int]
    use_bn: bool = True
    final_activation: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        for i, f in enumerate(self.features):
            last = i == len(self.features) - 1
            x = nn.Dense(f, use_bias=not self.use_bn)(x)
            if self.use_bn:
                x = MaskedBatchNorm(axis_name=self.axis_name)(
                    x, mask=mask, use_running_average=not train)
            if not last or self.final_activation:
                x = nn.relu(x)
        return x
