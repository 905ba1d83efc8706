"""Dense 2D BEV backbones (NHWC, flax.linen).

  - BaseBEVBackbone: multi-level strided conv blocks + transpose-conv
    up-branches, concatenated (reference
    pcdet/models/backbones_2d/base_bev_backbone.py:6-112).
  - SSFA: CIA-SSD spatial-semantic feature aggregation with learned
    attention fusion, fixed 128-ch output (reference
    pcdet/models/backbones_2d/ssfa.py:15-149) — used by GLENet-C.

These are the MXU hot path: large NHWC convs XLA tiles directly onto the
systolic array.  Inputs carry a batch dim here (unlike the sparse-side
modules) because dense convs want real batching.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvBlock


class BaseBEVBackbone(nn.Module):
    layer_nums: Sequence[int]
    layer_strides: Sequence[int]
    num_filters: Sequence[int]
    upsample_strides: Sequence[int] = ()
    num_upsample_filters: Sequence[int] = ()
    axis_name: Optional[str] = None

    @property
    def num_bev_features(self):
        if self.num_upsample_filters:
            return sum(self.num_upsample_filters)
        return self.num_filters[-1]

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: (B, H, W, C) -> (B, H', W', C_out)."""
        ups = []
        for i, n_layers in enumerate(self.layer_nums):
            x = ConvBlock(self.num_filters[i], 3, self.layer_strides[i],
                          padding=1, axis_name=self.axis_name)(x, train=train)
            for _ in range(n_layers):
                x = ConvBlock(self.num_filters[i], 3, 1, padding=1,
                              axis_name=self.axis_name)(x, train=train)
            if self.upsample_strides:
                stride = self.upsample_strides[i]
                if stride >= 1:
                    up = ConvBlock(self.num_upsample_filters[i],
                                   kernel_size=stride, stride=stride,
                                   transpose=True, axis_name=self.axis_name,
                                   )(x, train=train)
                else:
                    s = int(round(1 / stride))
                    up = ConvBlock(self.num_upsample_filters[i],
                                   kernel_size=s, stride=s, padding=0,
                                   axis_name=self.axis_name)(x, train=train)
                ups.append(up)
            else:
                ups.append(x)
        out = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        return out


class SSFA(nn.Module):
    """Spatial-semantic feature aggregation (CIA-SSD / GLENet-C backbone).

    Two branches from the input: a spatial branch at full resolution and a
    semantic branch at stride 2 with 2x channels, fused by per-pixel
    sigmoid attention weights (reference ssfa.py:15-149).  Output 128 ch.
    """
    axis_name: Optional[str] = None
    num_bev_features: int = 128

    @nn.compact
    def __call__(self, x, train: bool = True):
        ax = self.axis_name
        # bottom_up_block_0: 3 convs @128, stride 1
        x0 = x
        for _ in range(3):
            x0 = ConvBlock(128, 3, 1, padding=1, axis_name=ax)(x0, train=train)
        # bottom_up_block_1: stride 2, 3 convs @256
        x1 = ConvBlock(256, 3, 2, padding=1, axis_name=ax)(x0, train=train)
        for _ in range(2):
            x1 = ConvBlock(256, 3, 1, padding=1, axis_name=ax)(x1, train=train)

        # trans_0: 1x1 on spatial branch
        x0t = ConvBlock(128, 1, 1, padding=0, axis_name=ax)(x0, train=train)
        # trans_1: 1x1 on semantic branch
        x1t = ConvBlock(256, 1, 1, padding=0, axis_name=ax)(x1, train=train)
        # deconv semantic to full res
        x1up = ConvBlock(128, 2, 2, transpose=True, axis_name=ax)(x1t, train=train)

        # conv_0 / w_0: spatial attention logits
        s = ConvBlock(128, 3, 1, padding=1, axis_name=ax)(x0t, train=train)
        w0 = ConvBlock(1, 1, 1, padding=0, use_relu=False, axis_name=ax)(s, train=train)
        # conv_1 / w_1: semantic attention logits
        t = ConvBlock(128, 3, 1, padding=1, axis_name=ax)(x1up, train=train)
        w1 = ConvBlock(1, 1, 1, padding=0, use_relu=False, axis_name=ax)(t, train=train)

        w = nn.softmax(jnp.concatenate([w0, w1], axis=-1), axis=-1)
        out = s * w[..., 0:1] + t * w[..., 1:2]
        return nn.relu(out)
