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

    Exact reference topology (ssfa.py:15-149): a spatial branch at full
    resolution (3 convs @128) and a semantic branch at stride 2 (3 convs
    @256); after 1x1 trans blocks the semantic branch is deconvolved back
    (k3 s2 p1 op1) TWICE — once fused residually into the spatial branch,
    once standalone — and the two conv_{0,1} outputs are blended by
    softmax attention weights (w_{0,1}: 1x1 conv + BN, no relu; no
    activation after the blend).  Output 128 ch.

    Submodule names mirror the reference state_dict groups so
    weight_converter.convert_ssfa maps 1:1.
    """
    axis_name: Optional[str] = None
    num_bev_features: int = 128

    @nn.compact
    def __call__(self, x, train: bool = True):
        ax = self.axis_name
        # bottom_up_block_0: 3 convs @128, stride 1
        x0 = x
        for i in range(3):
            x0 = ConvBlock(128, 3, 1, padding=1, axis_name=ax,
                           name=f'bottom_up_0_{i}')(x0, train=train)
        # bottom_up_block_1: stride 2, then 2 convs @256
        x1 = ConvBlock(256, 3, 2, padding=1, axis_name=ax,
                       name='bottom_up_1_0')(x0, train=train)
        for i in (1, 2):
            x1 = ConvBlock(256, 3, 1, padding=1, axis_name=ax,
                           name=f'bottom_up_1_{i}')(x1, train=train)

        x0t = ConvBlock(128, 1, 1, padding=0, axis_name=ax,
                        name='trans_0')(x0, train=train)
        x1t = ConvBlock(256, 1, 1, padding=0, axis_name=ax,
                        name='trans_1')(x1, train=train)

        # two torch-style deconvs (k3 s2 p1 op1) from the semantic branch
        m0 = ConvBlock(128, 3, 2, padding=1, transpose=True,
                       output_padding=1, axis_name=ax,
                       name='deconv_0')(x1t, train=train) + x0t
        m1 = ConvBlock(128, 3, 2, padding=1, transpose=True,
                       output_padding=1, axis_name=ax,
                       name='deconv_1')(x1t, train=train)

        o0 = ConvBlock(128, 3, 1, padding=1, axis_name=ax,
                       name='conv_0')(m0, train=train)
        o1 = ConvBlock(128, 3, 1, padding=1, axis_name=ax,
                       name='conv_1')(m1, train=train)
        w0 = ConvBlock(1, 1, 1, padding=0, use_relu=False, axis_name=ax,
                       name='w_0')(o0, train=train)
        w1 = ConvBlock(1, 1, 1, padding=0, use_relu=False, axis_name=ax,
                       name='w_1')(o1, train=train)

        w = nn.softmax(jnp.concatenate([w0, w1], axis=-1), axis=-1)
        return o0 * w[..., 0:1] + o1 * w[..., 1:2]
