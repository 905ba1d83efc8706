"""DeepLabV3-ResNet depth-distribution network (the reference CaDDN DDN).

Mirrors torchvision's `deeplabv3_resnet50/101` topology exactly — the
reference consumes it via
/root/reference/pcdet/models/backbones_3d/vfe/image_vfe_modules/ffn/ddn/
ddn_deeplabv3.py + ddn_template.py:18-30 (constructor with
pretrained_path; features extracted from `layer1`, logits from the
DeepLabHead on layer4, bilinearly upsampled to the layer1 resolution,
ImageNet normalization when pretrained).

Topology (torchvision):
  - ResNet-{50,101} with replace_stride_with_dilation=[False, True, True]:
    conv1 7x7/2 -> bn -> relu -> maxpool 3x3/2 -> layer1 (stride 4 out)
    -> layer2 /2 -> layer3 (stride 1, dilation 2) -> layer4 (stride 1,
    dilation 4) — output stride 8;
  - DeepLabHead = ASPP(2048, rates 12/24/36) -> 3x3 conv 256 + BN + ReLU
    -> 1x1 conv num_classes;
  - ASPP = [1x1 conv, 3x3 dilated x3, global-pool branch] each 256 + BN +
    ReLU, concat -> 1x1 project 256 + BN + ReLU (+ dropout, eval no-op).

The matching torch->flax weight rule lives in
utils/weight_converter.convert_ddn_deeplabv3 and is output-equivalence
tested against a randomly initialized torch mirror of the torchvision
module (tests/test_ddn_deeplab.py) — with real torchvision checkpoints
the same state-dict names resolve.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class _BN(nn.Module):
    """Plain BatchNorm matching torch defaults (eps 1e-5)."""
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.axis_name if train else None)(x)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        ax = self.axis_name
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name='conv1')(x)
        out = _BN(ax, name='bn1')(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=self.stride,
                      padding=self.dilation,
                      kernel_dilation=(self.dilation, self.dilation),
                      use_bias=False, name='conv2')(out)
        out = _BN(ax, name='bn2')(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      name='conv3')(out)
        out = _BN(ax, name='bn3')(out, train)
        if self.has_downsample:
            sc = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                         use_bias=False, name='downsample_conv')(x)
            sc = _BN(ax, name='downsample_bn')(sc, train)
        else:
            sc = x
        return nn.relu(out + sc)


class ResNetDeepLabTrunk(nn.Module):
    """ResNet-50/101 with the DeepLabV3 dilation pattern; returns the
    layer1 (stride-4) and layer4 ('out', stride-8) feature maps."""
    blocks: Tuple[int, int, int, int] = (3, 4, 23, 3)   # ResNet101
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        ax = self.axis_name
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name='conv1')(x)
        x = _BN(ax, name='bn1')(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))

        # (planes, first-block stride, first dilation, rest dilation)
        specs = [(64, 1, 1, 1), (128, 2, 1, 1), (256, 1, 1, 2),
                 (512, 1, 2, 4)]
        feats = {}
        for li, ((planes, stride, d_first, d_rest), n) in enumerate(
                zip(specs, self.blocks), start=1):
            for bi in range(n):
                x = Bottleneck(
                    planes,
                    stride=stride if bi == 0 else 1,
                    dilation=d_first if bi == 0 else d_rest,
                    has_downsample=bi == 0,
                    axis_name=ax, name=f'layer{li}_{bi}')(x, train)
            feats[f'layer{li}'] = x
        return feats


class ASPP(nn.Module):
    rates: Sequence[int] = (12, 24, 36)
    channels: int = 256
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        ax = self.axis_name
        outs = []
        h = nn.Conv(self.channels, (1, 1), use_bias=False,
                    name='conv0')(x)
        outs.append(nn.relu(_BN(ax, name='bn0')(h, train)))
        for i, r in enumerate(self.rates, start=1):
            h = nn.Conv(self.channels, (3, 3), padding=r,
                        kernel_dilation=(r, r), use_bias=False,
                        name=f'conv{i}')(x)
            outs.append(nn.relu(_BN(ax, name=f'bn{i}')(h, train)))
        # global-pool branch (1x1 spatial -> bilinear upsample == tile)
        p = x.mean(axis=(1, 2), keepdims=True)
        p = nn.Conv(self.channels, (1, 1), use_bias=False,
                    name='conv_pool')(p)
        p = nn.relu(_BN(ax, name='bn_pool')(p, train))
        outs.append(jnp.broadcast_to(
            p, x.shape[:-1] + (self.channels,)))
        h = jnp.concatenate(outs, axis=-1)
        h = nn.Conv(self.channels, (1, 1), use_bias=False,
                    name='project')(h)
        h = nn.relu(_BN(ax, name='project_bn')(h, train))
        # torchvision has Dropout(0.5) here; identity at eval and a
        # no-op for weight conversion — omitted (training CaDDN uses the
        # config's own dropout knobs)
        return h


class DDNDeepLabV3(nn.Module):
    """features (B, H/4, W/4, 256) + depth logits (B, H/4, W/4, D+1).

    `normalize_input` applies the ImageNet mean/std preprocessing the
    reference enables when running from a pretrained checkpoint
    (ddn_template.py preprocess)."""
    num_bins: int
    blocks: Tuple[int, int, int, int] = (3, 4, 23, 3)
    normalize_input: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, images, train: bool = True):
        x = images
        if self.normalize_input:
            mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
            std = jnp.asarray(IMAGENET_STD, x.dtype)
            x = (x - mean) / std
        feats = ResNetDeepLabTrunk(self.blocks, self.axis_name,
                                   name='backbone')(x, train)
        features = feats['layer1']
        h = ASPP(axis_name=self.axis_name, name='aspp')(
            feats['layer4'], train)
        h = nn.Conv(256, (3, 3), padding=1, use_bias=False,
                    name='head_conv')(h)
        h = _BN(self.axis_name, name='head_bn')(h, train)
        h = nn.relu(h)
        logits = nn.Conv(self.num_bins + 1, (1, 1), name='head_out')(h)
        logits = jax.image.resize(
            logits,
            (logits.shape[0],) + features.shape[1:3]
            + (logits.shape[-1],),
            method='bilinear')    # align_corners=False (half-pixel)
        return features, logits
