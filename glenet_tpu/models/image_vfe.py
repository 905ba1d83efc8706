"""CaDDN camera path: ImageVFE (depth-distribution frustum features +
frustum-to-voxel sampling) and Conv2DCollapse.

Semantics per the reference (pcdet/models/backbones_3d/vfe/image_vfe.py,
image_vfe_modules/{ffn,f2v}, utils/transform_utils.py):
  - a depth-distribution network (DDN) predicts per-pixel depth-bin logits
    (D+1 classes, last = out-of-range) and an image feature map;
  - frustum features = image features x softmax depth probabilities
    (C, D, H, W) (depth_ffn.py:71-99);
  - every voxel center is projected lidar -> camera -> image
    (frustum_grid_generator.py:79-116), its metric depth converted to a
    continuous bin coordinate (transform_utils.bin_depths, UD/LID/SID),
    and the frustum volume is trilinearly sampled (zero padding outside);
  - Conv2DCollapse folds the voxel z axis into channels + 1x1 conv
    (map_to_bev/conv2d_collapse.py);
  - the DDN loss is focal over depth bins with foreground/background pixel
    balancing from projected 2D gt boxes (ddn_loss/ddn_loss.py,
    balancer.py).

Divergence (documented): the reference's DDN is a COCO-pretrained
torchvision DeepLabV3-ResNet101; no pretrained weights are downloadable in
this environment, so `DDNLite` is a from-scratch flax encoder with a
dilated tail + ASPP-lite head at the same 1/4-resolution contract.  The
config slot (FFN.DDN) is preserved.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import ConvBlock, MaskedBatchNorm


# ---------------------------------------------------------------------------
# depth discretization (transform_utils.py:56-92)
# ---------------------------------------------------------------------------

def bin_depths(depth_map, mode, depth_min, depth_max, num_bins,
               target=False):
    """Metric depth -> (continuous or integer-target) bin indices."""
    if mode == 'UD':
        bin_size = (depth_max - depth_min) / num_bins
        indices = (depth_map - depth_min) / bin_size
    elif mode == 'LID':
        bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
        indices = -0.5 + 0.5 * jnp.sqrt(
            jnp.clip(1 + 8 * (depth_map - depth_min) / bin_size, 0.0, None))
    elif mode == 'SID':
        indices = num_bins * (jnp.log(1 + depth_map) -
                              math.log(1 + depth_min)) / \
            (math.log(1 + depth_max) - math.log(1 + depth_min))
    else:
        raise NotImplementedError(mode)
    if target:
        oob = (indices < 0) | (indices > num_bins) | ~jnp.isfinite(indices)
        indices = jnp.where(oob, num_bins, indices)
        indices = jnp.floor(indices).astype(jnp.int32)
    return indices


# ---------------------------------------------------------------------------
# depth distribution network (DeepLabV3 stand-in)
# ---------------------------------------------------------------------------

class DDNLite(nn.Module):
    """Feature map (H/4, W/4, feat_ch) + depth logits (H/4, W/4, D+1)."""
    num_bins: int
    feat_ch: int = 64
    width: int = 32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, images, train: bool = True):
        ax = self.axis_name
        x = ConvBlock(self.width, 7, 2, padding=3, axis_name=ax)(
            images, train=train)                           # 1/2
        x = ConvBlock(self.width, 3, 2, padding=1, axis_name=ax)(
            x, train=train)                                # 1/4
        for _ in range(2):
            h = ConvBlock(self.width * 2, 3, 1, padding=1, axis_name=ax)(
                x, train=train)
            h = ConvBlock(self.width * 2, 3, 1, padding=1, use_relu=False,
                          axis_name=ax)(h, train=train)
            x = nn.relu(h + (x if x.shape[-1] == h.shape[-1]
                             else nn.Dense(h.shape[-1])(x)))
        feat = ConvBlock(self.feat_ch, 1, 1, padding=0, axis_name=ax)(
            x, train=train)
        # dilated tail + ASPP-lite for the depth head
        d = x
        for rate in (2, 4):
            d = nn.Conv(self.width * 2, (3, 3), padding=rate,
                        kernel_dilation=(rate, rate), use_bias=False)(d)
            d = MaskedBatchNorm(axis_name=ax)(
                d, use_running_average=not train)
            d = nn.relu(d)
        pooled = d.mean(axis=(1, 2), keepdims=True)
        pooled = jnp.broadcast_to(
            nn.Dense(self.width * 2)(pooled), d.shape[:-1] + (self.width * 2,))
        d = jnp.concatenate([d, pooled], axis=-1)
        logits = nn.Conv(self.num_bins + 1, (1, 1))(d)
        return feat, logits


# ---------------------------------------------------------------------------
# frustum -> voxel sampling
# ---------------------------------------------------------------------------

def trilinear_sample(volume, coords, gather_dtype=None, chunks=8):
    """volume (D, H, W, C); coords (N, 3) as (d, v, u) float indices.
    Zero padding outside.  Returns (N, C).

    The 8 corner gathers each materialize an (N, C) tensor; at CaDDN scale
    N = X*Y*Z ~ 2.6M voxel centers, so 8 simultaneously-live corners OOM a
    15.75 GB chip (measured: 8 x 3.21 GB padded).  Two levers bound that:
    the corners are accumulated under `lax.scan` with a *checkpointed*
    body — the backward recomputes each corner's gather from (idx, wgt)
    instead of keeping all 8 as scan residuals (the 8x3.21 GB jvp
    residuals were the measured CaDDN train-step OOM) — and N is split
    into `chunks` slices under `lax.map`, so a live gather transient is
    (N/chunks, C).  `gather_dtype=bfloat16` further halves the gather
    bytes.  Each gathered value is upcast back to the accumulator dtype
    BEFORE the weight multiply, so the only quantization is the single
    bf16 rounding of the stored value: weights stay exact f32 and
    products/sums accumulate in f32."""
    d, h, w, c = volume.shape
    n = coords.shape[0]
    cd, cv, cu = coords[:, 0], coords[:, 1], coords[:, 2]
    flat = volume.reshape(-1, c)
    padded = jnp.concatenate([flat, jnp.zeros((1, c), volume.dtype)], 0)
    if gather_dtype is not None:
        padded = padded.astype(gather_dtype)

    d0, v0, u0 = (jnp.floor(cd), jnp.floor(cv), jnp.floor(cu))
    idxs, wgts = [], []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                zi = d0 + dz
                yi = v0 + dy
                xi = u0 + dx
                wgt = ((1 - jnp.abs(cd - zi)) * (1 - jnp.abs(cv - yi))
                       * (1 - jnp.abs(cu - xi)))
                inb = ((zi >= 0) & (zi < d) & (yi >= 0) & (yi < h)
                       & (xi >= 0) & (xi < w))
                idxs.append(jnp.where(
                    inb,
                    (zi * h + yi) * w + xi, d * h * w).astype(jnp.int32))
                wgts.append(jnp.where(inb, wgt, 0.0))
    idx8 = jnp.stack(idxs)                      # (8, N) int32
    wgt8 = jnp.stack(wgts).astype(volume.dtype)  # (8, N)

    # pad N to a chunk multiple; sentinel rows gather the zero pad row
    chunks = max(1, min(int(chunks), n))
    n_pad = -n % chunks
    if n_pad:
        idx8 = jnp.concatenate(
            [idx8, jnp.full((8, n_pad), d * h * w, jnp.int32)], 1)
        wgt8 = jnp.concatenate(
            [wgt8, jnp.zeros((8, n_pad), wgt8.dtype)], 1)
    per = (n + n_pad) // chunks
    idx8 = idx8.reshape(8, chunks, per).transpose(1, 0, 2)  # (K, 8, per)
    wgt8 = wgt8.reshape(8, chunks, per).transpose(1, 0, 2)

    @jax.checkpoint
    def corner(acc, iw):
        idx, wgt = iw
        return acc + padded[idx].astype(acc.dtype) * wgt[:, None], None

    def chunk_fn(iw):
        out, _ = jax.lax.scan(
            corner, jnp.zeros((per, c), volume.dtype), iw)
        return out

    out = jax.lax.map(chunk_fn, (idx8, wgt8))   # (K, per, C)
    return out.reshape(-1, c)[:n]


def voxel_grid_centers(grid_size, pc_range):
    """(X*Y*Z, 3) lidar-frame voxel centers, x-major layout matching the
    reference's (X, Y, Z) grid (frustum_grid_generator.py:40-58)."""
    nx, ny, nz = grid_size
    pc_range = np.asarray(pc_range, np.float32)
    vs = (pc_range[3:6] - pc_range[0:3]) / np.asarray([nx, ny, nz])
    xs = pc_range[0] + (np.arange(nx) + 0.5) * vs[0]
    ys = pc_range[1] + (np.arange(ny) + 0.5) * vs[1]
    zs = pc_range[2] + (np.arange(nz) + 0.5) * vs[2]
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing='ij')    # (X, Y, Z)
    return np.stack([gx, gy, gz], axis=-1).reshape(-1, 3).astype(np.float32)


class ImageVFE(nn.Module):
    """model_cfg = cfg.MODEL.VFE (FFN + F2V sections)."""
    model_cfg: Any
    grid_size: tuple                  # (nx, ny, nz)
    pc_range: tuple
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, images, lidar_to_cam, cam_to_img, image_shape,
                 train: bool = True):
        """images (B, H, W, 3); lidar_to_cam (B, 4, 4); cam_to_img
        (B, 3, 4); image_shape (B, 2) [H, W].
        Returns dict: voxel_features (B, Z, Y, X, C), depth_logits
        (B, h, w, D+1)."""
        from flax.core import unfreeze
        from ..config import Cfg
        mcfg = Cfg(unfreeze(self.model_cfg))
        disc = mcfg.FFN.DISCRETIZE
        num_bins = int(disc['num_bins'])
        cr = mcfg.FFN.CHANNEL_REDUCE

        ddn_name = str(mcfg.FFN.DDN.get('NAME', 'DDNLite'))
        if ddn_name == 'DDNDeepLabV3':
            # reference topology (ddn_deeplabv3.py + depth_ffn.py:23-28):
            # DeepLabV3-ResNet trunk; layer1 features pass through the
            # config's CHANNEL_REDUCE BasicBlock2D
            from .ddn_deeplab import DDNDeepLabV3
            blocks = {'ResNet50': (3, 4, 6, 3),
                      'ResNet101': (3, 4, 23, 3)}[
                str(mcfg.FFN.DDN.get('BACKBONE_NAME', 'ResNet101'))]
            raw_feat, logits = DDNDeepLabV3(
                num_bins=num_bins, blocks=blocks,
                axis_name=self.axis_name, name='ddn')(images, train=train)
            feat = ConvBlock(int(cr['out_channels']),
                             int(cr.get('kernel_size', 1)),
                             int(cr.get('stride', 1)), padding=0,
                             axis_name=self.axis_name,
                             name='channel_reduce')(raw_feat, train=train)
        else:
            feat, logits = DDNLite(num_bins=num_bins,
                                   feat_ch=int(cr['out_channels']),
                                   axis_name=self.axis_name,
                                   name='ddn')(images, train=train)
        probs = jax.nn.softmax(logits, axis=-1)[..., :num_bins]
        # frustum volume (B, D, h, w, C)
        frustum = feat[:, None] * jnp.transpose(
            probs, (0, 3, 1, 2))[..., None]

        b, hs, ws = feat.shape[0], feat.shape[1], feat.shape[2]
        ds_h = images.shape[1] / hs
        ds_w = images.shape[2] / ws
        centers = jnp.asarray(voxel_grid_centers(self.grid_size,
                                                 self.pc_range))
        nx, ny, nz = self.grid_size

        def sample_one(frustum_s, l2c, c2i, ishape):
            hom = jnp.concatenate(
                [centers, jnp.ones((centers.shape[0], 1))], axis=1)
            cam = (l2c @ hom.T).T[:, :3]                   # (N, 3)
            img = (c2i @ jnp.concatenate(
                [cam, jnp.ones((cam.shape[0], 1))], axis=1).T).T
            depth = img[:, 2]
            u = img[:, 0] / jnp.clip(depth, 1e-6, None)
            v = img[:, 1] / jnp.clip(depth, 1e-6, None)
            dbin = bin_depths(depth, disc['mode'], float(disc['depth_min']),
                              float(disc['depth_max']), num_bins)
            # image px -> feature-map index; behind-camera points pushed out
            coords = jnp.stack(
                [jnp.where(depth > 0, dbin, -10.0),
                 v / ds_h - 0.5, u / ds_w - 0.5], axis=1)
            return trilinear_sample(frustum_s, coords,
                                    gather_dtype=jnp.bfloat16)   # (N, C)

        vox = jax.vmap(sample_one)(frustum, lidar_to_cam, cam_to_img,
                                   image_shape)            # (B, X*Y*Z, C)
        c = vox.shape[-1]
        vox = vox.reshape(b, nx, ny, nz, c)
        # (B, X, Y, Z, C) -> (B, Z, Y, X, C)
        vox = jnp.transpose(vox, (0, 3, 2, 1, 4))
        return {'voxel_features': vox, 'depth_logits': logits}


class Conv2DCollapse(nn.Module):
    """Fold z into channels + 1x1 conv block (conv2d_collapse.py:10-39)."""
    num_bev_features: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, voxel_features, train: bool = True):
        """(B, Z, Y, X, C) -> (B, Y, X, num_bev_features)."""
        b, z, y, x, c = voxel_features.shape
        flat = jnp.transpose(voxel_features, (0, 2, 3, 1, 4)).reshape(
            b, y, x, z * c)
        return ConvBlock(self.num_bev_features, 1, 1, padding=0,
                         axis_name=self.axis_name)(flat, train=train)


# ---------------------------------------------------------------------------
# DDN loss (ddn_loss/ddn_loss.py + balancer.py)
# ---------------------------------------------------------------------------

def ddn_loss(depth_logits, depth_maps, gt_boxes2d, gt_boxes2d_mask, disc_cfg,
             weight=3.0, alpha=0.25, gamma=2.0, fg_weight=13.0,
             bg_weight=1.0):
    """Focal cross-entropy over depth bins with fg/bg pixel balancing.

    depth_logits (B, h, w, D+1); depth_maps (B, h, w) metric;
    gt_boxes2d (B, N, 4) [x1, y1, x2, y2] at feature-map scale."""
    num_bins = depth_logits.shape[-1] - 1
    target = bin_depths(depth_maps, disc_cfg['mode'],
                        float(disc_cfg['depth_min']),
                        float(disc_cfg['depth_max']), num_bins, target=True)
    logp = jax.nn.log_softmax(depth_logits, axis=-1)
    onehot = jax.nn.one_hot(target, num_bins + 1)
    pt = (jnp.exp(logp) * onehot).sum(-1)
    ce = -(logp * onehot).sum(-1)
    focal = alpha * (1 - pt) ** gamma * ce                 # (B, h, w)

    b, h, w = focal.shape
    ys = jnp.arange(h)[None, :, None, None]
    xs = jnp.arange(w)[None, None, :, None]
    boxes = gt_boxes2d                                      # (B, N, 4)
    inside = ((xs >= boxes[:, None, None, :, 0])
              & (xs < boxes[:, None, None, :, 2])
              & (ys >= boxes[:, None, None, :, 1])
              & (ys < boxes[:, None, None, :, 3])
              & gt_boxes2d_mask[:, None, None, :])
    fg_mask = inside.any(-1)                                # (B, h, w)
    num_fg = jnp.clip(fg_mask.sum(), 1, None)
    num_bg = jnp.clip((~fg_mask).sum(), 1, None)
    fg = (focal * fg_mask).sum() / num_fg * fg_weight
    bg = (focal * ~fg_mask).sum() / num_bg * bg_weight
    return (fg + bg) / (fg_weight + bg_weight) * weight
