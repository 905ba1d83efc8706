"""Sparse 3D conv backbones (VoxelBackBone8x family) on the gather-GEMM
primitives in ops/sparse.py.

Structure per reference pcdet/models/backbones_3d/spconv_backbone.py:69-180
(VoxelBackBone8x) and :296-353 (VoxelBackBone8xCiassd):
  conv_input SubM(16) -> conv1 [SubM16]
  -> conv2 [SpConv s2 -> 32, n x SubM32]
  -> conv3 [SpConv s2 -> 64, n x SubM64]
  -> conv4 [SpConv s2 pad (0,1,1) -> 64, n x SubM64]
  -> conv_out SpConv (3,1,1) stride (2,1,1) -> 128 (Ciassd: 64)
then HeightCompression to BEV (z folded into channels).
The sparse z-shape is nz + 1 (reference sparse_shape = grid[::-1] + [1,0,0]).

Each resolution's submanifold neighbor table is computed once and shared by
all SubM convs at that level (the TPU analogue of spconv's indice_key reuse).
Static per-level voxel budgets cap the active-site tables.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sparse
from .layers import MaskedBatchNorm

# Compute dtype for the dense backbone levels (see DenseConvBN.mxu_dtype).
DENSE_MXU_DTYPE: 'Any | None' = jnp.bfloat16


class SubMConvBN(nn.Module):
    """Submanifold sparse conv + BN + ReLU with a precomputed neighbor table."""
    features: int
    kernel_volume: int = 27
    use_relu: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, nbr_idx, mask, train: bool = True):
        """feats (B, V, Cin), mask (B, V); nbr_idx is either a (B, K, V)
        row table (sparse.subm_neighbor_table) or an x-block (q, tbl)
        tuple (sparse.subm_xblock_table — 3x fewer random HBM rows)."""
        cin = feats.shape[-1]
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (self.kernel_volume, cin, self.features))
        if isinstance(nbr_idx, tuple):
            # batched custom-VJP variant: the row gathers run as ONE flat
            # take over the batch-merged operand (2.5x the vmapped form)
            # and backward-input runs as a flipped-tap GATHER over the
            # same table instead of an HBM scatter-add (ops/sparse.py)
            out = sparse.subm_gather_gemm_xblocks_b(
                feats, nbr_idx[0], nbr_idx[1], w)
        else:
            out = sparse.gather_gemm_b(feats, nbr_idx, w)
        out = MaskedBatchNorm(axis_name=self.axis_name)(
            out, mask=mask, use_running_average=not train)
        if self.use_relu:
            out = nn.relu(out)
        return jnp.where(mask[..., None], out, 0.0)


class SparseConvBN(nn.Module):
    """Strided sparse conv + BN + ReLU (changes the active-site table)."""
    features: int
    kernel_size: tuple
    stride: tuple
    padding: tuple
    out_cap: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, ids, mask, grid, train: bool = True):
        """Returns (out_feats, out_ids, out_mask, out_grid)."""
        cin = feats.shape[-1]
        k_vol = int(np.prod(sparse._as3(self.kernel_size)))
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (k_vol, cin, self.features))

        kz, ky, kx = sparse._as3(self.kernel_size)

        # tables per-sample (vmapped); the gather+GEMM contraction batched
        # (one flat take over the batch-merged operand — ops/sparse.py)
        if (kz, ky, kx) == (3, 3, 3):
            out_ids, out_mask = jax.vmap(
                lambda i, m: sparse.strided_output_sites(
                    i, m, grid, self.kernel_size, self.stride,
                    self.padding, self.out_cap))(ids, mask)
            q, tbl = sparse.strided_xblock_table_b(
                ids, mask, out_ids, out_mask, grid, self.stride,
                self.padding)
            out = sparse.gather_gemm_xblocks_b(feats, q, tbl, w)
        else:
            def tables(ids_s, mask_s):
                out_ids, out_mask = sparse.strided_output_sites(
                    ids_s, mask_s, grid, self.kernel_size, self.stride,
                    self.padding, self.out_cap)
                table = sparse.strided_gather_table(
                    ids_s, mask_s, out_ids, out_mask, grid,
                    self.kernel_size, self.stride, self.padding)
                return out_ids, out_mask, table

            out_ids, out_mask, table = jax.vmap(tables)(ids, mask)
            out = sparse.gather_gemm_b(feats, table, w)
        out = MaskedBatchNorm(axis_name=self.axis_name)(
            out, mask=out_mask, use_running_average=not train)
        out = nn.relu(out)
        out = jnp.where(out_mask[..., None], out, 0.0)
        ogrid = sparse.out_grid_size(grid, self.kernel_size, self.stride,
                                     self.padding)
        return out, out_ids, out_mask, ogrid


class InverseConvBN(nn.Module):
    """Inverse sparse conv + BN + ReLU: coarse-level features scattered back
    onto the fine level's pre-existing active sites (spconv
    SparseInverseConv3d with indice-key reuse, spconv_unet.py:118-131)."""
    features: int
    kernel_size: tuple
    stride: tuple
    padding: tuple
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, coarse_feats, coarse_ids, coarse_mask, fine_ids,
                 fine_mask, fine_grid, train: bool = True):
        """Returns (V_fine, C_out) features on the fine active set."""
        cin = coarse_feats.shape[-1]
        k_vol = int(np.prod(sparse._as3(self.kernel_size)))
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (k_vol, cin, self.features))

        def one(f_ids, f_mask, c_ids, c_mask):
            return sparse.inverse_gather_table(
                f_ids, f_mask, c_ids, c_mask, fine_grid,
                self.kernel_size, self.stride, self.padding)

        table = jax.vmap(one)(fine_ids, fine_mask, coarse_ids, coarse_mask)
        out = sparse.gather_gemm_b(coarse_feats, table, w)
        out = MaskedBatchNorm(axis_name=self.axis_name)(
            out, mask=fine_mask, use_running_average=not train)
        out = nn.relu(out)
        return jnp.where(fine_mask[..., None], out, 0.0)


class DenseConvBN(nn.Module):
    """Masked dense 3D conv + BN + ReLU (NDHWC) — exact submanifold/strided
    sparse-conv semantics on a densified grid (zeros at inactive sites feed
    the conv; output is re-masked by occupancy for submanifold layers).
    Used for the deep backbone levels where the grid is small enough that a
    dense MXU conv beats gather-GEMM (the gathers dominate sparse cost on
    TPU: ~100 ms/layer at V=16k vs <1 ms dense at stride-4 grids)."""
    features: int
    kernel_size: tuple = (3, 3, 3)
    stride: tuple = (1, 1, 1)
    padding: tuple = (1, 1, 1)
    submanifold: bool = True
    use_relu: bool = True
    axis_name: Optional[str] = None
    # conv compute dtype: None defers to the module-level DENSE_MXU_DTYPE
    # (bf16 inputs/weights with f32 accumulation — the MXU's native mode;
    # activations stream at half the HBM bytes and BN still runs in f32 on
    # the accumulated output).  Oracle/parity tests set DENSE_MXU_DTYPE to
    # f32 for tight tolerances, like ops.sparse.GATHER_COMPUTE_DTYPE.
    mxu_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, occ, train: bool = True):
        """x: (B, D, H, W, C); occ: (B, D, H, W) bool occupancy."""
        kz, ky, kx = sparse._as3(self.kernel_size)
        sz, sy, sx = sparse._as3(self.stride)
        pz, py, px = sparse._as3(self.padding)
        cin = x.shape[-1]
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (kz * ky * kx, cin, self.features))
        w_dense = w.reshape(kz, ky, kx, cin, self.features)
        cdt = self.mxu_dtype or DENSE_MXU_DTYPE or x.dtype
        # compute fully in bf16 (XLA accumulates f32 on the MXU) and cast
        # back up for BN; a widening preferred_element_type here makes the
        # VJP emit dtype-mismatched convs.
        # The z axis is decomposed into kz shifted 2D convs: XLA's TPU
        # lowering of genuine 3D convs measured ~3.5 TF/s on these grids
        # while the equivalent batched 2D convs ride the tuned conv2d path.
        xc = x.astype(cdt)
        wc = w_dense.astype(cdt)
        b, d, h, wd_, _ = xc.shape
        d_out = max((d + 2 * pz - kz) // sz + 1, 0)
        if pz:
            xc = jnp.pad(xc, ((0, 0), (pz, pz), (0, 0), (0, 0), (0, 0)))
        out = None
        for dz in range(kz):
            # clamped to an empty slice for degenerate d_out == 0 tiny-grid
            # cases (shapes flow through; BN params still created)
            dpad = xc.shape[1]
            start = min(dz, dpad)
            limit = min(max(dz + (d_out - 1) * sz + 1, start), dpad)
            sl = jax.lax.slice_in_dim(xc, start, limit, sz,
                                      axis=1)                  # (B,Do,H,W,C)
            sl2 = sl.reshape(b * d_out, h, wd_, cin)
            o2 = jax.lax.conv_general_dilated(
                sl2, wc[dz], window_strides=(sy, sx),
                padding=((py, py), (px, px)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            out = o2 if out is None else out + o2
        h_out, w_out = out.shape[1], out.shape[2]
        out = out.reshape(b, d_out, h_out, w_out,
                          self.features).astype(jnp.float32)
        if self.submanifold:
            new_occ = occ
        else:
            occf = occ.astype(jnp.float32)[..., None]
            occ_out = jax.lax.conv_general_dilated(
                occf, jnp.ones((kz, ky, kx, 1, 1), jnp.float32),
                window_strides=(sz, sy, sx),
                padding=((pz, pz), (py, py), (px, px)),
                dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
            new_occ = occ_out[..., 0] > 0
        out = MaskedBatchNorm(axis_name=self.axis_name)(
            out, mask=new_occ, use_running_average=not train)
        if self.use_relu:
            out = nn.relu(out)
        out = jnp.where(new_occ[..., None], out, 0.0)
        return out, new_occ


class VoxelBackBone8x(nn.Module):
    """grid_size: (nx, ny, nz) raw voxel grid; sparse z becomes nz + 1.

    Levels >= `dense_from` (1-indexed conv blocks) run as masked dense 3D
    convs; below that, gather-GEMM sparse.  Default dense_from=3: the
    stride-4 grid (e.g. 352 x 400 x 11 on KITTI) is small enough dense.
    """
    grid_size: tuple
    max_voxels: int
    subm_per_block: tuple = (2, 2, 2)   # Ciassd: (2, 3, 3); Res: 2 blocks
    out_channels: int = 128             # Ciassd: 64
    channels: tuple = (16, 32, 64, 64)  # Res: (16, 32, 64, 128)
    residual: bool = False              # VoxelResBackBone8x: SparseBasicBlock
    dense_from: int = 3
    # sorted active-site lists for the dense levels (x_conv3/4 'ids'/'mask'):
    # only VSA-style consumers need them; building them costs ~80 ms/step of
    # sort/unique work at KITTI scale, so PFE-less detectors turn them off
    site_lists: bool = True
    axis_name: Optional[str] = None

    @property
    def sparse_grid(self):
        nx, ny, nz = self.grid_size
        return (nx, ny, nz + 1)

    def level_caps(self):
        return sparse.level_caps(self.max_voxels)

    @nn.compact
    def __call__(self, feats, coords, mask, train: bool = True):
        """feats (B, V, C), coords (B, V, 3) as (z, y, x) (sorted by linear
        id within each sample — the voxelize op guarantees this), mask (B, V).

        Returns dict: bev_features (B, ny8, nx8, C_bev), multi_scale
        {x_conv1..4: (feats, ids, mask, grid)} for the RoI stack.
        """
        grid1 = self.sparse_grid
        nx, ny, nz = grid1
        ids = jnp.where(
            mask,
            coords[..., 0] * (ny * nx) + coords[..., 1] * nx + coords[..., 2],
            nx * ny * nz).astype(jnp.int32)

        c1, c2, c3, c4 = self.channels
        caps = self.level_caps()
        ms = {}

        # --- level 1: conv_input + conv1 (shared subm neighbor table) ------
        nbr1 = sparse.subm_xblock_table_b(ids, mask, grid1)
        def subm_unit(x, ch, nbr, m, name):
            """Plain subm conv-BN-ReLU, or a residual SparseBasicBlock
            (spconv_backbone.py:36-66) when self.residual."""
            if not self.residual:
                return SubMConvBN(ch, axis_name=self.axis_name,
                                  name=name)(x, nbr, m, train=train)
            h = SubMConvBN(ch, axis_name=self.axis_name,
                           name=f'{name}a')(x, nbr, m, train=train)
            h = SubMConvBN(ch, axis_name=self.axis_name, use_relu=False,
                           name=f'{name}b')(h, nbr, m, train=train)
            out = nn.relu(h + x)
            return jnp.where(m[..., None], out, 0.0)

        # remat: recompute dense-level activations in the backward instead of
        # keeping ~1 GB of f32 conv inputs alive per level (the KITTI-scale
        # train step otherwise exceeds the 16 GB v5e HBM)
        DenseRemat = nn.remat(DenseConvBN, static_argnums=(3,))

        def dense_unit(x, occ, ch, name):
            if not self.residual:
                return DenseRemat(ch, 3, 1, 1, submanifold=True,
                                  axis_name=self.axis_name,
                                  name=name)(x, occ, train)
            # residual basic block
            h, _ = DenseRemat(ch, 3, 1, 1, submanifold=True,
                              axis_name=self.axis_name,
                              name=f'{name}a')(x, occ, train)
            h, _ = DenseRemat(ch, 3, 1, 1, submanifold=True, use_relu=False,
                              axis_name=self.axis_name,
                              name=f'{name}b')(h, occ, train)
            out = nn.relu(h + x)
            return jnp.where(occ[..., None], out, 0.0), occ

        x = SubMConvBN(c1, axis_name=self.axis_name, name='conv_input')(
            feats, nbr1, mask, train=train)
        x = subm_unit(x, c1, nbr1, mask, 'conv1_0')
        if self.residual:
            x = subm_unit(x, c1, nbr1, mask, 'conv1_1')
        ms['x_conv1'] = {'kind': 'sparse', 'features': x, 'ids': ids,
                         'mask': mask, 'grid': grid1, 'stride': 1}

        # --- level 2 --------------------------------------------------------
        x, ids2, mask2, grid2 = SparseConvBN(
            c2, 3, 2, 1, out_cap=caps[1], axis_name=self.axis_name,
            name='conv2_down')(x, ids, mask, grid1, train=train)
        nbr2 = sparse.subm_xblock_table_b(ids2, mask2, grid2)
        for j in range(self.subm_per_block[0]):
            x = subm_unit(x, c2, nbr2, mask2, f'conv2_{j}')
        ms['x_conv2'] = {'kind': 'sparse', 'features': x, 'ids': ids2,
                         'mask': mask2, 'grid': grid2, 'stride': 2}

        # --- level 3: sparse downsample, then densify its stride-4 output ---
        # (a dense stride-2 conv on the scattered level-2 grid was tried and
        # measured SLOWER overall: the ~760 MB/sample zero canvas + the
        # z-shifted slice copies cost ~250 ms/step, more than the gather
        # table + row gathers they replace)
        assert self.dense_from == 3, 'only dense_from=3 currently wired'
        x, ids3, mask3, grid3 = SparseConvBN(
            c3, 3, 2, 1, out_cap=caps[2], axis_name=self.axis_name,
            name='conv3_down')(x, ids2, mask2, grid2, train=train)
        # occupancy-cumsum + monotone row-take densify: ~2x the row
        # scatter (the round-5 predict trace's largest op) and the occ
        # plane comes from the same pass; bf16 canvas feeds the bf16
        # dense convs directly
        xd, occ = sparse.to_dense_expand(
            x, ids3, mask3, grid3,
            DENSE_MXU_DTYPE if DENSE_MXU_DTYPE else None)

        for j in range(self.subm_per_block[1]):
            xd, occ = dense_unit(xd, occ, c3, f'conv3_{j}')
        # ids/mask kept alongside the dense tensors: VSA-style consumers
        # (PV-RCNN keypoint aggregation) need the active-site point list
        ms['x_conv3'] = {'kind': 'dense', 'features': xd, 'occ': occ,
                         'ids': ids3, 'mask': mask3,
                         'grid': grid3, 'stride': 4}

        # --- level 4 (dense, z padding 0) -------------------------------------
        xd, occ = DenseRemat(c4, 3, 2, (0, 1, 1), submanifold=False,
                             axis_name=self.axis_name,
                             name='conv4_down')(xd, occ, train)
        for j in range(self.subm_per_block[2]):
            xd, occ = dense_unit(xd, occ, c4, f'conv4_{j}')
        grid4 = sparse.out_grid_size(grid3, 3, 2, (0, 1, 1))
        ms['x_conv4'] = {'kind': 'dense', 'features': xd, 'occ': occ,
                         'grid': grid4, 'stride': 8}
        if self.site_lists:
            # active sites of the dense stride-8 level via the spconv
            # activation rule (same dilation conv4_down applies to occ)
            ids4, mask4 = jax.vmap(lambda i, m: sparse.strided_output_sites(
                i, m, grid3, 3, 2, (0, 1, 1), caps[3]))(ids3, mask3)
            ms['x_conv4'].update(ids=ids4, mask=mask4)

        # --- conv_out: z-compression (3,1,1) stride (2,1,1) pad 0 -----------
        xd, occ = DenseRemat(self.out_channels, (3, 1, 1), (2, 1, 1),
                             (0, 0, 0), submanifold=False,
                             axis_name=self.axis_name,
                             name='conv_out')(xd, occ, train)

        # HeightCompression: fold z into channels
        b, nz5, ny5, nx5, c = xd.shape
        bev = jnp.transpose(xd, (0, 2, 3, 1, 4)).reshape(b, ny5, nx5, nz5 * c)

        return {'bev_features': bev, 'multi_scale': ms,
                'num_bev_features': nz5 * c}


class UNetV2(nn.Module):
    """Sparse-conv U-Net (PartA2 backbone, reference spconv_unet.py:49-212):
    the VoxelBackBone8x encoder plus a decoder of UR blocks — lateral
    SparseBasicBlock, concat with the bottom-up stream, merge subm conv,
    channel_reduction residual, inverse sparse conv up one level.

    Fully sparse at every level (unlike VoxelBackBone8x's dense tail): the
    decoder needs the active-site tables of each level anyway, and the
    merged-sort lookups make the sparse path cheap.

    Outputs: bev_features (HeightCompression of the encoded conv_out
    tensor), multi_scale (x_conv1..4), and per-voxel decoder features
    (point_features/point_coords on the level-1 active set).
    """
    grid_size: tuple
    max_voxels: int
    voxel_size: tuple = (0.05, 0.05, 0.1)
    pc_range: tuple = (0, -40, -3, 70.4, 40, 1)
    channels: tuple = (16, 32, 64, 64)
    out_channels: int = 128
    axis_name: Optional[str] = None

    @property
    def sparse_grid(self):
        nx, ny, nz = self.grid_size
        return (nx, ny, nz + 1)

    @nn.compact
    def __call__(self, feats, coords, mask, train: bool = True):
        grid1 = self.sparse_grid
        nx, ny, nz = grid1
        ids1 = jnp.where(
            mask,
            coords[..., 0] * (ny * nx) + coords[..., 1] * nx + coords[..., 2],
            nx * ny * nz).astype(jnp.int32)
        c1, c2, c3, c4 = self.channels
        caps = sparse.level_caps(self.max_voxels)

        def make_nbr(ids, m, grid):
            return sparse.subm_xblock_table_b(ids, m, grid)

        def subm(x, ch, nbr, m, name, relu=True):
            return SubMConvBN(ch, use_relu=relu, axis_name=self.axis_name,
                              name=name)(x, nbr, m, train=train)

        def basic_block(x, ch, nbr, m, name):
            """SparseBasicBlock (spconv_unet.py:11-46)."""
            h = subm(x, ch, nbr, m, f'{name}_c1')
            h = subm(h, ch, nbr, m, f'{name}_c2', relu=False)
            out = nn.relu(h + x)
            return jnp.where(m[..., None], out, 0.0)

        # ---- encoder -------------------------------------------------------
        nbr1 = make_nbr(ids1, mask, grid1)
        x = subm(feats, c1, nbr1, mask, 'conv_input')
        x_conv1 = subm(x, c1, nbr1, mask, 'conv1_0')

        x, ids2, mask2, grid2 = SparseConvBN(
            c2, 3, 2, 1, out_cap=caps[1], axis_name=self.axis_name,
            name='conv2_down')(x_conv1, ids1, mask, grid1, train=train)
        nbr2 = make_nbr(ids2, mask2, grid2)
        for j in range(2):
            x = subm(x, c2, nbr2, mask2, f'conv2_{j}')
        x_conv2 = x

        x, ids3, mask3, grid3 = SparseConvBN(
            c3, 3, 2, 1, out_cap=caps[2], axis_name=self.axis_name,
            name='conv3_down')(x_conv2, ids2, mask2, grid2, train=train)
        nbr3 = make_nbr(ids3, mask3, grid3)
        for j in range(2):
            x = subm(x, c3, nbr3, mask3, f'conv3_{j}')
        x_conv3 = x

        x, ids4, mask4, grid4 = SparseConvBN(
            c4, 3, 2, (0, 1, 1), out_cap=caps[3], axis_name=self.axis_name,
            name='conv4_down')(x_conv3, ids3, mask3, grid3, train=train)
        nbr4 = make_nbr(ids4, mask4, grid4)
        for j in range(2):
            x = subm(x, c4, nbr4, mask4, f'conv4_{j}')
        x_conv4 = x

        # ---- encoded tensor for the detection head -------------------------
        xo, ids5, mask5, grid5 = SparseConvBN(
            self.out_channels, (3, 1, 1), (2, 1, 1), 0, out_cap=caps[3],
            axis_name=self.axis_name, name='conv_out')(
            x_conv4, ids4, mask4, grid4, train=train)
        dense5 = jax.vmap(lambda f, i, m: sparse.to_dense(f, i, m, grid5))(
            xo, ids5, mask5)                            # (B, D5, H5, W5, C)
        b, nz5, ny5, nx5, co = dense5.shape
        bev = jnp.transpose(dense5, (0, 2, 3, 1, 4)).reshape(
            b, ny5, nx5, nz5 * co)

        # ---- decoder (UR blocks, spconv_unet.py:137-149) --------------------
        def ur_block(lateral, bottom, ch_out, nbr, m, name,
                     inv_args=None):
            ch = lateral.shape[-1]
            trans = basic_block(lateral, ch, nbr, m, f'{name}_t')
            cat = jnp.concatenate([bottom, trans], axis=-1)
            merged = subm(cat, ch_out, nbr, m, f'{name}_m')
            n_grp = cat.shape[-1] // ch_out
            reduced = cat.reshape(*cat.shape[:-1], ch_out, n_grp).sum(-1)
            fused = merged + reduced
            if inv_args is None:                       # last level: subm conv
                return subm(fused, ch_out, nbr, m, f'{name}_inv')
            (c_ids, c_mask, f_ids, f_mask, f_grid, ks, st, pad,
             inv_ch) = inv_args
            return InverseConvBN(
                inv_ch, ks, st, pad, axis_name=self.axis_name,
                name=f'{name}_inv')(fused, c_ids, c_mask, f_ids, f_mask,
                                    f_grid, train=train)

        # reference channel flow (spconv_unet.py:113-135): m4 128->64,
        # inv4 64->64; m3 128->64, inv3 64->32; m2 64->32, inv2 32->16;
        # m1 32->16, conv5 16->16
        x_up4 = ur_block(x_conv4, x_conv4, c4, nbr4, mask4, 'up4',
                         (ids4, mask4, ids3, mask3, grid3, 3, 2, (0, 1, 1),
                          c4))
        x_up3 = ur_block(x_conv3, x_up4, c3, nbr3, mask3, 'up3',
                         (ids3, mask3, ids2, mask2, grid2, 3, 2, 1, c2))
        x_up2 = ur_block(x_conv2, x_up3, c2, nbr2, mask2, 'up2',
                         (ids2, mask2, ids1, mask, grid1, 3, 2, 1, c1))
        x_up1 = ur_block(x_conv1, x_up2, c1, nbr1, mask, 'up1', None)

        # voxel centers of the level-1 active set
        z1, y1, x1c = sparse.delinearize(jnp.where(mask, ids1, 0), grid1)
        vs = jnp.asarray(self.voxel_size, jnp.float32)
        origin = jnp.asarray(self.pc_range[:3], jnp.float32)
        centers = (jnp.stack([x1c, y1, z1], -1).astype(jnp.float32) + 0.5) \
            * vs + origin

        ms = {
            'x_conv1': {'kind': 'sparse', 'features': x_conv1, 'ids': ids1,
                        'mask': mask, 'grid': grid1, 'stride': 1},
            'x_conv2': {'kind': 'sparse', 'features': x_conv2, 'ids': ids2,
                        'mask': mask2, 'grid': grid2, 'stride': 2},
            'x_conv3': {'kind': 'sparse', 'features': x_conv3, 'ids': ids3,
                        'mask': mask3, 'grid': grid3, 'stride': 4},
            'x_conv4': {'kind': 'sparse', 'features': x_conv4, 'ids': ids4,
                        'mask': mask4, 'grid': grid4, 'stride': 8},
        }
        return {'bev_features': bev, 'multi_scale': ms,
                'num_bev_features': nz5 * co,
                'point_features': x_up1,               # (B, V, 16)
                'point_coords': centers,               # (B, V, 3)
                'point_mask': mask}


def build_backbone_3d(bb3d_cfg, grid_size, max_voxels, axis_name=None,
                      voxel_size=None, pc_range=None, site_lists=True):
    name = bb3d_cfg.NAME
    if name == 'UNetV2':
        kwargs = {}
        if voxel_size is not None:
            kwargs['voxel_size'] = tuple(voxel_size)
        if pc_range is not None:
            kwargs['pc_range'] = tuple(pc_range)
        return UNetV2(grid_size=tuple(grid_size), max_voxels=max_voxels,
                      axis_name=axis_name, **kwargs)
    if name == 'VoxelBackBone8x':
        return VoxelBackBone8x(grid_size=tuple(grid_size),
                               max_voxels=max_voxels, axis_name=axis_name,
                               site_lists=site_lists)
    if name == 'VoxelResBackBone8x':
        return VoxelBackBone8x(grid_size=tuple(grid_size),
                               max_voxels=max_voxels, residual=True,
                               channels=(16, 32, 64, 128),
                               axis_name=axis_name, site_lists=site_lists)
    if name == 'VoxelBackBone8xCiassd':
        return VoxelBackBone8x(grid_size=tuple(grid_size),
                               max_voxels=max_voxels,
                               subm_per_block=(2, 3, 3), out_channels=64,
                               axis_name=axis_name, site_lists=site_lists)
    raise NotImplementedError(name)
