"""Torch (reference pcdet) -> glenet_tpu weight conversion.

Layout rules (validated by output-equivalence tests against the reference's
own torch modules loaded on CPU, tests/test_weight_converter.py):

  torch Conv2d        (O, I, kH, kW)      -> flax Conv      (kH, kW, I, O)
  torch ConvTranspose2d (I, O, kH, kW)    -> flax ConvTranspose
                                              (kH, kW, O, I) with spatial
                                              flip (flax computes the
                                              gradient-style transpose)
  torch Linear        (O, I)              -> flax Dense     (I, O)
  torch BatchNorm     weight/bias/running_mean/running_var
                      -> params {scale, bias} + batch_stats {mean, var}
  spconv SubMConv3d / SparseConv3d:
      spconv 2.x weight (O, kz, ky, kx, I) -> ours (K=kz*ky*kx row-major,
                                                    I, O)
      spconv 1.x weight (kz, ky, kx, I, O) -> ours (K, I, O)
      (the reference itself transposes between these layouts at checkpoint
       load, detector3d_template.py:366-395)

Component converters return (params_subtree, batch_stats_subtree) matching
our flax module naming; `merge_into` grafts them into a full variables
pytree.  No pretrained GLENet checkpoints are distributable in this
environment (Google Drive links, zero egress), so the end-to-end proof is
output equivalence on randomly-initialized reference modules — the same
rules apply verbatim to real checkpoints.
"""
from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# leaf transforms
# ---------------------------------------------------------------------------

def t2f_conv(w):
    """torch Conv2d (O, I, kH, kW) -> flax (kH, kW, I, O)."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def t2f_conv_transpose(w):
    """torch ConvTranspose2d (I, O, kH, kW) -> flax ConvTranspose
    (kH, kW, I, O): flax correlates with the kernel on the *output* side,
    which equals torch's transposed conv with spatially flipped taps."""
    w = np.asarray(w)
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


def t2f_linear(w):
    """torch Linear (O, I) -> flax Dense (I, O)."""
    return np.transpose(np.asarray(w), (1, 0))


def t2f_bn(sd, prefix):
    """BatchNorm params + running stats."""
    return ({'scale': np.asarray(sd[f'{prefix}.weight']),
             'bias': np.asarray(sd[f'{prefix}.bias'])},
            {'mean': np.asarray(sd[f'{prefix}.running_mean']),
             'var': np.asarray(sd[f'{prefix}.running_var'])})


def t2f_spconv(w):
    """spconv 3D conv weight -> ours (K, I, O), K row-major (dz, dy, dx).

    Accepts spconv 2.x (O, kz, ky, kx, I) or 1.x (kz, ky, kx, I, O); the
    two are distinguished the way the reference does it: by which end of
    the shape carries the spatial dims (detector3d_template.py:366-395).
    """
    w = np.asarray(w)
    assert w.ndim == 5
    # spconv1: spatial first (kz, ky, kx, I, O); spconv2: (O, kz, ky, kx, I)
    if w.shape[0] <= 3 and w.shape[1] <= 3 and w.shape[2] <= 3:
        kz, ky, kx, ci, co = w.shape
        return w.reshape(kz * ky * kx, ci, co)
    co, kz, ky, kx, ci = w.shape
    w = np.transpose(w, (1, 2, 3, 4, 0))       # (kz, ky, kx, I, O)
    return w.reshape(kz * ky * kx, ci, co)


# ---------------------------------------------------------------------------
# component converters (params naming mirrors our flax modules)
# ---------------------------------------------------------------------------

def _conv_block(sd, conv_key, bn_key, transpose=False):
    """-> ConvBlock variables: params {Conv_0: {kernel}, MaskedBatchNorm_0},
    batch_stats {MaskedBatchNorm_0}."""
    w = sd[conv_key]
    kernel = t2f_conv_transpose(w) if transpose else t2f_conv(w)
    bn_p, bn_s = t2f_bn(sd, bn_key)
    conv_name = 'ConvTranspose_0' if transpose else 'Conv_0'
    return ({conv_name: {'kernel': kernel}, 'MaskedBatchNorm_0': bn_p},
            {'MaskedBatchNorm_0': bn_s})


def height_compression_perm(sd, bev_in_key, prefix='backbone_3d.'):
    """Input-channel permutation for the first BEV conv after
    HeightCompression, or None when no sparse conv_out precedes it.

    The reference folds z into channels C-outer (`dense()` gives
    (N, C, D, H, W), then `view(N, C*D, H, W)` — height_compression.py:
    20-23, channel index c*D + d), while our backbone folds z-outer
    (spconv_backbone.py bev reshape, channel index d*C + c).  Reference
    BEV weights must therefore have their input channels remapped:
    our channel (d, c) reads reference channel c*D + d.
    """
    w_out = sd.get(f'{prefix}conv_out.0.weight')
    if w_out is None or bev_in_key not in sd:
        return None
    w_out = np.asarray(w_out)
    # conv_out channels: spconv2 (O, kz, ky, kx, I) or spconv1 (...,I,O)
    c = w_out.shape[0] if w_out.shape[1] <= 3 else w_out.shape[-1]
    total = np.asarray(sd[bev_in_key]).shape[1]
    d = total // c
    if d * c != total or d == 1:
        return None
    idx = np.arange(total)
    return (idx % c) * d + (idx // c)


def convert_base_bev_backbone(sd, layer_nums, upsample=True, prefix='',
                              in_perm=None):
    """Reference BaseBEVBackbone state_dict -> our module subtree.

    Reference naming (base_bev_backbone.py:31-70): blocks.{i} is a
    Sequential [ZeroPad, Conv, BN, ReLU, (Conv, BN, ReLU) x layer_nums[i]],
    deblocks.{i} is [ConvTranspose|Conv, BN, ReLU].  Ours: a flat sequence
    of ConvBlock_{k} in call order (downsample, n convs, up) per level.
    `in_perm` remaps the first conv's input channels (HeightCompression
    z-fold order, see height_compression_perm).
    """
    params, stats = {}, {}
    k = 0
    for i, n in enumerate(layer_nums):
        # downsample conv: seq idx 1 (after ZeroPad2d), BN at 2
        p, s = _conv_block(sd, f'{prefix}blocks.{i}.1.weight',
                           f'{prefix}blocks.{i}.2')
        if i == 0 and in_perm is not None:
            p['Conv_0']['kernel'] = p['Conv_0']['kernel'][:, :, in_perm, :]
        params[f'ConvBlock_{k}'] = p
        stats[f'ConvBlock_{k}'] = s
        k += 1
        for j in range(n):
            base = 4 + 3 * j
            p, s = _conv_block(sd, f'{prefix}blocks.{i}.{base}.weight',
                               f'{prefix}blocks.{i}.{base + 1}')
            params[f'ConvBlock_{k}'] = p
            stats[f'ConvBlock_{k}'] = s
            k += 1
        if upsample:
            w = sd[f'{prefix}deblocks.{i}.0.weight']
            transpose = True  # KITTI configs use stride >= 1 deconvs
            p, s = _conv_block(sd, f'{prefix}deblocks.{i}.0.weight',
                               f'{prefix}deblocks.{i}.1',
                               transpose=transpose)
            params[f'ConvBlock_{k}'] = p
            stats[f'ConvBlock_{k}'] = s
            k += 1
    return params, stats


def convert_anchor_head_single(sd, prefix=''):
    """AnchorHeadSingle 1x1 convs (anchor_head_single.py:17-39) -> ours
    (conv named cls/box/dir_cls via _conv1x1 name=...)."""
    def conv1x1(name):
        return {'kernel': t2f_conv(sd[f'{prefix}{name}.weight']),
                'bias': np.asarray(sd[f'{prefix}{name}.bias'])}
    params = {'conv_cls': conv1x1('conv_cls'),
              'conv_box': conv1x1('conv_box')}
    if f'{prefix}conv_dir_cls.weight' in sd:
        params['conv_dir_cls'] = conv1x1('conv_dir_cls')
    return params, {}


def convert_pfn_layer(sd, prefix='', flax_idx=0):
    """PillarVFE PFNLayer (pillar_vfe.py:7-41): Linear + BatchNorm1d."""
    p = {'Dense_0': {'kernel': t2f_linear(sd[f'{prefix}linear.weight'])}}
    if f'{prefix}linear.bias' in sd:
        p['Dense_0']['bias'] = np.asarray(sd[f'{prefix}linear.bias'])
    bn_p, bn_s = t2f_bn(sd, f'{prefix}norm')
    p['MaskedBatchNorm_0'] = bn_p
    return p, {'MaskedBatchNorm_0': bn_s}


def convert_ddn_deeplabv3(sd, blocks=(3, 4, 23, 3), prefix=''):
    """torchvision deeplabv3_resnet{50,101} state dict -> our
    models/ddn_deeplab.DDNDeepLabV3 variables.

    Source names are torchvision's (the reference loads them via
    ddn_template.py:18-30 with `pretrained_path`): backbone.conv1/bn1,
    backbone.layer{L}.{B}.conv{1..3}/bn{1..3}/downsample.{0,1}, and the
    DeepLabHead at classifier.0 (ASPP: convs.0..3 conv+bn, convs.4
    pool-branch, project) / classifier.1-2 (3x3 conv + bn) /
    classifier.4 (final 1x1 with bias).  Output equivalence vs a
    randomly initialized torch mirror: tests/test_ddn_deeplab.py.
    Returns (params, batch_stats).
    """
    def bn(dst_p, dst_s, name, key):
        bn_p, bn_s = t2f_bn(sd, key)
        dst_p[name] = {'BatchNorm_0': bn_p}
        dst_s[name] = {'BatchNorm_0': bn_s}

    bb_p, bb_s = {}, {}
    bb_p['conv1'] = {'kernel': t2f_conv(sd[f'{prefix}backbone.conv1.weight'])}
    bn(bb_p, bb_s, 'bn1', f'{prefix}backbone.bn1')
    for li, n in enumerate(blocks, start=1):
        for bi in range(n):
            src = f'{prefix}backbone.layer{li}.{bi}'
            blk_p, blk_s = {}, {}
            for ci in (1, 2, 3):
                blk_p[f'conv{ci}'] = {
                    'kernel': t2f_conv(sd[f'{src}.conv{ci}.weight'])}
                bn(blk_p, blk_s, f'bn{ci}', f'{src}.bn{ci}')
            if bi == 0:
                blk_p['downsample_conv'] = {
                    'kernel': t2f_conv(sd[f'{src}.downsample.0.weight'])}
                bn(blk_p, blk_s, 'downsample_bn', f'{src}.downsample.1')
            bb_p[f'layer{li}_{bi}'] = blk_p
            bb_s[f'layer{li}_{bi}'] = blk_s

    aspp_p, aspp_s = {}, {}
    for i in range(4):
        aspp_p[f'conv{i}'] = {'kernel': t2f_conv(
            sd[f'{prefix}classifier.0.convs.{i}.0.weight'])}
        bn(aspp_p, aspp_s, f'bn{i}', f'{prefix}classifier.0.convs.{i}.1')
    aspp_p['conv_pool'] = {'kernel': t2f_conv(
        sd[f'{prefix}classifier.0.convs.4.1.weight'])}
    bn(aspp_p, aspp_s, 'bn_pool', f'{prefix}classifier.0.convs.4.2')
    aspp_p['project'] = {'kernel': t2f_conv(
        sd[f'{prefix}classifier.0.project.0.weight'])}
    bn(aspp_p, aspp_s, 'project_bn', f'{prefix}classifier.0.project.1')

    params = {'backbone': bb_p, 'aspp': aspp_p,
              'head_conv': {'kernel': t2f_conv(
                  sd[f'{prefix}classifier.1.weight'])},
              'head_out': {'kernel': t2f_conv(
                  sd[f'{prefix}classifier.4.weight']),
                  'bias': np.asarray(sd[f'{prefix}classifier.4.bias'])}}
    stats = {'backbone': bb_s, 'aspp': aspp_s}
    hb_p, hb_s = {}, {}
    bn(hb_p, hb_s, 'head_bn', f'{prefix}classifier.2')
    params['head_bn'] = hb_p['head_bn']
    stats['head_bn'] = hb_s['head_bn']
    return params, stats


def convert_fc_stack(sd, prefix, n_layers, our_name, with_final=None):
    """RoIHeadTemplate.make_fc_layers Sequential [Conv1d, BN, ReLU]*n +
    final Conv1d -> our fc_stack Dense_{name}_{i} + final Dense."""
    params, stats = {}, {}
    seq = 0
    for i in range(n_layers):
        w = np.asarray(sd[f'{prefix}.{seq}.weight'])   # (O, I, 1) conv1d
        params[f'{our_name}_{i}'] = {'kernel': t2f_linear(w[:, :, 0])}
        bn_p, bn_s = t2f_bn(sd, f'{prefix}.{seq + 1}')
        params[f'{our_name}_bn{i}'] = bn_p
        stats[f'{our_name}_bn{i}'] = bn_s
        seq += 3
    if with_final is not None:
        w = np.asarray(sd[f'{prefix}.{seq}.weight'])
        params[with_final] = {
            'kernel': t2f_linear(w[:, :, 0]),
            'bias': np.asarray(sd[f'{prefix}.{seq}.bias'])}
    return params, stats


def convert_voxel_query_pool(sd, prefix):
    """One NeighborVoxelSAModuleMSG (voxel_pool_modules.py:30-54) ->
    our VoxelQueryPool: mlps_in.0 (Conv1d+BN1d), mlps_pos.0 (Conv2d 1x1
    + BN2d), mlps_out.0 (Conv1d+BN1d)."""
    def lin_of_conv(key):
        w = np.asarray(sd[key])          # (O, I, 1) or (O, I, 1, 1)
        return t2f_linear(w.reshape(w.shape[0], w.shape[1]))

    params, stats = {}, {}
    for tname, ours in (('mlps_in', 'in'), ('mlps_pos', 'pos'),
                        ('mlps_out', 'out')):
        params[f'mlp_{ours}'] = {
            'kernel': lin_of_conv(f'{prefix}{tname}.0.0.weight')}
        bn_p, bn_s = t2f_bn(sd, f'{prefix}{tname}.0.1')
        params[f'bn_{ours}'] = bn_p
        stats[f'bn_{ours}'] = bn_s
    return params, stats


def _torch_seq_fc(sd, prefix, our_name):
    """Walk a reference make-fc Sequential (Linear/BN1d/ReLU[/Dropout])
    by probing indices; emits our Dense {our_name}_{i} + BN
    {our_name}_bn{i} pairs."""
    params, stats = {}, {}
    i = 0
    seq = 0
    while f'{prefix}.{seq}.weight' in sd or \
            f'{prefix}.{seq + 1}.weight' in sd:
        if f'{prefix}.{seq}.weight' not in sd:   # skip a Dropout slot
            seq += 1
            continue
        params[f'{our_name}_{i}'] = {
            'kernel': t2f_linear(sd[f'{prefix}.{seq}.weight'])}
        bn_p, bn_s = t2f_bn(sd, f'{prefix}.{seq + 1}')
        params[f'{our_name}_bn{i}'] = bn_p
        stats[f'{our_name}_bn{i}'] = bn_s
        i += 1
        seq += 3                                  # Linear, BN, ReLU
    return params, stats


def convert_voxelrcnn_kl_head(sd, features_source, prefix='roi_head.'):
    """Reference VoxelRCNNKLLabelIoUHead (voxelrcnn_kl_label_iou_head.py
    :14-73 + voxelrcnn_head.py:14-95) -> our VoxelRCNNHead in
    POOL_MODE='voxel_query': pool layers (by FEATURES_SOURCE order),
    shared/cls/reg FC stacks, cls/reg prediction heads, and the
    variance branch (reg_std + BN-ReLU-FC-BN-ReLU-FC confidence MLP).
    Returns (params, batch_stats)."""
    def dense(key, bias=True):
        d = {'kernel': t2f_linear(sd[f'{key}.weight'])}
        if bias and f'{key}.bias' in sd:
            d['bias'] = np.asarray(sd[f'{key}.bias'])
        return d

    params, stats = {}, {}
    for k, src in enumerate(features_source):
        p, s = convert_voxel_query_pool(
            sd, f'{prefix}roi_grid_pool_layers.{k}.')
        params[f'pool_{src}'] = p
        stats[f'pool_{src}'] = s
    for tname, ours in (('shared_fc_layer', 'shared'),
                        ('cls_fc_layers', 'cls_fc'),
                        ('reg_fc_layers', 'reg_fc')):
        p, s = _torch_seq_fc(sd, f'{prefix}{tname}', ours)
        params.update(p)
        stats.update(s)
    params['cls_pred'] = dense(f'{prefix}cls_pred_layer')
    params['reg_pred'] = dense(f'{prefix}reg_pred_layer')
    if f'{prefix}reg_std_layer.weight' in sd:
        params['reg_std'] = dense(f'{prefix}reg_std_layer')
        bn_p, bn_s = t2f_bn(sd, f'{prefix}reg_std_bn')
        params['std_bn0'] = bn_p
        stats['std_bn0'] = bn_s
        params['std_fc1'] = dense(f'{prefix}reg_std_fc1')
        bn_p, bn_s = t2f_bn(sd, f'{prefix}reg_std_bn1')
        params['std_bn1'] = bn_p
        stats['std_bn1'] = bn_s
        params['std_fc2'] = dense(f'{prefix}reg_std_fc2')
    return params, stats


def merge_into(variables, path, params_sub, stats_sub):
    """Graft converted subtrees into a full flax variables dict (returns a
    new dict; `path` is a tuple of module names from the root)."""
    import copy
    out = {'params': copy.deepcopy(dict(variables['params'])),
           **{k: copy.deepcopy(dict(v)) for k, v in variables.items()
              if k != 'params'}}

    def set_path(tree, path, sub):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = _merge(node.get(path[-1], {}), sub)

    def _merge(dst, src):
        if not isinstance(dst, dict):
            return src
        dst = dict(dst)
        for k, v in src.items():
            dst[k] = _merge(dst.get(k, {}), v) if isinstance(v, dict) else v
        return dst

    set_path(out['params'], path, params_sub)
    if stats_sub:
        out.setdefault('batch_stats', {})
        set_path(out['batch_stats'], path, stats_sub)
    return out


# ---------------------------------------------------------------------------
# full-model conversion (SECOND family)
# ---------------------------------------------------------------------------

def convert_voxel_backbone_8x(sd, prefix='backbone_3d.',
                              subm_per_block=(2, 2, 2), residual=False):
    """Reference VoxelBackBone8x-family state_dict -> our module subtree.

    Layouts (spconv_backbone.py):
      - VoxelBackBone8x (:69-127): conv_input + conv1 (1 subm block) +
        conv2..4 (strided + `subm_per_block` subm blocks) + conv_out;
        keys conv{L}.{block}.{0=conv,1=bn} after Sequential nesting.
      - VoxelBackBone8xCiassd (:296-353): same with subm_per_block=(2,3,3).
      - VoxelResBackBone8x (:183-280, residual=True): conv1 = 2
        SparseBasicBlocks; conv2..4 = strided + 2 SparseBasicBlocks; each
        basic block has conv1/bn1/conv2/bn2 -> our '{name}a'/'{name}b'.
    """
    def unit(conv_key, bn_key):
        bn_p, bn_s = t2f_bn(sd, bn_key)
        return ({'kernel': t2f_spconv(sd[conv_key]),
                 'MaskedBatchNorm_0': bn_p},
                {'MaskedBatchNorm_0': bn_s})

    params, stats = {}, {}

    def put(ours, conv_key, bn_key):
        params[ours], stats[ours] = unit(prefix + conv_key, prefix + bn_key)

    def put_basic_block(ours, ref):
        """SparseBasicBlock `ref` -> '{ours}a' + '{ours}b'."""
        put(f'{ours}a', f'{ref}.conv1.weight', f'{ref}.bn1')
        put(f'{ours}b', f'{ref}.conv2.weight', f'{ref}.bn2')

    put('conv_input', 'conv_input.0.weight', 'conv_input.1')
    if residual:
        put_basic_block('conv1_0', 'conv1.0')
        put_basic_block('conv1_1', 'conv1.1')
    else:
        put('conv1_0', 'conv1.0.0.weight', 'conv1.0.1')
    for li, lvl in enumerate((2, 3, 4)):
        put(f'conv{lvl}_down', f'conv{lvl}.0.0.weight', f'conv{lvl}.0.1')
        n_subm = 2 if residual else subm_per_block[li]
        for j in range(n_subm):
            if residual:
                put_basic_block(f'conv{lvl}_{j}', f'conv{lvl}.{j + 1}')
            else:
                put(f'conv{lvl}_{j}', f'conv{lvl}.{j + 1}.0.weight',
                    f'conv{lvl}.{j + 1}.1')
    put('conv_out', 'conv_out.0.weight', 'conv_out.1')
    return params, stats


def convert_ssfa(sd, prefix='backbone_2d.', in_perm=None):
    """Reference SSFA state_dict (ssfa.py:15-149) -> our SSFA subtree
    (bev_backbone.SSFA named submodules).  bottom_up_block_0 leads with a
    ZeroPad2d so its convs sit at Sequential indices 1,4,7; every other
    block is [Conv|ConvTranspose, BN, (ReLU)] from index 0.  `in_perm`
    remaps the first conv's input channels (height_compression_perm)."""
    params, stats = {}, {}

    def put(ours, conv_key, bn_key, transpose=False):
        p, s = _conv_block(sd, prefix + conv_key, prefix + bn_key,
                           transpose=transpose)
        if transpose:
            # torch-style (k3 s2 p1 op1) deconv path stores the kernel at
            # the ConvBlock level (layers.ConvBlock output_padding branch)
            p = {'kernel': p['ConvTranspose_0']['kernel'],
                 'MaskedBatchNorm_0': p['MaskedBatchNorm_0']}
        params[ours] = p
        stats[ours] = s

    for i in range(3):
        put(f'bottom_up_0_{i}', f'bottom_up_block_0.{1 + 3 * i}.weight',
            f'bottom_up_block_0.{2 + 3 * i}')
        put(f'bottom_up_1_{i}', f'bottom_up_block_1.{3 * i}.weight',
            f'bottom_up_block_1.{3 * i + 1}')
    for name in ('trans_0', 'trans_1', 'conv_0', 'conv_1', 'w_0', 'w_1'):
        put(name, f'{name}.0.weight', f'{name}.1')
    for i in (0, 1):
        put(f'deconv_{i}', f'deconv_block_{i}.0.weight',
            f'deconv_block_{i}.1', transpose=True)
    if in_perm is not None:
        k = params['bottom_up_0_0']['Conv_0']['kernel']
        params['bottom_up_0_0']['Conv_0']['kernel'] = k[:, :, in_perm, :]
    return params, stats


def convert_center_head(sd, prefix='dense_head.'):
    """Reference CenterHead (center_head.py:73-92 shared_conv +
    SeparateHead branches, num_conv=2, single head group) -> our
    center_head.CenterHead subtree."""
    params, stats = {}, {}
    params['Conv_0'] = {
        'kernel': t2f_conv(sd[f'{prefix}shared_conv.0.weight'])}
    if f'{prefix}shared_conv.0.bias' in sd:
        params['Conv_0']['bias'] = np.asarray(
            sd[f'{prefix}shared_conv.0.bias'])
    bn_p, bn_s = t2f_bn(sd, f'{prefix}shared_conv.1')
    params['MaskedBatchNorm_0'] = bn_p
    stats['MaskedBatchNorm_0'] = bn_s

    for name in ('hm', 'center', 'center_z', 'dim', 'rot'):
        base = f'{prefix}heads_list.0.{name}'
        params[f'{name}_0'] = {
            'kernel': t2f_conv(sd[f'{base}.0.0.weight'])}
        if f'{base}.0.0.bias' in sd:
            params[f'{name}_0']['bias'] = np.asarray(sd[f'{base}.0.0.bias'])
        bn_p, bn_s = t2f_bn(sd, f'{base}.0.1')
        params[f'{name}_bn0'] = bn_p
        stats[f'{name}_bn0'] = bn_s
        params[f'{name}_1'] = {
            'kernel': t2f_conv(sd[f'{base}.1.weight']),
            'bias': np.asarray(sd[f'{base}.1.bias'])}
    return params, stats


def convert_anchor_head(sd, prefix='dense_head.'):
    """AnchorHeadSingle + KL-family variance branch (anchor_head_single.py
    :17-39, anchor_head_kl_label.py:29-31 conv_box_std) + IoU branch
    (anchor_head_kl_label.py:263 conv_iou, GLENet-C / SECOND-IoU)."""
    params, _ = convert_anchor_head_single(sd, prefix=prefix)
    for extra in ('conv_box_std', 'conv_iou'):
        if f'{prefix}{extra}.weight' in sd:
            params[extra] = {
                'kernel': t2f_conv(sd[f'{prefix}{extra}.weight']),
                'bias': np.asarray(sd[f'{prefix}{extra}.bias'])}
    return params, {}


def _tracked(state_dict):
    """Wrap a state_dict so key consumption is recorded (for the
    conversion report's `unconsumed` list)."""
    sd = {k: v for k, v in state_dict.items()}
    consumed = set()

    class Tracking(dict):
        def __getitem__(self, k):
            consumed.add(k)
            return sd[k]

        def __contains__(self, k):
            return k in sd

    return Tracking(), sd, consumed


def _finish_report(report, sd, consumed):
    report['unconsumed'] = sorted(
        k for k in sd
        if k not in consumed and 'num_batches_tracked' not in k)
    return report


def convert_second_family(cfg, state_dict, variables):
    """Full-model torch->flax conversion for the SECOND family
    (SECONDNet / GLENet-S: MeanVFE + VoxelBackBone8x + HeightCompression +
    BaseBEVBackbone + AnchorHead{Single,KL*}).

    The GLENet-VR roi stack is intentionally NOT convertible: its RoI
    pooling is the corner-aggregation TPU redesign whose parameters have
    no reference counterpart (roi_heads.py docstring).

    Returns (variables, report) where report lists converted leaf paths
    and reference keys that were not consumed (buffers like global_step
    and anchor tensors are expected leftovers)."""
    tsd, sd, consumed = _tracked(state_dict)
    merged = variables
    report = {'converted': []}

    bb3d_p, bb3d_s = convert_voxel_backbone_8x(tsd)
    merged = merge_into(merged, ('backbone_3d',), bb3d_p, bb3d_s)
    report['converted'].append('backbone_3d')

    layer_nums = list(cfg.MODEL.BACKBONE_2D.LAYER_NUMS)
    bb2d_p, bb2d_s = convert_base_bev_backbone(
        tsd, layer_nums, upsample=True, prefix='backbone_2d.',
        in_perm=height_compression_perm(sd, 'backbone_2d.blocks.0.1.weight'))
    merged = merge_into(merged, ('backbone_2d',), bb2d_p, bb2d_s)
    report['converted'].append('backbone_2d')

    dh_p, dh_s = convert_anchor_head(tsd)
    merged = merge_into(merged, ('dense_head',), dh_p, dh_s)
    report['converted'].append('dense_head')

    # ---- roi head (voxel-query mode only; see docstring) -------------------
    roi_cfg = cfg.MODEL.get('ROI_HEAD', None)
    if (roi_cfg is not None
            and str(roi_cfg.get('ROI_GRID_POOL', {}).get(
                'POOL_MODE', 'corner')) == 'voxel_query'
            and 'roi_head.shared_fc_layer.0.weight' in sd):
        rh_p, rh_s = convert_voxelrcnn_kl_head(
            tsd, list(roi_cfg.ROI_GRID_POOL.FEATURES_SOURCE))
        merged = merge_into(merged, ('roi_head',), rh_p, rh_s)
        report['converted'].append('roi_head')

    return merged, _finish_report(report, sd, consumed)


def convert_pointpillar_family(cfg, state_dict, variables):
    """Full-model conversion for PointPillars (PillarVFE +
    PointPillarScatter + BaseBEVBackbone + AnchorHeadSingle/KL*).
    Reference VFE naming: vfe.pfn_layers.{i}.{linear,norm}
    (pillar_vfe.py:7-41)."""
    tsd, sd, consumed = _tracked(state_dict)
    merged = variables
    report = {'converted': []}

    vfe_p, vfe_s = {}, {}
    i = 0
    while f'vfe.pfn_layers.{i}.linear.weight' in sd:
        p, s = convert_pfn_layer(tsd, prefix=f'vfe.pfn_layers.{i}.')
        vfe_p[f'PFNLayer_{i}'] = p
        vfe_s[f'PFNLayer_{i}'] = s
        i += 1
    assert i > 0, 'no vfe.pfn_layers.* keys found'
    merged = merge_into(merged, ('vfe',), vfe_p, vfe_s)
    report['converted'].append('vfe')

    layer_nums = list(cfg.MODEL.BACKBONE_2D.LAYER_NUMS)
    bb2d_p, bb2d_s = convert_base_bev_backbone(
        tsd, layer_nums, upsample=True, prefix='backbone_2d.')
    merged = merge_into(merged, ('backbone_2d',), bb2d_p, bb2d_s)
    report['converted'].append('backbone_2d')

    dh_p, dh_s = convert_anchor_head(tsd)
    merged = merge_into(merged, ('dense_head',), dh_p, dh_s)
    report['converted'].append('dense_head')

    # ---- roi head (voxel-query mode only; see docstring) -------------------
    roi_cfg = cfg.MODEL.get('ROI_HEAD', None)
    if (roi_cfg is not None
            and str(roi_cfg.get('ROI_GRID_POOL', {}).get(
                'POOL_MODE', 'corner')) == 'voxel_query'
            and 'roi_head.shared_fc_layer.0.weight' in sd):
        rh_p, rh_s = convert_voxelrcnn_kl_head(
            tsd, list(roi_cfg.ROI_GRID_POOL.FEATURES_SOURCE))
        merged = merge_into(merged, ('roi_head',), rh_p, rh_s)
        report['converted'].append('roi_head')

    return merged, _finish_report(report, sd, consumed)


_BB3D_VARIANTS = {
    # name -> (subm_per_block, residual)
    'VoxelBackBone8x': ((2, 2, 2), False),
    'VoxelBackBone8xCiassd': ((2, 3, 3), False),
    'VoxelResBackBone8x': ((2, 2, 2), True),
}


def convert_full_model(cfg, state_dict, variables):
    """Compositional full-model torch->flax conversion.

    Converts every slot with a 1:1 parameterization: VFE (PillarVFE /
    MeanVFE), BACKBONE_3D (VoxelBackBone8x / Ciassd / Res variants),
    BACKBONE_2D (BaseBEVBackbone / SSFA), DENSE_HEAD (AnchorHeadSingle /
    KL / KL-IoU families, CenterHead).  Covers PointPillars, the SECOND
    family (incl. GLENet-S), GLENet-C, SECOND-IoU and CenterPoint.

    RoI-head policy (see also MIGRATION.md): with
    ROI_GRID_POOL.POOL_MODE == 'voxel_query' (configs/kitti_models/
    GLENet_VR_vq.yaml) the VoxelRCNN-family second stage converts
    EXACTLY (convert_voxelrcnn_kl_head: pool layers + FC tails +
    variance branch).  In the default corner-aggregation mode the roi
    head is NOT converted — its pooling MLPs parameterize a different
    function than the reference's NeighborVoxelSAModuleMSG; converted
    checkpoints then initialize stage 1 exactly, leave stage 2 at init,
    and the measured recovery recipe (MIGRATION.md) fine-tunes it.  The
    unconsumed roi-head keys are listed in the report.
    """
    vfe = cfg.MODEL.VFE.NAME
    bb3d_name = cfg.MODEL.get('BACKBONE_3D', {}).get('NAME')
    bb2d_name = cfg.MODEL.get('BACKBONE_2D', {}).get('NAME')
    head_name = cfg.MODEL.DENSE_HEAD.NAME

    tsd, sd, consumed = _tracked(state_dict)
    merged = variables
    report = {'converted': []}

    # ---- VFE ---------------------------------------------------------------
    if vfe == 'PillarVFE':
        vfe_p, vfe_s = {}, {}
        i = 0
        while f'vfe.pfn_layers.{i}.linear.weight' in sd:
            p, s = convert_pfn_layer(tsd, prefix=f'vfe.pfn_layers.{i}.')
            vfe_p[f'PFNLayer_{i}'] = p
            vfe_s[f'PFNLayer_{i}'] = s
            i += 1
        assert i > 0, 'no vfe.pfn_layers.* keys found'
        merged = merge_into(merged, ('vfe',), vfe_p, vfe_s)
        report['converted'].append('vfe')
    elif vfe not in ('MeanVFE', 'DynMeanVFE', 'DynamicMeanVFE'):
        raise NotImplementedError(f'no VFE conversion for {vfe}')

    # ---- 3D backbone -------------------------------------------------------
    if bb3d_name is not None:
        if bb3d_name not in _BB3D_VARIANTS:
            raise NotImplementedError(
                f'no BACKBONE_3D conversion for {bb3d_name}')
        subm, residual = _BB3D_VARIANTS[bb3d_name]
        bb3d_p, bb3d_s = convert_voxel_backbone_8x(
            tsd, subm_per_block=subm, residual=residual)
        merged = merge_into(merged, ('backbone_3d',), bb3d_p, bb3d_s)
        report['converted'].append('backbone_3d')

    # ---- 2D backbone -------------------------------------------------------
    if bb2d_name == 'SSFA':
        perm = height_compression_perm(
            sd, 'backbone_2d.bottom_up_block_0.1.weight')
        bb2d_p, bb2d_s = convert_ssfa(tsd, in_perm=perm)
        merged = merge_into(merged, ('backbone_2d',), bb2d_p, bb2d_s)
        report['converted'].append('backbone_2d')
    elif bb2d_name == 'BaseBEVBackbone':
        layer_nums = list(cfg.MODEL.BACKBONE_2D.LAYER_NUMS)
        upsample = bool(cfg.MODEL.BACKBONE_2D.get('UPSAMPLE_STRIDES', []))
        perm = height_compression_perm(sd, 'backbone_2d.blocks.0.1.weight')
        bb2d_p, bb2d_s = convert_base_bev_backbone(
            tsd, layer_nums, upsample=upsample, prefix='backbone_2d.',
            in_perm=perm)
        merged = merge_into(merged, ('backbone_2d',), bb2d_p, bb2d_s)
        report['converted'].append('backbone_2d')
    elif bb2d_name is not None:
        raise NotImplementedError(
            f'no BACKBONE_2D conversion for {bb2d_name}')

    # ---- dense head --------------------------------------------------------
    if head_name == 'CenterHead':
        dh_p, dh_s = convert_center_head(tsd)
    else:
        dh_p, dh_s = convert_anchor_head(tsd)
    merged = merge_into(merged, ('dense_head',), dh_p, dh_s)
    report['converted'].append('dense_head')

    # ---- roi head (voxel-query mode only; see docstring) -------------------
    roi_cfg = cfg.MODEL.get('ROI_HEAD', None)
    if (roi_cfg is not None
            and str(roi_cfg.get('ROI_GRID_POOL', {}).get(
                'POOL_MODE', 'corner')) == 'voxel_query'
            and 'roi_head.shared_fc_layer.0.weight' in sd):
        rh_p, rh_s = convert_voxelrcnn_kl_head(
            tsd, list(roi_cfg.ROI_GRID_POOL.FEATURES_SOURCE))
        merged = merge_into(merged, ('roi_head',), rh_p, rh_s)
        report['converted'].append('roi_head')

    return merged, _finish_report(report, sd, consumed)
