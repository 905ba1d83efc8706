"""Detector composition: config-driven model build, loss, post-processing.

The reference composes detectors from an 8-slot module topology via a
mutable batch_dict (pcdet/models/detectors/detector3d_template.py:24-51).
Here a detector is:
  - a flax module (`DetectorNet`) holding the neural slots, whose forward
    takes fixed-shape batch arrays and returns head outputs;
  - a `Detector` wrapper owning static state (anchor set, box coder,
    configs) and exposing pure functions: init, loss_fn (target assignment
    + all loss terms), predict (decode + NMS / variance-voting NMS).

Voxelization runs *inside* the forward (fused on device) — the host only
ships padded raw points.  Supported dense heads: AnchorHeadSingle,
AnchorHeadKLLabel, AnchorHeadKLLabelIoU.  The sparse-conv backbone slot
(SECOND/VoxelRCNN) plugs into `backbone_3d` (see spconv_backbone.py).
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nms as nms_ops
from ..ops import voxelize as vox_ops
from ..utils import box_coder as box_coder_lib
from ..utils import common
from . import anchor_heads, anchors, target_assigner
from .bev_backbone import SSFA, BaseBEVBackbone
from .map_to_bev import HeightCompression, PointPillarScatter
from .vfe import MeanVFE, PillarVFE


class DetectorNet(nn.Module):
    """Neural network slots of a dense-path detector (pillars / voxels)."""
    model_cfg: Any           # Cfg (hashable-by-id static field)
    data_cfg: Any
    grid_size: tuple
    voxel_size: tuple
    pc_range: tuple
    max_voxels: int
    max_points_per_voxel: int
    num_class: int
    num_anchors_per_location: int
    code_size: int
    axis_name: Optional[str] = None

    def setup(self):
        # linen deep-converts dict fields to FrozenDict; restore Cfg access
        from flax.core import unfreeze
        from ..config import Cfg
        mcfg = Cfg(unfreeze(self.model_cfg))
        vfe_cfg = mcfg.get('VFE', None)
        self._is_camera = vfe_cfg is not None and vfe_cfg.NAME == 'ImageVFE'
        if vfe_cfg is None:
            self.vfe = None
        elif vfe_cfg.NAME == 'ImageVFE':
            from .image_vfe import ImageVFE
            self.vfe = ImageVFE(model_cfg=vfe_cfg, grid_size=self.grid_size,
                                pc_range=self.pc_range,
                                axis_name=self.axis_name)
        elif vfe_cfg.NAME == 'PillarVFE':
            self.vfe = PillarVFE(
                num_filters=tuple(vfe_cfg.NUM_FILTERS),
                voxel_size=self.voxel_size,
                point_cloud_range=self.pc_range,
                use_absolute_xyz=vfe_cfg.get('USE_ABSLOTE_XYZ', True),
                with_distance=vfe_cfg.get('WITH_DISTANCE', False),
                use_norm=vfe_cfg.get('USE_NORM', True),
                axis_name=self.axis_name)
        elif vfe_cfg.NAME == 'MeanVFE':
            self.vfe = MeanVFE()
        elif vfe_cfg.NAME in ('DynMeanVFE', 'DynamicMeanVFE'):
            from .vfe import DynamicMeanVFE
            self.vfe = DynamicMeanVFE()
        elif vfe_cfg.NAME in ('DynPillarVFE', 'DynamicPillarVFE'):
            from .vfe import DynamicPillarVFE
            self.vfe = DynamicPillarVFE(
                num_filters=tuple(vfe_cfg.NUM_FILTERS),
                voxel_size=self.voxel_size,
                point_cloud_range=self.pc_range,
                use_absolute_xyz=vfe_cfg.get('USE_ABSLOTE_XYZ', True),
                with_distance=vfe_cfg.get('WITH_DISTANCE', False),
                use_norm=vfe_cfg.get('USE_NORM', True),
                axis_name=self.axis_name)
        else:
            raise NotImplementedError(vfe_cfg.NAME)

        self.backbone_3d = None
        self._is_point_based = False
        bb3d_cfg = mcfg.get('BACKBONE_3D', None)
        if bb3d_cfg is not None and bb3d_cfg.NAME == 'PointNet2MSG':
            from .pointnet2_backbone import PointNet2MSG
            self._is_point_based = True
            sa = bb3d_cfg.get('SA_CONFIG', {})
            kwargs = {}
            if sa:
                kwargs = dict(
                    sa_npoints=tuple(sa.NPOINTS),
                    sa_radii=tuple(tuple(r) for r in sa.RADIUS),
                    sa_nsamples=tuple(tuple(s) for s in sa.NSAMPLE),
                    sa_mlps=tuple(tuple(tuple(m) for m in lv)
                                  for lv in sa.MLPS))
            if bb3d_cfg.get('FP_MLPS', None) is not None:
                kwargs['fp_mlps'] = tuple(tuple(m) for m in bb3d_cfg.FP_MLPS)
            self.backbone_3d = PointNet2MSG(axis_name=self.axis_name, **kwargs)
        elif bb3d_cfg is not None:
            from .spconv_backbone import build_backbone_3d
            self.backbone_3d = build_backbone_3d(
                bb3d_cfg, grid_size=self.grid_size,
                max_voxels=self.max_voxels, axis_name=self.axis_name,
                voxel_size=self.voxel_size, pc_range=self.pc_range,
                # dense-level active-site lists are only consumed by the
                # VSA keypoint path (PV-RCNN family)
                site_lists=mcfg.get('PFE', None) is not None)

        self.point_head = None
        self.point_head_simple = None
        ph_cfg = mcfg.get('POINT_HEAD', None)
        self.part_head = None
        if ph_cfg is not None and ph_cfg.get('NAME') == 'PointIntraPartOffsetHead':
            from .point_heads import PointIntraPartOffsetHead
            extra = {}
            if (ph_cfg.get('REG_FC') is not None
                    and ph_cfg.get('TARGET_CONFIG', {}).get('BOX_CODER')):
                # anchor-free box branch (PartA2_free.yaml)
                pt_coder = box_coder_lib.build_box_coder(
                    ph_cfg.TARGET_CONFIG.BOX_CODER,
                    **ph_cfg.TARGET_CONFIG.get('BOX_CODER_CONFIG', {}))
                self._pt_coder = pt_coder
                extra = dict(reg_fc=tuple(ph_cfg.REG_FC),
                             code_size=pt_coder.code_size)
            self.part_head = PointIntraPartOffsetHead(
                num_class=(1 if ph_cfg.get('CLASS_AGNOSTIC', True)
                           else self.num_class),
                cls_fc=tuple(ph_cfg.get('CLS_FC', [])),
                part_fc=tuple(ph_cfg.get('PART_FC', [])),
                axis_name=self.axis_name, **extra)
        elif ph_cfg is not None and ph_cfg.get('NAME') == 'PointHeadSimple':
            from .pfe import PointHeadSimple
            self.point_head_simple = PointHeadSimple(
                num_class=(1 if ph_cfg.get('CLASS_AGNOSTIC', True)
                           else self.num_class),
                cls_fc=tuple(ph_cfg.CLS_FC), axis_name=self.axis_name)
        elif ph_cfg is not None:
            from .point_heads import PointHeadBox
            pt_coder = box_coder_lib.build_box_coder(
                ph_cfg.TARGET_CONFIG.BOX_CODER,
                **ph_cfg.TARGET_CONFIG.get('BOX_CODER_CONFIG', {}))
            self._pt_coder = pt_coder
            self.point_head = PointHeadBox(
                num_class=self.num_class, code_size=pt_coder.code_size,
                cls_fc=tuple(ph_cfg.CLS_FC), reg_fc=tuple(ph_cfg.REG_FC),
                axis_name=self.axis_name)

        self.pfe = None
        pfe_cfg = mcfg.get('PFE', None)
        if pfe_cfg is not None:
            from .pfe import VoxelSetAbstraction
            self.pfe = VoxelSetAbstraction(
                model_cfg=pfe_cfg, voxel_size=self.voxel_size,
                pc_range=self.pc_range, axis_name=self.axis_name)
        if self._is_point_based:
            # point topology has no BEV stages
            self.map_to_bev_name = None
            self.dense_head = None
            self.roi_head = None
            roi_cfg = mcfg.get('ROI_HEAD', None)
            if roi_cfg is not None and roi_cfg.NAME == 'PointRCNNHead':
                from .point_rcnn_head import PointRCNNHead
                self.roi_head = PointRCNNHead(
                    model_cfg=roi_cfg,
                    num_class=(1 if roi_cfg.get('CLASS_AGNOSTIC', True)
                               else self.num_class),
                    code_size=7, axis_name=self.axis_name)
            self._mcfg = mcfg
            return

        self._is_part_free = mcfg.get('DENSE_HEAD', None) is None
        if self._is_part_free:
            assert (self.part_head is not None
                    and getattr(self, '_pt_coder', None) is not None), (
                'a DENSE_HEAD-less (PartA2-free) topology needs a '
                'PointIntraPartOffsetHead POINT_HEAD with REG_FC and '
                'TARGET_CONFIG.BOX_CODER (the anchor-free box branch '
                'provides stage-1 proposals)')
            # PartA2-free topology (reference PartA2_free.yaml: PointRCNN
            # detector class with a UNetV2 backbone, the intra-part head as
            # the anchor-free stage 1, and NO BEV/dense-head stages).
            self.map_to_bev = None
            self.backbone_2d = None
            self.dense_head = None
            self._mcfg = mcfg
            self._anchor_set = None
            roi_cfg = mcfg.get('ROI_HEAD', None)
            self._coder = box_coder_lib.build_box_coder(
                (roi_cfg or {}).get('TARGET_CONFIG', {}).get(
                    'BOX_CODER', 'ResidualCoder'))
            self._roi_is_pvrcnn = self._roi_is_second = False
            self._roi_is_parta2 = roi_cfg is not None
            if roi_cfg is not None:
                from .roi_heads import PartA2FCHead
                self.roi_head = PartA2FCHead(
                    model_cfg=roi_cfg, code_size=self._coder.code_size,
                    axis_name=self.axis_name)
            else:
                self.roi_head = None
            return

        m2b = mcfg.MAP_TO_BEV  # (voxel topologies only; point path returned)
        if m2b.NAME == 'Conv2DCollapse':
            from .image_vfe import Conv2DCollapse
            self.map_to_bev = Conv2DCollapse(
                num_bev_features=int(m2b.NUM_BEV_FEATURES),
                axis_name=self.axis_name)
        elif m2b.NAME == 'PointPillarScatter':
            self.map_to_bev = PointPillarScatter(grid_size=self.grid_size)
        elif m2b.NAME == 'HeightCompression':
            # grid for the compressed map is provided by the 3D backbone
            self.map_to_bev = None
        else:
            raise NotImplementedError(m2b.NAME)

        bb_cfg = mcfg.BACKBONE_2D
        if bb_cfg.NAME == 'BaseBEVBackbone':
            self.backbone_2d = BaseBEVBackbone(
                layer_nums=tuple(bb_cfg.LAYER_NUMS),
                layer_strides=tuple(bb_cfg.LAYER_STRIDES),
                num_filters=tuple(bb_cfg.NUM_FILTERS),
                upsample_strides=tuple(bb_cfg.get('UPSAMPLE_STRIDES', ())),
                num_upsample_filters=tuple(bb_cfg.get('NUM_UPSAMPLE_FILTERS', ())),
                axis_name=self.axis_name)
        elif bb_cfg.NAME == 'SSFA':
            self.backbone_2d = SSFA(axis_name=self.axis_name)
        else:
            raise NotImplementedError(bb_cfg.NAME)

        head_cfg = mcfg.DENSE_HEAD
        self._mcfg = mcfg
        self._is_center_head = head_cfg.NAME == 'CenterHead'
        self._is_pvpp = mcfg.get('NAME', '') == 'PVRCNNPlusPlus'
        num_dir_bins = (head_cfg.get('NUM_DIR_BINS', 2)
                        if head_cfg.get('USE_DIRECTION_CLASSIFIER', False) else 0)
        self._num_dir_bins = num_dir_bins
        self._dir_offset = head_cfg.get('DIR_OFFSET', 0.78539)
        self._dir_limit_offset = head_cfg.get('DIR_LIMIT_OFFSET', 0.0)
        ta_cfg = head_cfg.get('TARGET_ASSIGNER_CONFIG', {}) or {}
        self._coder = box_coder_lib.build_box_coder(
            ta_cfg.get('BOX_CODER', 'ResidualCoder'),
            **ta_cfg.get('BOX_CODER_CONFIG', {}))
        self._anchor_set = (
            anchors.generate_anchors(head_cfg.ANCHOR_GENERATOR_CONFIG,
                                     self.grid_size, self.pc_range)
            if head_cfg.get('ANCHOR_GENERATOR_CONFIG', None) is not None
            else None)

        roi_cfg = mcfg.get('ROI_HEAD', None)
        self._roi_is_pvrcnn = False
        self._roi_is_parta2 = False
        self._roi_is_second = False
        if roi_cfg is not None and roi_cfg.NAME == 'SECONDHead':
            from .roi_heads import SECONDHead
            self._roi_is_second = True
            self.roi_head = SECONDHead(
                model_cfg=roi_cfg, voxel_size=self.voxel_size,
                pc_range=self.pc_range, code_size=self._coder.code_size,
                axis_name=self.axis_name)
        elif roi_cfg is not None and roi_cfg.NAME == 'PartA2FCHead':
            from .roi_heads import PartA2FCHead
            self._roi_is_parta2 = True
            self.roi_head = PartA2FCHead(
                model_cfg=roi_cfg, code_size=self._coder.code_size,
                axis_name=self.axis_name)
        elif roi_cfg is not None and roi_cfg.NAME == 'PVRCNNHead':
            from .roi_heads import PVRCNNHead
            self._roi_is_pvrcnn = True
            self.roi_head = PVRCNNHead(
                model_cfg=roi_cfg, code_size=self._coder.code_size,
                axis_name=self.axis_name)
        elif roi_cfg is not None:
            from .roi_heads import VoxelRCNNHead
            self.roi_head = VoxelRCNNHead(
                model_cfg=roi_cfg,
                voxel_size=self.voxel_size, pc_range=self.pc_range,
                code_size=self._coder.code_size,
                kl_label='KLLabel' in roi_cfg.NAME,
                ple='Ple' in roi_cfg.NAME,
                axis_name=self.axis_name)
        else:
            self.roi_head = None
        common_kwargs = dict(
            num_class=self.num_class,
            num_anchors_per_location=self.num_anchors_per_location,
            code_size=self.code_size,
            num_dir_bins=num_dir_bins)
        if head_cfg.NAME == 'AnchorHeadSingle':
            self.dense_head = anchor_heads.AnchorHeadSingle(**common_kwargs)
        elif head_cfg.NAME == 'AnchorHeadKLLabel':
            self.dense_head = anchor_heads.AnchorHeadKLLabel(**common_kwargs)
        elif head_cfg.NAME in ('AnchorHeadKLLabelIoU', 'AnchorHeadKLLabelIoUGuide'):
            self.dense_head = anchor_heads.AnchorHeadKLLabel(
                with_iou_branch=True,
                with_guide=head_cfg.NAME.endswith('Guide'), **common_kwargs)
        elif head_cfg.NAME == 'AnchorHeadKL':
            self.dense_head = anchor_heads.AnchorHeadKLLabel(**common_kwargs)
        elif head_cfg.NAME == 'AnchorHeadIoU':
            self.dense_head = anchor_heads.AnchorHeadKLLabel(
                with_iou_branch=True, with_std_branch=False, **common_kwargs)
        elif head_cfg.NAME == 'AnchorHeadSessd':
            self.dense_head = anchor_heads.AnchorHeadSingle(**common_kwargs)
        elif head_cfg.NAME == 'AnchorHeadMulti':
            groups = tuple(tuple(h['HEAD_CLS_NAME'])
                           for h in head_cfg.RPN_HEAD_CFGS)
            names = tuple(self._anchor_set.class_names)
            assert tuple(n for g in groups for n in g) == names, (
                'RPN_HEAD_CFGS must partition CLASS_NAMES in anchor order')
            per_class = tuple(sl.stop - sl.start
                              for sl in self._anchor_set.class_slices)
            self.dense_head = anchor_heads.AnchorHeadMulti(
                num_class=self.num_class, class_names=names,
                anchors_per_class=per_class, head_groups=groups,
                code_size=self.code_size, num_dir_bins=num_dir_bins,
                shared_ch=head_cfg.get('SHARED_CONV_NUM_FILTER', 64),
                axis_name=self.axis_name)
        elif head_cfg.NAME == 'CenterHead':
            from .center_head import CenterHead
            self.dense_head = CenterHead(
                num_class=self.num_class,
                shared_ch=head_cfg.get('SHARED_CONV_CHANNEL', 64),
                use_bias_before_norm=head_cfg.get('USE_BIAS_BEFORE_NORM',
                                                  False),
                axis_name=self.axis_name)
        else:
            raise NotImplementedError(head_cfg.NAME)

    def __call__(self, points, points_mask, gt_boxes=None, gt_mask=None,
                 gt_uncertainty=None, camera=None, train: bool = True):
        """points: (B, P, C), points_mask: (B, P) -> output dict with dense
        head outputs (and, for two-stage models, roi outputs + sampled-roi
        targets when training).  Camera models (CaDDN) take `camera`: a
        dict with images / trans_lidar_to_cam / trans_cam_to_img /
        image_shape instead of using the points."""
        if self._is_camera:
            vfe_out = self.vfe(camera['images'],
                               camera['trans_lidar_to_cam'],
                               camera['trans_cam_to_img'],
                               camera['image_shape'], train=train)
            bev = self.map_to_bev(vfe_out['voxel_features'], train=train)
            spatial_2d = self.backbone_2d(bev, train=train)
            return {'dense_head': self.dense_head(spatial_2d, train=train),
                    'depth_logits': vfe_out['depth_logits']}
        if self._is_point_based:
            feats = self.backbone_3d(points, points_mask, train=train)
            head_out = self.point_head(feats, points_mask, train=train)
            head_out['point_xyz'] = points[..., :3]
            head_out['point_mask'] = points_mask
            out = {'point_head': head_out}
            if self.roi_head is None:
                return out
            return self._point_rcnn_stage2(
                out, points, points_mask, feats, gt_boxes, gt_mask,
                gt_uncertainty, train)

        from .vfe import DynamicMeanVFE, DynamicPillarVFE
        if isinstance(self.vfe, (DynamicMeanVFE, DynamicPillarVFE)):
            # dynamic (capless scatter) voxelization: flatten the batch into
            # the point/segment axis so BN stats span the batch
            vox = jax.vmap(functools.partial(
                vox_ops.voxelize_dynamic,
                voxel_size=tuple(self.voxel_size),
                pc_range=tuple(self.pc_range),
                grid_size=tuple(self.grid_size),
                max_voxels=self.max_voxels))(points, points_mask)
            b, n = points.shape[:2]
            v = self.max_voxels
            offs = jnp.arange(b, dtype=jnp.int32)[:, None] * v
            flat_idx = jnp.where(vox['point_voxel_idx'] >= 0,
                                 vox['point_voxel_idx'] + offs,
                                 -1).reshape(b * n)
            flat_pts = points.reshape(b * n, -1)
            if isinstance(self.vfe, DynamicPillarVFE):
                flat_coords = vox['voxel_coords'].reshape(b * v, 3)
                feats = self.vfe(flat_pts, flat_idx, flat_coords,
                                 num_voxels=b * v, train=train)
            else:
                feats = self.vfe(flat_pts, flat_idx, num_voxels=b * v,
                                 train=train)
            feats = feats.reshape(b, v, -1)
            feats = jnp.where(vox['voxel_mask'][..., None], feats, 0.0)
        else:
            voxelize_fn = functools.partial(
                vox_ops.voxelize,
                voxel_size=tuple(self.voxel_size),
                pc_range=tuple(self.pc_range),
                grid_size=tuple(self.grid_size),
                max_voxels=self.max_voxels,
                max_points_per_voxel=self.max_points_per_voxel)
            vox = jax.vmap(voxelize_fn)(points, points_mask)
            feats = None

        b, v = vox['voxel_coords'].shape[:2]
        if feats is not None:
            pass
        elif isinstance(self.vfe, PillarVFE):
            # flatten batch into the voxel axis so BN stats span the batch
            feats = self.vfe(
                vox['voxels'].reshape(b * v, *vox['voxels'].shape[2:]),
                vox['voxel_num_points'].reshape(b * v),
                vox['voxel_coords'].reshape(b * v, 3),
                train=train)
            feats = feats.reshape(b, v, -1)
        else:
            feats = jax.vmap(lambda vv, nn_: self.vfe(vv, nn_, train=train))(
                vox['voxels'], vox['voxel_num_points'])

        multi_scale = None
        if self.backbone_3d is not None:
            sp_out = self.backbone_3d(
                feats, vox['voxel_coords'], vox['voxel_mask'], train=train)
            spatial = sp_out['bev_features']
            multi_scale = sp_out['multi_scale']
        else:
            spatial = jax.vmap(
                lambda f, c, m: self.map_to_bev(f, c, m, train=train))(
                feats, vox['voxel_coords'], vox['voxel_mask'])

        if self._is_part_free:
            return self._part_free_forward(sp_out, gt_boxes, gt_mask,
                                           gt_uncertainty, train)

        spatial_2d = self.backbone_2d(spatial, train=train)
        out = {'dense_head': self.dense_head(spatial_2d, train=train)}

        # ---- UNet voxel-point part head (PartA2) ---------------------------
        part_out = None
        if self.part_head is not None:
            part_out = self.part_head(sp_out['point_features'],
                                      sp_out['point_mask'], train=train)
            part_out['point_coords'] = sp_out['point_coords']
            part_out['point_mask'] = sp_out['point_mask']
            out['part_head'] = part_out

        if self.roi_head is None:
            return out

        # ---- PFE: VoxelSetAbstraction keypoints (PV-RCNN) ------------------
        # PV-RCNN++ (pv_rcnn_plusplus.py:16-30) runs the proposal layer
        # FIRST (SPC keypoint sampling needs rois); plain PV-RCNN samples
        # keypoints from the raw cloud before proposals.
        kp_feats_weighted = None
        vsa = None

        def run_pfe(rois_in=None, roi_valid_in=None):
            # HeightCompression BEV stride is 8 (VoxelBackBone8x)
            vsa = self.pfe(points, points_mask, multi_scale, spatial,
                           bev_stride=8, rois=rois_in,
                           roi_valid=roi_valid_in, train=train)
            ph_cfg = self._mcfg.get('POINT_HEAD', None)
            use_before = (ph_cfg or {}).get(
                'USE_POINT_FEATURES_BEFORE_FUSION', True)
            kp_in = (vsa['point_features_before_fusion'] if use_before
                     else vsa['point_features'])
            kp_cls = self.point_head_simple(kp_in, train=train)
            kp_scores = jax.nn.sigmoid(kp_cls).max(axis=-1)
            pfe_out = {'keypoints': vsa['keypoints'],
                       'point_cls_preds': kp_cls}
            return vsa, pfe_out, vsa['point_features'] * kp_scores[..., None]

        if self.pfe is not None and not self._is_pvpp:
            vsa, out['pfe'], kp_feats_weighted = run_pfe()

        # ---- two-stage: proposals -> (train: sampling) -> roi head --------
        from flax.core import unfreeze
        from ..config import Cfg
        from . import roi_heads as roi_lib
        from ..ops import nms as nms_ops
        roi_mcfg = Cfg(unfreeze(self._mcfg))  # linen froze the dict attr
        if self._is_center_head:
            from . import center_head as ch
            hc = roi_mcfg.DENSE_HEAD
            stride = int(hc.TARGET_ASSIGNER_CONFIG.FEATURE_MAP_STRIDE)
            pp = hc.get('POST_PROCESSING', {}) or {}
            kdec = int(pp.get('MAX_OBJ_PER_SAMPLE', 500))
            prop_boxes, best_scores, best_labels = ch.decode_center_boxes(
                out['dense_head'], kdec, self.voxel_size, self.pc_range,
                stride, score_thresh=float(pp.get('SCORE_THRESH', 0.0)))
            decoded = {'batch_box_preds': prop_boxes}
        else:
            decoded = anchor_heads.decode_predictions(
                out['dense_head'], jnp.asarray(self._anchor_set.flat_anchors),
                self._coder, dir_offset=self._dir_offset,
                dir_limit_offset=self._dir_limit_offset,
                num_dir_bins=self._num_dir_bins)
            cls_scores = jax.nn.sigmoid(decoded['batch_cls_preds'])
            best_scores = cls_scores.max(axis=-1)
            best_labels = cls_scores.argmax(axis=-1) + 1
        nms_cfg = roi_mcfg.ROI_HEAD.NMS_CONFIG['TRAIN' if train else 'TEST']
        rois, roi_scores, roi_labels, roi_valid = self._nms_proposals(
            decoded['batch_box_preds'], best_scores, best_labels, nms_cfg)
        out['proposals'] = {'rois': rois, 'roi_scores': roi_scores,
                            'roi_labels': roi_labels, 'roi_valid': roi_valid}

        if train:
            targets = self._sample_roi_targets(
                rois, roi_scores, roi_labels, gt_boxes, gt_mask,
                gt_uncertainty, roi_mcfg.ROI_HEAD.TARGET_CONFIG)
            out['roi_targets'] = targets
            roi_in = targets['rois']
            roi_in_valid = jnp.ones(roi_in.shape[:2], bool)
        else:
            roi_in = rois
            roi_in_valid = roi_valid

        if self.pfe is not None and self._is_pvpp:
            vsa, out['pfe'], kp_feats_weighted = run_pfe(
                roi_in[..., :7], roi_in_valid)

        if self._roi_is_second:
            out['rcnn'] = self.roi_head(roi_in, spatial_2d, train=train)
        elif self._roi_is_parta2:
            # part feature assembly (partA2_head.py:118-126): sigmoid part
            # offsets + detached seg score, xyz zeroed below the seg thresh
            roi_mcfg2 = Cfg(unfreeze(self._mcfg))
            thresh = float(roi_mcfg2.ROI_HEAD.get('SEG_MASK_SCORE_THRESH',
                                                  0.3))
            score = jax.lax.stop_gradient(
                jax.nn.sigmoid(part_out['point_cls_preds']).max(axis=-1))
            offs = jax.nn.sigmoid(part_out['point_part_preds'])
            offs = jnp.where((score >= thresh)[..., None], offs, 0.0)
            part_feats = jnp.concatenate([offs, score[..., None]], axis=-1)
            out['rcnn'] = self.roi_head(
                roi_in, sp_out['point_coords'], sp_out['point_features'],
                part_feats, sp_out['point_mask'], train=train)
        elif self._roi_is_pvrcnn:
            out['rcnn'] = self.roi_head(
                roi_in, vsa['keypoints'], kp_feats_weighted, train=train)
        else:
            out['rcnn'] = self.roi_head(roi_in, multi_scale, train=train)
        out['rcnn']['rois'] = roi_in
        return out

    def _nms_proposals(self, boxes, scores, labels, nms_cfg):
        """Per-sample fixed-slot BEV NMS over decoded stage-1 boxes ->
        (rois, roi_scores, roi_labels, roi_valid), shared by the anchor,
        PartA2-free and PointRCNN proposal paths.

        Proposals are detached BEFORE NMS (the reference runs
        proposal_layer and assign_targets under no_grad,
        roi_head_template.py:51,131); detaching after would trace tangents
        through the whole NMS IoU pass (~2x its cost) and the lazy NMS
        while_loop has no JVP rule."""
        from ..ops import nms as nms_ops
        pre_max = int(nms_cfg.NMS_PRE_MAXSIZE)
        post_max = int(nms_cfg.NMS_POST_MAXSIZE)

        def one_sample(boxes_s, scores_s, labels_s):
            idx, valid = nms_ops.nms_bev(
                boxes_s, scores_s, float(nms_cfg.NMS_THRESH),
                pre_max=pre_max, post_max=post_max,
                score_threshold=float(nms_cfg.get('SCORE_THRESH', 0.0)))
            return (boxes_s[idx], jnp.where(valid, scores_s[idx], 0.0),
                    jnp.where(valid, labels_s[idx], 0), valid)

        return jax.vmap(one_sample)(
            jax.lax.stop_gradient(boxes[..., :7]),
            jax.lax.stop_gradient(scores), labels)

    def _sample_roi_targets(self, rois, roi_scores, roi_labels, gt_boxes,
                            gt_mask, gt_uncertainty, tcfg):
        """Train-time fg/bg roi subsampling + canonical-frame gt targets
        (ProposalTargetLayer semantics), detached as in the reference."""
        from . import roi_heads as roi_lib
        assert gt_boxes is not None
        rng = self.make_rng('roi_sampler')
        keys = jax.random.split(rng, rois.shape[0])
        unc = (gt_uncertainty if gt_uncertainty is not None
               else jnp.ones((*gt_boxes.shape[:2], 7), rois.dtype))
        targets = jax.vmap(functools.partial(
            roi_lib.sample_rois_single, cfg=tcfg))(
            keys, rois, roi_scores, roi_labels, gt_boxes, gt_mask, unc)
        targets['gt_of_rois_ct'] = jax.vmap(roi_lib.canonical_gt_of_rois)(
            targets['rois'], targets['gt_of_rois_src'])
        return jax.lax.stop_gradient(targets)

    def _part_free_forward(self, sp_out, gt_boxes, gt_mask, gt_uncertainty,
                           train):
        """PartA2-free stage 1 + 2: intra-part head (with box branch) on the
        UNet voxel-point features -> anchor-free proposals -> roiaware
        PartA2FCHead (reference PartA2_free.yaml topology; proposal flow as
        point_rcnn.py, part assembly partA2_head.py:118-126 with
        DISABLE_PART substituting raw coords for part offsets)."""
        from flax.core import unfreeze
        from ..config import Cfg

        coords = sp_out['point_coords']
        pmask = sp_out['point_mask']
        part_out = self.part_head(sp_out['point_features'], pmask,
                                  train=train)
        part_out['point_coords'] = coords
        part_out['point_mask'] = pmask
        out = {'part_head': part_out}
        if self.roi_head is None:
            out['point_head'] = {
                'point_cls_preds': part_out['point_cls_preds'],
                'point_box_preds': part_out['point_box_preds'],
                'point_xyz': coords, 'point_mask': pmask}
            return out

        roi_cfg = Cfg(unfreeze(self._mcfg)).ROI_HEAD
        cls = jax.nn.sigmoid(part_out['point_cls_preds'])
        cls = jnp.where(pmask[..., None], cls, 0.0)
        best_scores = cls.max(axis=-1)
        best_labels = cls.argmax(axis=-1) + 1
        boxes = jax.vmap(
            lambda enc, x, lab: self._pt_coder.decode(enc, x, lab))(
            part_out['point_box_preds'], coords, best_labels)

        nms_cfg = roi_cfg.NMS_CONFIG['TRAIN' if train else 'TEST']
        rois, roi_scores, roi_labels, roi_valid = self._nms_proposals(
            boxes, best_scores, best_labels, nms_cfg)
        out['proposals'] = {'rois': rois, 'roi_scores': roi_scores,
                            'roi_labels': roi_labels, 'roi_valid': roi_valid}

        if train:
            targets = self._sample_roi_targets(
                rois, roi_scores, roi_labels, gt_boxes, gt_mask,
                gt_uncertainty, roi_cfg.TARGET_CONFIG)
            out['roi_targets'] = targets
            roi_in = targets['rois']
        else:
            roi_in = rois

        # part-feature assembly (partA2_head.py:118-126): DISABLE_PART
        # substitutes the raw point coords for the sigmoid part offsets
        thresh = float(roi_cfg.get('SEG_MASK_SCORE_THRESH', 0.3))
        score = jax.lax.stop_gradient(
            jax.nn.sigmoid(part_out['point_cls_preds']).max(axis=-1))
        if roi_cfg.get('DISABLE_PART', False):
            first3 = coords
        else:
            first3 = jax.nn.sigmoid(part_out['point_part_preds'])
        first3 = jnp.where((score >= thresh)[..., None], first3, 0.0)
        part_feats = jnp.concatenate([first3, score[..., None]], axis=-1)
        rcnn = self.roi_head(roi_in, coords, sp_out['point_features'],
                             part_feats, pmask, train=train)
        rcnn['rois'] = roi_in
        out['rcnn'] = rcnn
        return out

    def _point_rcnn_stage2(self, out, points, points_mask, feats, gt_boxes,
                           gt_mask, gt_uncertainty, train):
        """PointRCNN RoI refinement (reference pointrcnn_head.py:10-179):
        stage-1 point boxes -> NMS proposals -> (train: roi sampling) ->
        roipoint pooling (detached, as the reference's no_grad) -> head."""
        from flax.core import unfreeze
        from ..config import Cfg
        from ..ops import roipoint_pool
        from .point_rcnn_head import canonicalize_pooled, pool_prefix_features

        head_out = out['point_head']
        roi_cfg = Cfg(unfreeze(self._mcfg)).ROI_HEAD
        xyz = points[..., :3]

        cls = jax.nn.sigmoid(head_out['point_cls_preds'])
        cls = jnp.where(points_mask[..., None], cls, 0.0)
        best_scores = cls.max(axis=-1)
        best_labels = cls.argmax(axis=-1) + 1
        boxes = jax.vmap(
            lambda enc, x, lab: self._pt_coder.decode(enc, x, lab))(
            head_out['point_box_preds'], xyz, best_labels)

        nms_cfg = roi_cfg.NMS_CONFIG['TRAIN' if train else 'TEST']
        rois, roi_scores, roi_labels, roi_valid = self._nms_proposals(
            boxes, best_scores, best_labels, nms_cfg)
        out['proposals'] = {'rois': rois, 'roi_scores': roi_scores,
                            'roi_labels': roi_labels, 'roi_valid': roi_valid}

        if train:
            targets = self._sample_roi_targets(
                rois, roi_scores, roi_labels, gt_boxes, gt_mask,
                gt_uncertainty, roi_cfg.TARGET_CONFIG)
            out['roi_targets'] = targets
            roi_in = targets['rois']
        else:
            roi_in = rois

        # ---- roipoint pooling (reference runs it under no_grad) -----------
        pool_cfg = roi_cfg.ROI_POINT_POOL
        prefix = jax.vmap(functools.partial(
            pool_prefix_features,
            depth_normalizer=float(pool_cfg.DEPTH_NORMALIZER)))(
            xyz, feats, best_scores)
        pooled, empty = jax.vmap(functools.partial(
            roipoint_pool.roipoint_pool3d,
            num_sampled=int(pool_cfg.NUM_SAMPLED_POINTS),
            extra_width=tuple(pool_cfg.POOL_EXTRA_WIDTH)))(
            xyz, prefix, roi_in, points_mask=points_mask)
        pooled = jax.vmap(canonicalize_pooled)(pooled, roi_in, empty)
        b, r, s = pooled.shape[:3]
        pooled = jax.lax.stop_gradient(pooled.reshape(b * r, s, -1))
        empty = empty.reshape(b * r)

        rcnn = self.roi_head(pooled, empty, train=train)
        rcnn['rois'] = roi_in
        out['rcnn'] = rcnn
        return out


class Detector:
    """Static-state wrapper: build from reference-style config, expose pure
    init / loss / predict functions."""

    def __init__(self, model_cfg, data_cfg, num_class, axis_name=None):
        self.model_cfg = model_cfg
        self.data_cfg = data_cfg
        self.num_class = num_class
        self.pc_range = tuple(data_cfg.POINT_CLOUD_RANGE)

        proc_cfgs = {p.NAME: p for p in data_cfg.DATA_PROCESSOR}
        vox_cfg = proc_cfgs.get(
            'transform_points_to_voxels',
            proc_cfgs.get('transform_points_to_voxels_placeholder',
                          proc_cfgs.get('calculate_grid_size')))
        self.voxel_size = tuple(vox_cfg.VOXEL_SIZE)
        self.grid_size = vox_ops.compute_grid_size(self.pc_range, self.voxel_size)
        self.max_points_per_voxel = int(vox_cfg.get('MAX_POINTS_PER_VOXEL', 1))
        mv = vox_cfg.get('MAX_NUMBER_OF_VOXELS', 1)
        self.max_voxels = int(mv['train'] if isinstance(mv, dict) else mv)
        self.max_voxels_test = int(mv['test'] if isinstance(mv, dict) else mv)

        ph_cfg = model_cfg.get('POINT_HEAD', None)
        self.point_coder = None
        if (ph_cfg is not None
                and ph_cfg.get('TARGET_CONFIG', {}).get('BOX_CODER')):
            self.point_coder = box_coder_lib.build_box_coder(
                ph_cfg.TARGET_CONFIG.BOX_CODER,
                **ph_cfg.TARGET_CONFIG.get('BOX_CODER_CONFIG', {}))
        head_cfg = model_cfg.get('DENSE_HEAD', None)
        if head_cfg is None:  # point-topology models have no dense head
            from ..config import Cfg
            head_cfg = Cfg({
                'NAME': 'PointHeadBox',
                'TARGET_ASSIGNER_CONFIG': {'BOX_CODER': 'ResidualCoder'},
                'LOSS_CONFIG': {'LOSS_WEIGHTS': {}}})
        self.is_center_head = head_cfg.NAME == 'CenterHead'
        coder_name = (head_cfg.get('TARGET_ASSIGNER_CONFIG', {}) or {}).get(
            'BOX_CODER', 'ResidualCoder')
        self.box_coder = box_coder_lib.build_box_coder(
            coder_name,
            **head_cfg.get('TARGET_ASSIGNER_CONFIG', {}).get(
                'BOX_CODER_CONFIG', {}))
        self.anchor_set = (
            anchors.generate_anchors(head_cfg.ANCHOR_GENERATOR_CONFIG,
                                     self.grid_size, self.pc_range)
            if head_cfg.get('ANCHOR_GENERATOR_CONFIG', None) is not None
            else None)
        self.match_height = head_cfg.get('TARGET_ASSIGNER_CONFIG', {}).get(
            'MATCH_HEIGHT', False)
        self.target_assigner_name = head_cfg.get(
            'TARGET_ASSIGNER_CONFIG', {}).get(
            'NAME', 'AxisAlignedTargetAssigner')
        self.atss_topk = int(head_cfg.get('TARGET_ASSIGNER_CONFIG', {}).get(
            'TOPK', 9))
        self.use_kl_loss = 'KLLabel' in head_cfg.NAME
        self.use_kl_nolabel = head_cfg.NAME == 'AnchorHeadKL'
        self.use_odiou = head_cfg.NAME == 'AnchorHeadSessd'
        self.use_iou_branch = 'IoU' in head_cfg.NAME
        self.dir_offset = head_cfg.get('DIR_OFFSET', 0.78539)
        self.dir_limit_offset = head_cfg.get('DIR_LIMIT_OFFSET', 0.0)
        self.num_dir_bins = (head_cfg.get('NUM_DIR_BINS', 2)
                             if head_cfg.get('USE_DIRECTION_CLASSIFIER', False) else 0)
        self.loss_weights = head_cfg.LOSS_CONFIG.LOSS_WEIGHTS
        self.code_weights = list(self.loss_weights.get('code_weights', [1.0] * 7))

        def make_net(max_voxels):
            return DetectorNet(
                model_cfg=model_cfg, data_cfg=data_cfg,
                grid_size=self.grid_size, voxel_size=self.voxel_size,
                pc_range=self.pc_range, max_voxels=max_voxels,
                max_points_per_voxel=self.max_points_per_voxel,
                num_class=num_class,
                num_anchors_per_location=(
                    self.anchor_set.num_anchors_per_location
                    if self.anchor_set is not None else 0),
                code_size=self.box_coder.code_size,
                axis_name=axis_name)

        self.net = make_net(self.max_voxels)
        # eval runs with the test voxel budget (reference per-mode
        # VoxelGeneratorWrapper, e.g. KITTI 16000 train / 40000 test);
        # max_voxels shapes activations only, so params are shared
        self.net_eval = (self.net
                         if self.max_voxels_test == self.max_voxels
                         else make_net(self.max_voxels_test))

    # -- init ---------------------------------------------------------------
    def init(self, rng, batch):
        # jit the init: eager init dispatches thousands of ops one by one
        # (minutes over the TPU tunnel); compiled it runs in seconds.
        r_params, r_roi, r_drop = jax.random.split(rng, 3)
        init_fn = jax.jit(functools.partial(self.net.init, train=True))
        return init_fn(
            {'params': r_params, 'roi_sampler': r_roi, 'dropout': r_drop},
            batch['points'], batch['points_mask'],
            gt_boxes=batch.get('gt_boxes'), gt_mask=batch.get('gt_mask'),
            gt_uncertainty=batch.get('gt_uncertainty'),
            camera=_camera_of(batch))

    # -- training loss ------------------------------------------------------
    def loss_fn(self, variables, batch, train=True, mutable=('batch_stats',),
                rng=None):
        """Returns (total_loss, (metrics, new_model_state))."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r_roi, r_drop = jax.random.split(rng)
        out, new_state = self.net.apply(
            variables, batch['points'], batch['points_mask'],
            gt_boxes=batch.get('gt_boxes'), gt_mask=batch.get('gt_mask'),
            gt_uncertainty=batch.get('gt_uncertainty'),
            camera=_camera_of(batch),
            train=train, mutable=list(mutable),
            rngs={'roi_sampler': r_roi, 'dropout': r_drop})
        loss, metrics = self.compute_loss(out, batch)
        return loss, (metrics, new_state)

    def compute_loss(self, full_out, batch):
        if 'part_head' in full_out and 'dense_head' not in full_out:
            return self._part_free_loss(full_out, batch)
        if 'point_head' in full_out:
            total, metrics = self._point_loss(full_out['point_head'], batch)
            if 'rcnn' in full_out and 'roi_targets' in full_out:
                rcnn_total, rcnn_metrics = self._rcnn_loss(full_out)
                total = total + rcnn_total
                metrics.update(rcnn_metrics)
                metrics['loss'] = total
            return total, metrics
        out = full_out['dense_head']
        if self.is_center_head:
            total, metrics = self._center_loss(out, batch)
            # PV-RCNN++ / CenterHead-RPN two-stage extras
            if 'pfe' in full_out:
                seg = self._pfe_loss(full_out, batch)
                metrics['point_loss_cls'] = seg
                total = total + seg
            if 'rcnn' in full_out and 'roi_targets' in full_out:
                rcnn_total, rcnn_metrics = self._rcnn_loss(full_out)
                total = total + rcnn_total
                metrics.update(rcnn_metrics)
            metrics['loss'] = total
            return total, metrics
        if self.target_assigner_name == 'ATSSTargetAssigner':
            targets = jax.vmap(
                lambda gb, gm, gu: target_assigner.atss_assign_targets(
                    self.anchor_set, gb, gm, gu, self.box_coder,
                    topk=self.atss_topk, match_height=self.match_height)
            )(batch['gt_boxes'], batch['gt_mask'], batch['gt_uncertainty'])
        else:
            targets = jax.vmap(
                lambda gb, gm, gu: target_assigner.assign_targets(
                    self.anchor_set, gb, gm, gu, self.box_coder,
                    match_height=self.match_height)
            )(batch['gt_boxes'], batch['gt_mask'], batch['gt_uncertainty'])

        flat = anchor_heads._flatten_preds(out)
        lw = self.loss_weights
        metrics = {}

        c_loss = anchor_heads.cls_loss(
            flat['cls_preds'], targets.box_cls_labels, self.num_class)
        c_loss = c_loss * lw['cls_weight']
        metrics['loss_cls'] = c_loss

        if self.use_kl_loss:
            r_loss, parts = anchor_heads.reg_loss_kl_label(
                flat['box_preds'], flat['box_std_preds'],
                targets.box_reg_targets, targets.box_cls_labels,
                targets.label_uncertainty, code_weights=self.code_weights)
            r_loss = r_loss * lw['loc_weight']
            metrics.update({k: v * lw['loc_weight'] for k, v in parts.items()})
        elif self.use_kl_nolabel:
            r_loss = anchor_heads.reg_loss_kl(
                flat['box_preds'], flat['box_std_preds'],
                targets.box_reg_targets, targets.box_cls_labels,
                code_weights=self.code_weights) * lw['loc_weight']
        elif self.use_odiou:
            r_loss = anchor_heads.reg_loss_odiou(
                flat['box_preds'], targets.box_reg_targets,
                targets.box_cls_labels,
                jnp.asarray(self.anchor_set.flat_anchors),
                self.box_coder) * lw['loc_weight']
        else:
            r_loss = anchor_heads.reg_loss_smooth_l1(
                flat['box_preds'], targets.box_reg_targets,
                targets.box_cls_labels, code_weights=self.code_weights)
            r_loss = r_loss * lw['loc_weight']
        metrics['loss_loc'] = r_loss
        total = c_loss + r_loss

        if self.num_dir_bins > 0 and 'dir_cls_preds' in flat:
            flat_anchors = jnp.asarray(self.anchor_set.flat_anchors)
            b = flat['box_preds'].shape[0]
            anc = jnp.broadcast_to(flat_anchors[None], (b, *flat_anchors.shape))
            dir_t = anchor_heads.get_direction_targets(
                anc, targets.box_reg_targets, self.dir_offset, self.num_dir_bins)
            d_loss = anchor_heads.dir_loss(
                flat['dir_cls_preds'], dir_t,
                targets.box_cls_labels > 0, self.num_dir_bins)
            d_loss = d_loss * lw['dir_weight']
            metrics['loss_dir'] = d_loss
            total = total + d_loss

        if self.use_iou_branch and 'iou_preds' in flat:
            i_loss = anchor_heads.iou_branch_loss(
                flat['iou_preds'], flat['box_preds'], targets.box_reg_targets,
                targets.box_cls_labels, jnp.asarray(self.anchor_set.flat_anchors),
                self.box_coder)
            metrics['loss_iou'] = i_loss
            total = total + i_loss

        # ---- UNet part head losses (PartA2 PointIntraPartOffsetHead) -------
        if 'part_head' in full_out:
            from . import point_heads as ph_lib
            po = full_out['part_head']
            ph_cfg = self.model_cfg.POINT_HEAD
            extra = tuple(ph_cfg.TARGET_CONFIG.get('GT_EXTRA_WIDTH',
                                                   [0.2, 0.2, 0.2]))
            seg_l, part_l, fg = jax.vmap(functools.partial(
                ph_lib.assign_part_targets, extra_width=extra))(
                po['point_coords'], po['point_mask'],
                batch['gt_boxes'], batch['gt_mask'])
            lw = ph_cfg.LOSS_CONFIG.LOSS_WEIGHTS
            flat = {
                'point_cls_preds': po['point_cls_preds'].reshape(
                    -1, po['point_cls_preds'].shape[-1]),
                'point_part_preds': po['point_part_preds'].reshape(-1, 3),
            }
            c_l, p_l = ph_lib.intra_part_loss(
                flat, seg_l.reshape(-1), part_l.reshape(-1, 3),
                fg.reshape(-1), lw)
            metrics['point_loss_cls'] = c_l
            metrics['point_loss_part'] = p_l
            total = total + c_l + p_l

        # ---- keypoint segmentation loss (PV-RCNN PointHeadSimple) ----------
        if 'pfe' in full_out:
            seg = self._pfe_loss(full_out, batch)
            metrics['point_loss_cls'] = seg
            total = total + seg

        # ---- CaDDN depth distribution loss ----------------------------------
        if 'depth_logits' in full_out and 'depth_maps' in batch:
            from .image_vfe import ddn_loss
            ffn_cfg = self.model_cfg.VFE.FFN
            args = dict(ffn_cfg.LOSS.get('ARGS', {}))
            d_loss = ddn_loss(
                full_out['depth_logits'], batch['depth_maps'],
                batch['gt_boxes2d'], batch['gt_boxes2d_mask'],
                dict(ffn_cfg.DISCRETIZE),
                weight=float(args.get('weight', 3.0)),
                alpha=float(args.get('alpha', 0.25)),
                gamma=float(args.get('gamma', 2.0)),
                fg_weight=float(args.get('fg_weight', 13)),
                bg_weight=float(args.get('bg_weight', 1)))
            metrics['loss_depth'] = d_loss
            total = total + d_loss

        # ---- rcnn (two-stage) losses ---------------------------------------
        if 'rcnn' in full_out and 'roi_targets' in full_out:
            rcnn_total, rcnn_metrics = self._rcnn_loss(full_out)
            total = total + rcnn_total
            metrics.update(rcnn_metrics)

        metrics['loss'] = total
        return total, metrics

    def _part_free_loss(self, full_out, batch):
        """PartA2-free losses: multi-class focal cls + smooth-L1 box on the
        anchor-free branch (point_head_template), part-location BCE over
        fg, plus the rcnn losses (point_intra_part_head.get_loss)."""
        from . import point_heads as ph
        po = full_out['part_head']
        ph_cfg = self.model_cfg.POINT_HEAD
        extra = tuple(ph_cfg.TARGET_CONFIG.get('GT_EXTRA_WIDTH',
                                               [0.2, 0.2, 0.2]))
        lw = ph_cfg.LOSS_CONFIG.LOSS_WEIGHTS
        coords, pmask = po['point_coords'], po['point_mask']

        cls_l, box_t, fg = jax.vmap(
            lambda px, pm, gb, gm: ph.assign_point_targets(
                px, pm, gb, gm, self.point_coder, extra_width=extra)
        )(coords, pmask, batch['gt_boxes'], batch['gt_mask'])
        _, part_t, fg_p = jax.vmap(functools.partial(
            ph.assign_part_targets, extra_width=extra))(
            coords, pmask, batch['gt_boxes'], batch['gt_mask'])

        nc = po['point_cls_preds'].shape[-1]
        flat = {
            'point_cls_preds': po['point_cls_preds'].reshape(-1, nc),
            'point_box_preds': po['point_box_preds'].reshape(
                -1, po['point_box_preds'].shape[-1]),
        }
        c_l, b_l = ph.point_head_loss(
            flat, cls_l.reshape(-1), box_t.reshape(-1, box_t.shape[-1]),
            fg.reshape(-1), nc, lw)

        part_prob = jax.nn.sigmoid(po['point_part_preds'].reshape(-1, 3))
        part_t_f = part_t.reshape(-1, 3)
        fgf = fg_p.reshape(-1).astype(jnp.float32)
        bce = -(part_t_f * jnp.log(jnp.clip(part_prob, 1e-7, None))
                + (1 - part_t_f) * jnp.log(jnp.clip(1 - part_prob, 1e-7,
                                                    None)))
        p_l = (bce.mean(axis=-1) * fgf).sum() / jnp.clip(fgf.sum(), 1.0,
                                                         None)
        p_l = p_l * lw.get('point_part_weight', 1.0)

        total = c_l + b_l + p_l
        metrics = {'loss_cls': c_l, 'loss_loc': b_l, 'point_loss_part': p_l}
        if 'rcnn' in full_out and 'roi_targets' in full_out:
            rcnn_total, rcnn_metrics = self._rcnn_loss(full_out)
            total = total + rcnn_total
            metrics.update(rcnn_metrics)
        metrics['loss'] = total
        return total, metrics

    def _pfe_loss(self, full_out, batch):
        """Keypoint foreground-segmentation loss (PointHeadSimple)."""
        from . import pfe as pfe_lib
        ph_cfg = self.model_cfg.POINT_HEAD
        extra = tuple(ph_cfg.TARGET_CONFIG.get('GT_EXTRA_WIDTH',
                                               [0.2, 0.2, 0.2]))
        kp = full_out['pfe']['keypoints']
        labels = jax.vmap(functools.partial(
            pfe_lib.assign_keypoint_seg_targets, extra_width=extra))(
            kp, batch['gt_boxes'], batch['gt_mask'])
        preds = full_out['pfe']['point_cls_preds']
        seg = pfe_lib.keypoint_seg_loss(
            preds.reshape(-1, preds.shape[-1]), labels.reshape(-1),
            num_class=preds.shape[-1])
        return seg * ph_cfg.LOSS_CONFIG.LOSS_WEIGHTS.get(
            'point_cls_weight', 1.0)

    def _rcnn_loss(self, full_out):
        """Shared second-stage losses: BCE cls on iou labels + (KL or plain)
        smooth-L1 reg + corner loss (roi_head_template.py:163-272)."""
        from . import roi_heads as roi_lib
        rcnn = full_out['rcnn']
        rt = full_out['roi_targets']
        roi_lw = self.model_cfg.ROI_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
        metrics = {}
        c_loss = roi_lib.rcnn_cls_loss(
            rcnn['rcnn_cls'], rt['rcnn_cls_labels'])
        c_loss = c_loss * roi_lw.get('rcnn_cls_weight',
                                     roi_lw.get('rcnn_iou_weight', 1.0))
        metrics['rcnn_loss_cls'] = c_loss
        if 'no_reg_loss' in rcnn:      # SECONDHead: IoU scoring only
            return c_loss, metrics
        r_loss, parts = roi_lib.rcnn_reg_loss(
            rcnn['rcnn_reg'], rcnn.get('rcnn_reg_std'),
            rt['rois'], rt['gt_of_rois_ct'], rt['gt_of_rois_src'],
            rt['gt_unc_of_rois'], rt['reg_valid_mask'],
            self.box_coder, roi_lw,
            kl_label='rcnn_reg_std' in rcnn,
            corner_weight=roi_lw.get('rcnn_corner_weight', 1.0),
            code_weights=list(roi_lw.get('code_weights', [1.0] * 7)))
        metrics['rcnn_loss_reg'] = r_loss
        metrics.update(parts)
        return c_loss + r_loss, metrics

    def _point_loss(self, out, batch):
        """PointHeadBox loss (point_head_box.py / point_head_template.py)."""
        from . import point_heads as ph
        ph_cfg = self.model_cfg.POINT_HEAD
        extra = tuple(ph_cfg.TARGET_CONFIG.get('GT_EXTRA_WIDTH',
                                               [0.2, 0.2, 0.2]))
        lw = ph_cfg.get('LOSS_CONFIG', {}).get('LOSS_WEIGHTS', {})
        cls_l, tgt, fg = jax.vmap(
            lambda px, pm, gb, gm: ph.assign_point_targets(
                px, pm, gb, gm, self.point_coder, extra_width=extra)
        )(out['point_xyz'], out['point_mask'], batch['gt_boxes'],
          batch['gt_mask'])

        flat_out = {
            'point_cls_preds': out['point_cls_preds'].reshape(
                -1, out['point_cls_preds'].shape[-1]),
            'point_box_preds': out['point_box_preds'].reshape(
                -1, out['point_box_preds'].shape[-1]),
        }
        cls_loss, reg_loss = ph.point_head_loss(
            flat_out, cls_l.reshape(-1), tgt.reshape(-1, tgt.shape[-1]),
            fg.reshape(-1), self.num_class, lw)
        total = cls_loss + reg_loss
        return total, {'loss': total, 'loss_cls': cls_loss,
                       'loss_loc': reg_loss}

    def _center_loss(self, out, batch):
        """CenterPoint loss: heatmap focal + L1 reg at gt cells
        (center_head.py:226-251)."""
        from . import center_head as ch
        head_cfg = self.model_cfg.DENSE_HEAD
        ta = head_cfg.TARGET_ASSIGNER_CONFIG
        stride = int(ta.FEATURE_MAP_STRIDE)
        hm_shape = out['hm'].shape                        # (B, H, W, C)
        fmap_size = (hm_shape[2], hm_shape[1])            # (x, y)

        heatmaps, tboxes, inds, masks = jax.vmap(
            lambda gb, gm: ch.assign_targets_single(
                gb, gm, self.num_class, fmap_size, stride,
                self.voxel_size, self.pc_range,
                gaussian_overlap=float(ta.get('GAUSSIAN_OVERLAP', 0.1)),
                min_radius=int(ta.get('MIN_RADIUS', 2)))
        )(batch['gt_boxes'], batch['gt_mask'])

        lw = self.loss_weights
        hm_pred = jnp.transpose(out['hm'], (0, 3, 1, 2))  # (B, C, H, W)
        hm_loss = ch.centernet_focal_loss(hm_pred, heatmaps)
        hm_loss = hm_loss * lw.get('cls_weight', 1.0)
        reg_maps = jnp.concatenate(
            [out['center'], out['center_z'], out['dim'], out['rot']], axis=-1)
        reg_loss = ch.center_reg_loss(reg_maps, tboxes, inds,
                                      masks.astype(jnp.float32))
        reg_loss = reg_loss * lw.get('loc_weight', 2.0)
        total = hm_loss + reg_loss
        return total, {'loss': total, 'loss_cls': hm_loss,
                       'loss_loc': reg_loss}

    # -- inference ----------------------------------------------------------
    def predict(self, variables, batch, post_cfg=None):
        """Forward + decode + per-sample NMS.  Returns fixed-shape dict:
        final_boxes (B, K, 7), final_scores (B, K), final_labels (B, K),
        final_valid (B, K)."""
        post = post_cfg if post_cfg is not None else self.model_cfg.POST_PROCESSING
        full_out = self.net_eval.apply(
            variables, batch['points'], batch['points_mask'],
            camera=_camera_of(batch), train=False)

        if 'point_head' in full_out and 'rcnn' not in full_out:
            out = full_out['point_head']
            cls = jax.nn.sigmoid(out['point_cls_preds'])       # (B, N, C)
            cls = jnp.where(out['point_mask'][..., None], cls, 0.0)
            best_scores = cls.max(axis=-1)
            best_labels = cls.argmax(axis=-1) + 1
            boxes = jax.vmap(
                lambda enc, xyz, lab: self.point_coder.decode(enc, xyz, lab)
            )(out['point_box_preds'], out['point_xyz'], best_labels)
            std = jnp.zeros_like(boxes)
            return self._final_nms(post, boxes, best_scores, best_labels, std)

        if 'rcnn' in full_out:
            from . import roi_heads as roi_lib
            rcnn = full_out['rcnn']
            rois = rcnn['rois']
            b, r = rois.shape[:2]
            boxes_all = roi_lib.decode_rcnn_boxes(
                rois, rcnn['rcnn_reg'], self.box_coder)
            best_scores = jax.nn.sigmoid(rcnn['rcnn_cls']).reshape(b, r)
            best_labels = full_out['proposals']['roi_labels']
            best_scores = jnp.where(full_out['proposals']['roi_valid'],
                                    best_scores, 0.0)
            std_all = rcnn.get(
                'rcnn_reg_std',
                jnp.zeros((b * r, self.box_coder.code_size))).reshape(b, r, -1)
            return self._final_nms(post, boxes_all[..., :7], best_scores,
                                   best_labels, std_all)

        out = full_out['dense_head']
        if self.is_center_head:
            from . import center_head as ch
            head_cfg = self.model_cfg.DENSE_HEAD
            stride = int(head_cfg.TARGET_ASSIGNER_CONFIG.FEATURE_MAP_STRIDE)
            k = int(post.get('MAX_OBJ_PER_SAMPLE', 500))
            boxes, scores, labels = ch.decode_center_boxes(
                out, k, self.voxel_size, self.pc_range, stride,
                score_thresh=float(post.get('SCORE_THRESH', 0.0)))
            std = jnp.zeros_like(boxes)
            return self._final_nms(post, boxes, scores, labels, std)
        decoded = anchor_heads.decode_predictions(
            out, jnp.asarray(self.anchor_set.flat_anchors), self.box_coder,
            dir_offset=self.dir_offset, dir_limit_offset=self.dir_limit_offset,
            num_dir_bins=self.num_dir_bins)

        cls_preds = decoded['batch_cls_preds']
        scores = jax.nn.sigmoid(cls_preds)
        if self.use_iou_branch and 'batch_iou_preds' in decoded:
            head_cfg = self.model_cfg.DENSE_HEAD
            iou = (decoded['batch_iou_preds'] + 1.0) * 0.5
            scores = jnp.where(scores < head_cfg.get('PRE_CLS_THRESH', 0.0), 0.0, scores)
            iou = jnp.where(iou < head_cfg.get('PRE_IOU_THRESH', 0.0), 0.0, iou)
            scores = scores * jnp.power(jnp.clip(iou, 0.0, None),
                                        head_cfg.get('POW', 1.0))
        best_scores = scores.max(axis=-1)
        best_labels = scores.argmax(axis=-1) + 1
        std = decoded.get('batch_box_std_preds',
                          jnp.zeros_like(decoded['batch_box_preds']))
        return self._final_nms(post, decoded['batch_box_preds'][..., :7],
                               best_scores, best_labels, std,
                               cls_scores_all=scores)

    def _final_nms(self, post, boxes_all, best_scores, best_labels, std_all,
                   cls_scores_all=None):

        nms_cfg = post.NMS_CONFIG
        use_voting = nms_cfg.NMS_TYPE in ('new_nms_gpu', 'variance_voting')
        if (nms_cfg.get('MULTI_CLASSES_NMS', False)
                and cls_scores_all is not None
                and cls_scores_all.shape[-1] > 1):
            # per-class NMS merge (model_nms_utils.multi_classes_nms :66-104)
            pre_max = int(nms_cfg.NMS_PRE_MAXSIZE)
            post_max = int(nms_cfg.NMS_POST_MAXSIZE)

            def one_sample_mc(boxes_s, cls_s):
                idx, valid, labels, scores_ = nms_ops.multi_classes_nms(
                    boxes_s, cls_s, float(nms_cfg.NMS_THRESH),
                    num_class=self.num_class, pre_max=pre_max,
                    post_max=post_max,
                    score_threshold=float(post.get('SCORE_THRESH', 0.0)))
                k = post_max  # fixed-slot contract: top post_max overall
                return (boxes_s[idx[:k]], jnp.where(valid[:k], scores_[:k], 0.0),
                        jnp.where(valid[:k], labels[:k], 0), valid[:k])

            fb, fs, fl, fv = jax.vmap(one_sample_mc)(boxes_all,
                                                     cls_scores_all)
            post_score_thresh = float(post.get('POST_SCORE_THRESH', 0.0))
            if post_score_thresh > 0:
                keep = fs > post_score_thresh
                fv = fv & keep
                fs = jnp.where(keep, fs, 0.0)
            return {'final_boxes': fb, 'final_scores': fs,
                    'final_labels': fl, 'final_valid': fv}
        pre_max = int(nms_cfg.NMS_PRE_MAXSIZE)
        post_max = int(nms_cfg.NMS_POST_MAXSIZE)
        thresh = float(nms_cfg.NMS_THRESH)
        score_thresh = float(post.get('SCORE_THRESH', 0.0))
        post_score_thresh = float(post.get('POST_SCORE_THRESH', 0.0))

        def one_sample(best_scores, best_labels, boxes_s, std_s):
            if use_voting:
                boxes_wrapped = jnp.concatenate([
                    boxes_s[:, :6],
                    common.limit_period(boxes_s[:, 6:7], 0.5, 2 * np.pi)], axis=1)
                variance = jnp.exp(std_s[:, :7])
                idx, valid, voted, kept_scores = nms_ops.variance_voting_nms(
                    boxes_wrapped, best_scores, variance, thresh,
                    pre_max=pre_max, post_max=post_max,
                    score_threshold=score_thresh)
                final_boxes = voted
                final_scores = kept_scores
            else:
                masked_scores = jnp.where(best_scores >= score_thresh,
                                          best_scores, 0.0)
                idx, valid = nms_ops.nms_bev(
                    boxes_s, masked_scores, thresh,
                    pre_max=pre_max, post_max=post_max,
                    score_threshold=score_thresh)
                final_boxes = boxes_s[idx]
                final_scores = jnp.where(valid, best_scores[idx], 0.0)
            final_labels = jnp.where(valid, best_labels[idx], 0)
            if post_score_thresh > 0:
                keep = final_scores > post_score_thresh
                valid = valid & keep
                final_scores = jnp.where(keep, final_scores, 0.0)
            return final_boxes, final_scores, final_labels, valid

        fb, fs, fl, fv = jax.vmap(one_sample)(
            best_scores, best_labels, boxes_all, std_all)
        return {'final_boxes': fb, 'final_scores': fs,
                'final_labels': fl, 'final_valid': fv}


def _camera_of(batch):
    if 'images' not in batch:
        return None
    return {k: batch[k] for k in ('images', 'trans_lidar_to_cam',
                                  'trans_cam_to_img', 'image_shape')}


def build_detector(cfg, axis_name=None):
    """cfg: full config with CLASS_NAMES / DATA_CONFIG / MODEL."""
    return Detector(cfg.MODEL, cfg.DATA_CONFIG,
                    num_class=len(cfg.CLASS_NAMES), axis_name=axis_name)
