"""Pandaset dataset adapter.

Info-pkl driven (reference pcdet/datasets/pandaset/pandaset_dataset.py
consumes the pandaset-devkit's pandas pickles; the devkit is not
installable here, so this adapter reads pre-extracted infos with
'lidar_path' pointing at (N, 4) float32 .bin/.npy point files plus
gt_boxes/gt_names — the same extraction contract as our KITTI/Waymo
pipelines).  Evaluation reuses the kitti-format evaluator the reference
also falls back to.
"""
from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from .nuscenes_dataset import NuScenesDataset


class PandasetDataset(NuScenesDataset):
    def get_lidar_with_sweeps(self, index):
        info = self.infos[index]
        path = self.root_path / info['lidar_path']
        if path.suffix == '.npy':
            pts = np.load(str(path)).astype(np.float32)
        else:
            pts = np.fromfile(str(path), dtype=np.float32).reshape(-1, 4)
        if pts.shape[1] < 5:
            pts = np.concatenate(
                [pts, np.zeros((len(pts), 5 - pts.shape[1]), np.float32)],
                axis=1)
        return pts

    def evaluation(self, det_annos, class_names, **kwargs):
        """Kitti-format AP over lidar boxes (the reference evaluates
        pandaset with the kitti evaluator after a frame transform,
        pandaset_dataset.py:385-430)."""
        from .waymo_utils import transform_annos_to_kitti_format
        from ..eval import kitti_eval

        def to_kitti_names(names):
            return np.array([{'car': 'Car', 'pedestrian': 'Pedestrian',
                              'cyclist': 'Cyclist'}.get(str(n).lower(),
                                                        str(n).title())
                             for n in names])

        gt_annos = [transform_annos_to_kitti_format(
            {'name': to_kitti_names(info['gt_names']),
             'gt_boxes_lidar': np.asarray(info['gt_boxes'])[:, :7]})
            for info in self.infos]
        dt_annos = []
        for a in det_annos:
            a = dict(a)
            a['name'] = to_kitti_names(a['name'])
            dt_annos.append(transform_annos_to_kitti_format(a))
        kitti_classes = [c for c in (str(n).title() for n in class_names)
                         if c in ('Car', 'Pedestrian', 'Cyclist')]
        return kitti_eval.get_official_eval_result(
            gt_annos, dt_annos, kitti_classes)
