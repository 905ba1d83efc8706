"""Lyft Level-5 dataset adapter + mAP evaluation.

Info-pkl driven (reference pcdet/datasets/lyft/lyft_dataset.py): the info
format mirrors nuscenes (lidar_path, sweeps, gt_boxes, gt_names), so the
adapter subclasses NuScenesDataset and swaps the evaluation for the Lyft
competition metric (reference lyft/lyft_mAP_eval/lyft_eval.py): mean AP
over 3D-IoU thresholds 0.5:0.05:0.95, where AP at a threshold is the
mean precision over the score-ranked detections matched greedily one-to-one.
"""
from __future__ import annotations

import numpy as np

from .nuscenes_dataset import NuScenesDataset

IOU_THRESHOLDS = np.arange(0.5, 0.951, 0.05)


class LyftDataset(NuScenesDataset):
    def evaluation(self, det_annos, class_names, **kwargs):
        gt_annos = [{'name': np.asarray(info['gt_names']),
                     'boxes_lidar': np.asarray(info['gt_boxes'])}
                    for info in self.infos]
        return lyft_evaluation(det_annos, gt_annos, class_names)


def lyft_evaluation(det_annos, gt_annos, class_names):
    import jax.numpy as jnp
    from ..ops import iou3d

    ret = {}
    maps = []
    for cls in class_names:
        aps = []
        for th in IOU_THRESHOLDS:
            scores, is_tp, n_gt = [], [], 0
            for det, gt in zip(det_annos, gt_annos):
                gmask = np.asarray([n == cls for n in gt['name']], bool)
                gb = (np.asarray(gt['boxes_lidar'])
                      .reshape(len(gmask), -1)[:, :7][gmask]
                      if len(gmask) else np.zeros((0, 7)))
                n_gt += len(gb)
                dmask = np.asarray([n == cls for n in det['name']], bool)
                db = (np.asarray(det['boxes_lidar'])
                      .reshape(len(dmask), -1)[:, :7][dmask]
                      if len(dmask) else np.zeros((0, 7)))
                ds = np.asarray(det['score'])[dmask]
                if len(db) and len(gb):
                    iou = np.asarray(iou3d.boxes_iou3d(
                        jnp.asarray(db, jnp.float32),
                        jnp.asarray(gb, jnp.float32)))
                else:
                    iou = np.zeros((len(db), len(gb)))
                taken = np.zeros(len(gb), bool)
                for d in np.argsort(-ds):
                    cand = np.where(~taken & (iou[d] >= th))[0] \
                        if len(gb) else np.zeros(0, int)
                    hit = cand.size > 0
                    if hit:
                        taken[cand[np.argmax(iou[d][cand])]] = True
                    scores.append(ds[d])
                    is_tp.append(hit)
            if n_gt == 0:
                continue
            if not scores:
                aps.append(0.0)
                continue
            scores = np.asarray(scores)
            is_tp = np.asarray(is_tp, bool)
            order = np.argsort(-scores)
            tp = np.cumsum(is_tp[order])
            fp = np.cumsum(~is_tp[order])
            recall = tp / n_gt
            precision = tp / np.maximum(tp + fp, 1)
            # standard 101-point AP
            r_grid = np.linspace(0, 1, 101)
            p = np.interp(r_grid, recall, precision, right=0)
            aps.append(float(p.mean()))
        cls_ap = float(np.mean(aps)) if aps else 0.0
        ret[f'{cls}_mAP'] = cls_ap * 100
        maps.append(cls_ap)
    ret['mAP'] = float(np.mean(maps)) * 100 if maps else 0.0
    lines = [f'{k}: {v:.4f}' for k, v in sorted(ret.items())]
    return '\n'.join(lines), ret
