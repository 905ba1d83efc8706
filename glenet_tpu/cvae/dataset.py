"""GLENet CVAE datasets: per-object KITTI gt-database crops with K-fold
splits, occlusion synthesis, geometric aug, and anchor normalization.

Semantics per reference cvae_uncertainty/dataset.py:
  - KittiGtDataset (:118-432): Car (+Van if ENABLE_SIMILAR_TYPE) crops from
    kitti_dbinfos_train.pkl, 10-fold KFold(shuffle, random_state=42) split by
    FOLD_IDX;
  - occlusion aug (:208-303): project the crop and a dense (>1000 pts) donor
    object to a 48x512 range view, mask crop points falling inside the
    donor's convex hull (we use a direct point-in-convex-hull test instead
    of the reference's cv2 rasterization — same membership, no cv2 dep);
  - flip (y), global scale, rotation about the box center, xy shift
    (:344-381);
  - normalization by the Car anchor (3.9, 1.6, 1.56): xy and box center /
    BEV diagonal, z / dz_a, log size ratios (:383-418);
  - resample to exactly 512 points with replacement (:387-397);
  - outputs per object: points (512, 4), gt_boxes (7,) normalized box,
    gt_boxes_input (8,) with (sin h, cos h) (:420-432).

Batches are plain numpy dicts with static shapes: points (B, 512, 4),
gt_boxes (B, 7), gt_boxes_input (B, 8).
"""
from __future__ import annotations

import copy
import pickle
from pathlib import Path

import numpy as np

from ..utils import calibration_kitti

ANCHOR = (3.9, 1.6, 1.56)
RV_WIDTH, RV_HEIGHT = 512, 48
NUM_POINTS = 512


def scan_to_rv(scan, rv_width=RV_WIDTH, rv_height=RV_HEIGHT,
               fov_up_deg=3.0, fov_down_deg=-25.0):
    """(N, 3+) points -> (N, 3) [u, v, range] range-view pixel coords."""
    fov_up = fov_up_deg / 180.0 * np.pi
    fov_down = fov_down_deg / 180.0 * np.pi
    r = np.sqrt((scan[:, :3] ** 2).sum(axis=1))
    with np.errstate(divide='ignore', invalid='ignore'):
        u = 0.5 * (1 - np.arctan(scan[:, 1] / scan[:, 0]) / np.pi) * rv_width
        v = (1 - (np.arcsin(scan[:, 2] / r) + abs(fov_down))
             / (fov_up + abs(fov_down))) * rv_height
    u = np.clip(np.floor(np.nan_to_num(u)), 0, rv_width - 1)
    v = np.clip(np.floor(np.nan_to_num(v)), 0, rv_height - 1)
    return np.stack([u, v, r]).T


def get_road_plane(plane_file):
    with open(plane_file) as f:
        lines = f.readlines()
    plane = np.asarray([float(i) for i in lines[3].split()])
    if plane[1] > 0:
        plane = -plane
    return plane / np.linalg.norm(plane[0:3])


def put_boxes_on_road_planes(gt_boxes, road_plane, calib):
    a, b, c, d = road_plane
    center_cam = calib.lidar_to_rect(gt_boxes[:, 0:3])
    cur_height_cam = (-d - a * center_cam[:, 0] - c * center_cam[:, 2]) / b
    center_cam[:, 1] = cur_height_cam
    cur_lidar_height = calib.rect_to_lidar(center_cam)[:, 2]
    mv_height = gt_boxes[:, 2] - gt_boxes[:, 5] / 2 - cur_lidar_height
    gt_boxes = gt_boxes.copy()
    gt_boxes[:, 2] -= mv_height
    return gt_boxes, mv_height


def points_in_convex_hull_2d(query, hull_pts):
    """query (N, 2) vs the convex hull of hull_pts (M, 2) -> (N,) bool."""
    from scipy.spatial import ConvexHull, QhullError
    try:
        hull = ConvexHull(hull_pts)
    except (QhullError, ValueError):
        return np.zeros(len(query), bool)
    # hull.equations: (F, 3) rows [a, b, c] with a*x + b*y + c <= 0 inside
    eq = hull.equations
    return (query @ eq[:, :2].T + eq[:, 2][None, :] <= 1e-9).all(axis=1)


class KittiGtDataset:
    """Per-object crop dataset for CVAE training/prediction."""

    def __init__(self, dataset_cfg, class_names=('Car',), training=True,
                 root_path=None, logger=None, infos=None):
        self.dataset_cfg = dataset_cfg
        self.training = training
        self.root_path = Path(root_path if root_path is not None
                              else dataset_cfg.DATA_PATH)
        self.logger = logger
        self.enable_similar_type = dataset_cfg.get('ENABLE_SIMILAR_TYPE', False)

        if infos is not None:
            used_infos = list(infos)
        else:
            with open(self.root_path / 'kitti_dbinfos_train.pkl', 'rb') as f:
                db = pickle.load(f)
            used_infos = list(db['Car'])
            if self.enable_similar_type and 'Van' in db:
                used_infos.extend(db['Van'])

        if 'FOLD_IDX' in dataset_cfg:
            from sklearn.model_selection import KFold
            splits = KFold(n_splits=dataset_cfg.get('NUM_FOLDS', 10),
                           shuffle=True, random_state=42)
            fold_idx = dataset_cfg.FOLD_IDX
            train_idx, val_idx = list(splits.split(np.arange(len(used_infos))))[fold_idx]
            sel = train_idx if training else val_idx
            self.infos = [used_infos[i] for i in sel]
        else:
            self.infos = used_infos

        self.dense_gt_infos = [x for x in self.infos
                               if x.get('num_points_in_gt', 0) > 1000]
        self.linear_anneal = 0.0
        self.force_ratio = dataset_cfg.get('FORCE_RATIO', 0.0)
        self.force_num = dataset_cfg.get('FORCE_NUM', 0)
        self.enable_flip = dataset_cfg.get('ENABLE_FLIP', False)
        self.scale_range = dataset_cfg.get('RANDOM_SCALE_RANGE', [1.0, 1.0])
        self.angle_rot_max = dataset_cfg.get('ANGLE_ROT_MAX', 0.0)
        self.pos_shift_max = dataset_cfg.get('POS_SHIFT_MAX', 0.0)
        self.anchor = ANCHOR
        self.num_point_features = 4
        self.rng = np.random.RandomState()

    def __len__(self):
        return len(self.infos)

    def _canonicalize(self, info, points):
        """Hook between occlusion aug and flip/scale (Waymo azimuth
        canonicalization overrides this)."""
        return info, points

    def _frame_key(self, info, index):
        return info['image_idx'], info.get('gt_idx', index)

    def _load_points(self, info):
        path = self.root_path / info['path']
        return np.fromfile(str(path), dtype=np.float32).reshape(-1, 4)

    # -- occlusion synthesis -------------------------------------------------
    def occlude_aug(self, info, points, max_num=99999, min_num=1,
                    max_try_time=5):
        if not self.dense_gt_infos:
            return points
        frame_id = info['image_idx']
        calib_path = self.root_path / f'training/calib/{frame_id}.txt'
        plane_path = self.root_path / f'training/planes/{frame_id}.txt'
        if not (calib_path.exists() and plane_path.exists()):
            return points
        calib = calibration_kitti.Calibration(str(calib_path))
        road_plane = get_road_plane(str(plane_path))

        dense_info = self.dense_gt_infos[self.rng.randint(len(self.dense_gt_infos))]
        dense_points = self._load_points(dense_info)
        dense_gt_box = np.array(dense_info['box3d_lidar'], np.float64).copy()

        # crop points back to the scene frame
        scan = points.copy()
        scan[:, :3] += np.asarray(info['box3d_lidar'][:3])

        # place the donor object closer to the sensor on the same ray
        scale = self.rng.random() * 0.4 + 0.5
        box = np.asarray(info['box3d_lidar'])
        new_c_x = box[0] * scale
        if new_c_x + dense_gt_box[3] / 2 > box[0] - box[3] / 2:
            new_c_x = box[0] - box[3] / 2 - dense_gt_box[3] / 2
            scale = new_c_x / box[0] if box[0] != 0 else scale
        new_c_y = box[1] * scale
        dense_gt_box[0], dense_gt_box[1] = new_c_x, new_c_y
        _, mv_height = put_boxes_on_road_planes(
            dense_gt_box[None], road_plane, calib)
        dense_scan = dense_points.copy()
        dense_scan[:, 0] += new_c_x
        dense_scan[:, 1] += new_c_y
        dense_scan[:, 2] += dense_info['box3d_lidar'][2] - mv_height[0]

        rv_sample = scan_to_rv(scan)
        rv_dense = scan_to_rv(dense_scan)

        sx_min, sx_max = rv_sample[:, 0].min(), rv_sample[:, 0].max()
        sy_min, sy_max = rv_sample[:, 1].min(), rv_sample[:, 1].max()
        dx_min, dx_max = rv_dense[:, 0].min(), rv_dense[:, 0].max()
        dy_min = rv_dense[:, 1].min()

        x_move_min = 0.7 * sx_min + 0.3 * sx_max - dx_max
        x_move_max = 0.3 * sx_min + 0.7 * sx_max - dx_min
        y_move_min = 0.9 * sy_min + 0.1 * sy_max - dy_min
        y_move_max = 0.5 * sy_min + 0.5 * sy_max - dy_min

        rv_d = rv_dense.copy()
        for _ in range(max_try_time + 1):
            x_mv = self.rng.rand() * (x_move_max - x_move_min) + x_move_min
            y_mv = self.rng.rand() * (y_move_max - y_move_min) + y_move_min
            rv_d[:, 0] += x_mv
            rv_d[:, 1] += y_mv
            occluded = points_in_convex_hull_2d(rv_sample[:, :2], rv_d[:, :2])
            reserved = points[~occluded]
            if min_num <= len(reserved) <= max_num:
                return reserved
        return points

    # -- main transform -------------------------------------------------------
    def __getitem__(self, index):
        info = copy.deepcopy(self.infos[index])
        points = self._load_points(info)

        if self.training:
            if (self.force_ratio * self.linear_anneal > self.rng.rand()
                    and points.shape[0] > self.force_num):
                points = self.occlude_aug(info, points, max_num=self.force_num,
                                          min_num=1, max_try_time=20)
            elif points.shape[0] > 10:
                points = self.occlude_aug(info, points, max_num=99999,
                                          min_num=1, max_try_time=5)

        info, points = self._canonicalize(info, points)

        flip_mark = False
        noise_scale = 1.0
        if self.training:
            if self.enable_flip:
                flip_mark = bool(self.rng.rand() < 0.5)
                if flip_mark:
                    points[:, 1] = -points[:, 1]
            noise_scale = self.rng.uniform(self.scale_range[0], self.scale_range[1])
            points[:, :3] *= noise_scale

        if points.shape[0] != 0:
            x_mean, y_mean, z_mean = points[:, :3].mean(axis=0)
        else:
            x_mean = y_mean = z_mean = 0.0

        dxa, dya, dza = self.anchor
        diagonal = np.sqrt(dxa ** 2 + dya ** 2)

        pos_shift = np.zeros(2)
        angle_rot = 0.0
        if self.training:
            angle_rot = (self.rng.rand() - 0.5) / 0.5 * self.angle_rot_max
            pos_shift = (self.rng.rand(2) - 0.5) / 0.5 * self.pos_shift_max
            c, s = np.cos(angle_rot), np.sin(angle_rot)
            rot = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], np.float32)
            points = np.concatenate(
                [points[:, :3] @ rot, points[:, 3:]], axis=1)

        points = points.copy()
        points[:, 0] = (points[:, 0] - x_mean + pos_shift[0]) / diagonal
        points[:, 1] = (points[:, 1] - y_mean + pos_shift[1]) / diagonal
        points[:, 2] = (points[:, 2] - z_mean) / dza

        if points.shape[0] != 0:
            choice = self.rng.choice(points.shape[0], NUM_POINTS, replace=True)
            points = points[choice]
        else:
            points = np.zeros((NUM_POINTS, self.num_point_features),
                              np.float32)

        frame, gid = self._frame_key(info, index)
        out = {
            'points': points.astype(np.float32),   # (512, C)
            'frame_id': frame,
            'gt_id': gid,
        }
        if 'box3d_lidar' not in info:
            return out

        box = np.array(info['box3d_lidar'], np.float64).copy()
        if flip_mark:
            box[6] = -box[6]
        box[:6] *= noise_scale
        box[0] = (-x_mean + pos_shift[0]) / diagonal
        box[1] = (-y_mean + pos_shift[1]) / diagonal
        box[2] = (-z_mean) / dza
        box[3] = np.log(box[3] / dxa)
        box[4] = np.log(box[4] / dya)
        box[5] = np.log(box[5] / dza)
        box[6] = box[6] + angle_rot

        box7 = box[:7].astype(np.float32)
        box8 = np.concatenate(
            [box7[:6], [np.sin(box7[6]), np.cos(box7[6])]]).astype(np.float32)
        out['gt_boxes'] = box7
        out['gt_boxes_input'] = box8
        return out

    def collate(self, items):
        batch = {
            'points': np.stack([it['points'] for it in items]),
            'frame_id': [it['frame_id'] for it in items],
            'gt_id': [it['gt_id'] for it in items],
        }
        if 'gt_boxes' in items[0]:
            batch['gt_boxes'] = np.stack([it['gt_boxes'] for it in items])
            batch['gt_boxes_input'] = np.stack(
                [it['gt_boxes_input'] for it in items])
        return batch

    def iter_batches(self, batch_size, shuffle=True, seed=None, drop_last=True):
        rng = np.random.RandomState(seed)
        order = np.arange(len(self))
        if shuffle:
            rng.shuffle(order)
        for s in range(0, len(order) - (batch_size - 1 if drop_last else 0),
                       batch_size):
            idx = order[s:s + batch_size]
            if len(idx) < batch_size and drop_last:
                break
            yield self.collate([self[i] for i in idx])


def denormalize_box(box7_norm, anchor=ANCHOR):
    """Invert the anchor normalization (for mapping predictions back)."""
    dxa, dya, dza = anchor
    diagonal = np.sqrt(dxa ** 2 + dya ** 2)
    out = np.asarray(box7_norm, np.float64).copy()
    out[..., 0] *= diagonal
    out[..., 1] *= diagonal
    out[..., 2] *= dza
    out[..., 3] = np.exp(out[..., 3]) * dxa
    out[..., 4] = np.exp(out[..., 4]) * dya
    out[..., 5] = np.exp(out[..., 5]) * dza
    return out


WAYMO_ANCHOR = (4.7, 2.1, 1.7)
WAYMO_RV_WIDTH = 2650
WAYMO_RV_HEIGHT = 64


def scan_to_rv_waymo(scan):
    """Waymo range-view projection (reference cvae_uncertainty/dataset.py
    :42-58): 2650x64, fov +30 / -90 deg."""
    fov_up = 30 / 180.0 * np.pi
    fov_down = -90.0 / 180.0 * np.pi
    r = np.sqrt((scan[:, :3] ** 2).sum(axis=1))
    u = 0.5 * (1 - np.arctan(scan[:, 1] / np.clip(scan[:, 0], 1e-6, None))
               / np.pi) * WAYMO_RV_WIDTH
    v = (1 - (np.arcsin(scan[:, 2] / np.clip(r, 1e-6, None)) + abs(fov_down))
         / (fov_up + abs(fov_down))) * WAYMO_RV_HEIGHT
    u = np.clip(np.floor(u), 0, WAYMO_RV_WIDTH - 1)
    v = np.clip(np.floor(v), 0, WAYMO_RV_HEIGHT - 1)
    return np.stack([u, v, r]).T


class WaymoGtDataset(KittiGtDataset):
    """Waymo per-object crop dataset (reference cvae_uncertainty/dataset.py
    :532-880): 'Vehicle' dbinfos, 5-fold KFold(seed 42), 5-dim points
    (x, y, z, intensity, elongation), Waymo vehicle anchor (4.7, 2.1, 1.7),
    range-view occlusion without road-plane adjustment, and azimuth
    canonicalization of each crop before normalization (:806-819)."""

    def __init__(self, dataset_cfg, class_names=('Vehicle',), training=True,
                 root_path=None, logger=None, infos=None):
        self.dataset_cfg = dataset_cfg
        self.training = training
        self.root_path = Path(root_path if root_path is not None
                              else dataset_cfg.DATA_PATH)
        self.logger = logger
        self.enable_similar_type = dataset_cfg.get('ENABLE_SIMILAR_TYPE',
                                                   False)
        if infos is not None:
            used_infos = list(infos)
        else:
            name = dataset_cfg.get(
                'DB_INFO_PATH',
                'waymo_processed_data_v0_5_0_waymo_dbinfos_train_sampled_1.pkl')
            with open(self.root_path / name, 'rb') as f:
                db = pickle.load(f)
            used_infos = list(db['Vehicle'])

        if 'FOLD_IDX' in dataset_cfg:
            from sklearn.model_selection import KFold
            splits = KFold(n_splits=dataset_cfg.get('NUM_FOLDS', 5),
                           shuffle=True, random_state=42)
            fold_idx = dataset_cfg.FOLD_IDX
            train_idx, val_idx = list(
                splits.split(np.arange(len(used_infos))))[fold_idx]
            sel = train_idx if training else val_idx
            self.infos = [used_infos[i] for i in sel]
        else:
            self.infos = used_infos

        self.dense_gt_infos = [x for x in self.infos
                               if x.get('num_points_in_gt', 0) > 1000]
        self.linear_anneal = 0.0
        self.force_ratio = dataset_cfg.get('FORCE_RATIO', 0.0)
        self.force_num = dataset_cfg.get('FORCE_NUM', 0)
        self.enable_flip = dataset_cfg.get('ENABLE_FLIP', False)
        self.scale_range = dataset_cfg.get('RANDOM_SCALE_RANGE', [1.0, 1.0])
        self.angle_rot_max = dataset_cfg.get('ANGLE_ROT_MAX', 0.0)
        self.pos_shift_max = 0.0
        self.anchor = WAYMO_ANCHOR
        self.num_point_features = 5
        self.rng = np.random.RandomState()

    def _load_points(self, info):
        path = self.root_path / info['path']
        return np.fromfile(str(path), dtype=np.float32).reshape(
            -1, self.num_point_features)

    def _frame_key(self, info, index):
        return (f"{info['sequence_name']}#{info['sample_idx']}",
                info.get('gt_idx', index))

    def occlude_aug(self, info, points, max_num=99999, min_num=1,
                    max_try_time=5):
        """Waymo variant (:681-760): donor placed on the crop's ray
        (no road-plane z fixup), occlusion via the Waymo range view."""
        if not self.dense_gt_infos:
            return points
        dense_info = self.dense_gt_infos[
            self.rng.randint(len(self.dense_gt_infos))]
        dense_points = self._load_points(dense_info)
        dense_gt_box = np.array(dense_info['box3d_lidar'], np.float64).copy()

        scan = points.copy()
        box = np.asarray(info['box3d_lidar'])
        scan[:, :3] += box[:3]

        scale = self.rng.random() * 0.4 + 0.5
        new_c_x = box[0] * scale
        if new_c_x + dense_gt_box[3] / 2 > box[0] - box[3] / 2:
            new_c_x = box[0] - box[3] / 2 - dense_gt_box[3] / 2
            scale = new_c_x / box[0] if box[0] != 0 else scale
        new_c_y = box[1] * scale
        dense_scan = dense_points.copy()
        dense_scan[:, 0] += new_c_x
        dense_scan[:, 1] += new_c_y
        dense_scan[:, 2] += box[2]

        rv_sample = scan_to_rv_waymo(scan)
        rv_dense = scan_to_rv_waymo(dense_scan)
        if len(rv_dense) == 0 or len(rv_sample) == 0:
            return points

        sx_min, sx_max = rv_sample[:, 0].min(), rv_sample[:, 0].max()
        sy_min, sy_max = rv_sample[:, 1].min(), rv_sample[:, 1].max()
        dx_min, dx_max = rv_dense[:, 0].min(), rv_dense[:, 0].max()
        dy_min = rv_dense[:, 1].min()
        x_move_min = 0.7 * sx_min + 0.3 * sx_max - dx_max
        x_move_max = 0.3 * sx_min + 0.7 * sx_max - dx_min
        y_move_min = 0.9 * sy_min + 0.1 * sy_max - dy_min
        y_move_max = 0.5 * sy_min + 0.5 * sy_max - dy_min

        rv_d = rv_dense.copy()
        for _ in range(max_try_time + 1):
            x_mv = self.rng.rand() * (x_move_max - x_move_min) + x_move_min
            y_mv = self.rng.rand() * (y_move_max - y_move_min) + y_move_min
            rv_d[:, 0] += x_mv
            rv_d[:, 1] += y_mv
            occluded = points_in_convex_hull_2d(rv_sample[:, :2],
                                                rv_d[:, :2])
            reserved = points[~occluded]
            if min_num <= len(reserved) <= max_num:
                return reserved
        return points

    def _canonicalize(self, info, points):
        """Azimuth canonicalization (reference :806-819): rotate the crop
        so the object's azimuth falls in a quarter-period canonical range.
        Because the normalization is points-mean-centred, rotating the
        box-relative crop about its own frame is equivalent to the
        reference's scene-frame rotation."""
        box = np.asarray(info['box3d_lidar'], np.float64).copy()
        azimuth = np.arctan2(box[0], box[1])
        new_azimuth = (azimuth + np.pi / 4) % (np.pi / 2) - np.pi / 4
        trans_angle = new_azimuth - azimuth
        c, s = np.cos(trans_angle), np.sin(trans_angle)
        rot = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], points.dtype)
        points = points.copy()
        points[:, :3] = points[:, :3] @ rot
        box[6] = box[6] + trans_angle
        info['box3d_lidar'] = box
        return info, points
