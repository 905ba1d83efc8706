"""Official KITTI AP evaluation (R11 + R40, bbox/BEV/3D/AOS).

Re-implementation of the reference's numba evaluator
(pcdet/datasets/kitti/kitti_object_eval_python/eval.py) with identical
semantics:
  - clean_data difficulty gating (:29-84): MIN_HEIGHT (40, 25, 25) px,
    MAX_OCCLUSION (0, 1, 2), MAX_TRUNCATION (0.15, 0.3, 0.5); neighbor
    classes (Van for Car, Person_sitting for Pedestrian) ignored; small
    detections ignored;
  - greedy per-gt matching (:157-276): threshold stage picks the max-score
    overlapping det; PR stage picks the max-overlap real det, falling back
    to the first ignored det; DontCare boxes absorb unmatched detections
    (metric 0, criterion-0 overlap);
  - 41-point threshold selection from matched tp scores (:9-27);
  - precision right-max smoothing; R11 = mean over every 4th point,
    R40 = mean over points 1..40 (:556-568).

TPU-native twist: the sequential matcher runs as a compiled JAX kernel over
padded (frames, dets, gts) arrays — vmapped over the 41 thresholds and
lax.scan'd over frames — instead of numba JIT (not available here, and pure
python would take minutes per epoch).  IoU matrices come from our rotated-
overlap op (camera-frame BEV boxes [x, z, l, w, ry]).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import iou3d

CLASS_NAMES = ['car', 'pedestrian', 'cyclist', 'van', 'person_sitting', 'truck']
MIN_HEIGHT = [40, 25, 25]
MAX_OCCLUSION = [0, 1, 2]
MAX_TRUNCATION = [0.15, 0.3, 0.5]
N_SAMPLE_PTS = 41
_NO_SCORE = -1e9


# ---------------------------------------------------------------------------
# host-side preparation
# ---------------------------------------------------------------------------

def clean_data(gt_anno, dt_anno, current_class: int, difficulty: int):
    """Per-frame ignore flags (reference eval.py:29-84).

    Returns (num_valid_gt, ignored_gt (G,), ignored_dt (D,), dc_bboxes).
    Flags: 0 = counted, 1 = ignored, -1 = not this class.
    """
    cls_name = CLASS_NAMES[current_class]
    ignored_gt = []
    num_valid = 0
    for i in range(len(gt_anno['name'])):
        name = gt_anno['name'][i].lower()
        height = gt_anno['bbox'][i, 3] - gt_anno['bbox'][i, 1]
        if name == cls_name:
            valid_class = 1
        elif cls_name == 'pedestrian' and name == 'person_sitting':
            valid_class = 0
        elif cls_name == 'car' and name == 'van':
            valid_class = 0
        else:
            valid_class = -1
        ignore = (gt_anno['occluded'][i] > MAX_OCCLUSION[difficulty]
                  or gt_anno['truncated'][i] > MAX_TRUNCATION[difficulty]
                  or height <= MIN_HEIGHT[difficulty])
        if valid_class == 1 and not ignore:
            ignored_gt.append(0)
            num_valid += 1
        elif valid_class == 0 or (ignore and valid_class == 1):
            ignored_gt.append(1)
        else:
            ignored_gt.append(-1)
    dc_bboxes = gt_anno['bbox'][gt_anno['name'] == 'DontCare']

    ignored_dt = []
    for i in range(len(dt_anno['name'])):
        height = abs(dt_anno['bbox'][i, 3] - dt_anno['bbox'][i, 1])
        if height < MIN_HEIGHT[difficulty]:
            ignored_dt.append(1)
        elif dt_anno['name'][i].lower() == cls_name:
            ignored_dt.append(0)
        else:
            ignored_dt.append(-1)
    return (num_valid, np.array(ignored_gt, np.int64),
            np.array(ignored_dt, np.int64), np.asarray(dc_bboxes, np.float64))


def image_box_overlap(boxes, query_boxes, criterion=-1):
    """Vectorized 2D box overlap (reference :87-114). (N, 4) x (K, 4)."""
    n, k = boxes.shape[0], query_boxes.shape[0]
    if n == 0 or k == 0:
        return np.zeros((n, k))
    iw = (np.minimum(boxes[:, None, 2], query_boxes[None, :, 2])
          - np.maximum(boxes[:, None, 0], query_boxes[None, :, 0]))
    ih = (np.minimum(boxes[:, None, 3], query_boxes[None, :, 3])
          - np.maximum(boxes[:, None, 1], query_boxes[None, :, 1]))
    inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
    inter = np.where((iw > 0) & (ih > 0), inter, 0.0)
    area_b = ((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]))
    area_q = ((query_boxes[:, 2] - query_boxes[:, 0])
              * (query_boxes[:, 3] - query_boxes[:, 1]))
    if criterion == -1:
        ua = area_b[:, None] + area_q[None, :] - inter
    elif criterion == 0:
        ua = np.broadcast_to(area_b[:, None], inter.shape)
    elif criterion == 1:
        ua = np.broadcast_to(area_q[None, :], inter.shape)
    else:
        ua = np.ones_like(inter)
    with np.errstate(divide='ignore', invalid='ignore'):
        out = np.where(ua > 0, inter / ua, 0.0)
    return out


def _camera_bev_boxes(annos):
    """annos -> (N, 5) [x_cam, z_cam, l, w, ry] rotated BEV boxes."""
    loc = annos['location'][:, [0, 2]]
    dims = annos['dimensions'][:, [0, 2]]
    rots = annos['rotation_y'][..., None]
    return np.concatenate([loc, dims, rots], axis=1)


def _bev_overlap(gt_bev, dt_bev):
    """Rotated overlap AREA matrix via our TPU op ((N, 5) camera boxes)."""
    def to7(b):
        out = np.zeros((b.shape[0], 7), np.float32)
        out[:, 0] = b[:, 0]
        out[:, 1] = b[:, 1]
        out[:, 3] = b[:, 2]
        out[:, 4] = b[:, 3]
        out[:, 6] = b[:, 4]
        return out
    if gt_bev.shape[0] == 0 or dt_bev.shape[0] == 0:
        return np.zeros((gt_bev.shape[0], dt_bev.shape[0]))
    return np.asarray(iou3d.boxes_overlap_bev(
        jnp.asarray(to7(gt_bev)), jnp.asarray(to7(dt_bev)))).astype(np.float64)


def bev_box_overlap(gt_annos_f, dt_annos_f):
    """Rotated BEV IoU (camera frame)."""
    g = _camera_bev_boxes(gt_annos_f)
    d = _camera_bev_boxes(dt_annos_f)
    inter = _bev_overlap(g, d)
    area_g = (g[:, 2] * g[:, 3])[:, None]
    area_d = (d[:, 2] * d[:, 3])[None, :]
    with np.errstate(divide='ignore', invalid='ignore'):
        return np.where(inter > 0, inter / (area_g + area_d - inter), 0.0)


def d3_box_overlap(gt_annos_f, dt_annos_f):
    """3D IoU in camera frame (y is the bottom of the box, reference
    d3_box_overlap_kernel :120-148)."""
    g_bev = _camera_bev_boxes(gt_annos_f)
    d_bev = _camera_bev_boxes(dt_annos_f)
    rinc = _bev_overlap(g_bev, d_bev)
    g_loc, g_dim = gt_annos_f['location'], gt_annos_f['dimensions']
    d_loc, d_dim = dt_annos_f['location'], dt_annos_f['dimensions']
    # dims order (l, h, w): h = dims[:, 1]; y grows downward, y = bottom
    iw = (np.minimum(g_loc[:, None, 1], d_loc[None, :, 1])
          - np.maximum(g_loc[:, None, 1] - g_dim[:, None, 1],
                       d_loc[None, :, 1] - d_dim[None, :, 1]))
    vol_g = np.prod(g_dim, axis=1)[:, None]
    vol_d = np.prod(d_dim, axis=1)[None, :]
    inter = np.clip(iw, 0, None) * rinc
    inter = np.where(iw > 0, inter, 0.0)
    with np.errstate(divide='ignore', invalid='ignore'):
        return np.where(inter > 0, inter / (vol_g + vol_d - inter), 0.0)


def get_thresholds(scores, num_gt, num_sample_pts=N_SAMPLE_PTS):
    scores = np.sort(scores)[::-1]
    current_recall = 0.0
    thresholds = []
    for i, score in enumerate(scores):
        l_recall = (i + 1) / num_gt
        r_recall = (i + 2) / num_gt if i < len(scores) - 1 else l_recall
        if ((r_recall - current_recall) < (current_recall - l_recall)
                and i < len(scores) - 1):
            continue
        thresholds.append(score)
        current_recall += 1 / (num_sample_pts - 1.0)
    return np.array(thresholds)


# ---------------------------------------------------------------------------
# compiled greedy matcher
# ---------------------------------------------------------------------------

def _match_single(ov, gt_ig, det_ig, det_scores, gt_alpha, det_alpha,
                  dc_ov, min_overlap, thresh, compute_fp: bool,
                  metric0: bool):
    """Greedy matcher for one frame (padded shapes).

    ov: (D, G) overlaps; gt_ig (G,), det_ig (D,) in {-1, 0, 1} (-1 also for
    padding); det_scores (D,); dc_ov (D, C) det-vs-dontcare criterion-0
    overlap (zeros when unused); returns (tp, fp, fn, similarity,
    tp_scores (G,) with _NO_SCORE fill).
    """
    d = ov.shape[0]
    g = ov.shape[1]
    if d == 0:  # no detections in the whole batch (static shape)
        fn = (gt_ig == 0).sum().astype(jnp.int32)
        sim = jnp.float32(-1.0 if compute_fp else 0.0)
        return (jnp.int32(0), jnp.int32(0), fn, sim,
                jnp.full((g,), _NO_SCORE, jnp.float32))
    ignored_thresh = (det_scores < thresh) if compute_fp else jnp.zeros(d, bool)
    det_usable = (det_ig != -1) & ~ignored_thresh

    def gt_body(i, state):
        assigned, tp, fn, tp_scores, sim_sum = state
        gi = gt_ig[i]
        cand = det_usable & ~assigned & (ov[:, i] > min_overlap)
        if compute_fp:
            real = cand & (det_ig == 0)
            any_real = real.any()
            ov_masked = jnp.where(real, ov[:, i], -1.0)
            j_real = jnp.argmax(ov_masked)
            ignored_cand = cand & (det_ig == 1)
            any_ignored = ignored_cand.any()
            j_ign = jnp.argmax(ignored_cand)          # first True
            has_match = any_real | any_ignored
            j = jnp.where(any_real, j_real, j_ign)
        else:
            sc_masked = jnp.where(cand, det_scores, _NO_SCORE)
            has_match = cand.any()
            j = jnp.argmax(sc_masked)

        active = gt_ig[i] != -1
        has_match = has_match & active
        is_tp = has_match & (gi == 0) & (det_ig[j] == 0)
        is_ignored_match = has_match & ~is_tp
        is_fn = active & ~has_match & (gi == 0)

        assigned = jnp.where(has_match & (is_tp | is_ignored_match),
                             assigned.at[j].set(True), assigned)
        tp = tp + is_tp.astype(jnp.int32)
        fn = fn + is_fn.astype(jnp.int32)
        tp_scores = tp_scores.at[i].set(
            jnp.where(is_tp, det_scores[j], _NO_SCORE))
        sim = (1.0 + jnp.cos(gt_alpha[i] - det_alpha[j])) / 2.0
        sim_sum = sim_sum + jnp.where(is_tp, sim, 0.0)
        return assigned, tp, fn, tp_scores, sim_sum

    init = (jnp.zeros(d, bool), jnp.int32(0), jnp.int32(0),
            jnp.full((g,), _NO_SCORE, jnp.float32), jnp.float32(0.0))
    assigned, tp, fn, tp_scores, sim_sum = jax.lax.fori_loop(
        0, g, gt_body, init)

    if not compute_fp:
        return tp, jnp.int32(0), fn, jnp.float32(0.0), tp_scores

    fp_mask = ~assigned & (det_ig == 0) & ~ignored_thresh
    fp = fp_mask.sum().astype(jnp.int32)
    if metric0:
        stuffed = fp_mask & (dc_ov > min_overlap).any(axis=1)
        fp = fp - stuffed.sum().astype(jnp.int32)
    similarity = jnp.where((tp > 0) | (fp > 0), sim_sum, -1.0)
    return tp, fp, fn, similarity, tp_scores


@functools.partial(jax.jit, static_argnames=('metric0',))
def _stage1_all_frames(ov, gt_ig, det_ig, det_scores, gt_alpha, det_alpha,
                       min_overlap, metric0: bool):
    """Threshold-collection pass over all frames: (F, ...) batched."""
    def one(args):
        o, gi, di, ds, ga, da = args
        dc = jnp.zeros((o.shape[0], 1))
        return _match_single(o, gi, di, ds, ga, da, dc, min_overlap,
                             0.0, False, metric0)
    return jax.lax.map(one, (ov, gt_ig, det_ig, det_scores, gt_alpha,
                             det_alpha))


@functools.partial(jax.jit, static_argnames=('metric0',))
def _stage2_all_frames(ov, gt_ig, det_ig, det_scores, gt_alpha, det_alpha,
                       dc_ov, min_overlap, thresholds, metric0: bool):
    """PR pass: per frame x per threshold tp/fp/fn/similarity, summed over
    frames. Returns (T, 4) pr array."""
    def one_frame(carry, args):
        o, gi, di, ds, ga, da, dc = args

        def one_thresh(t):
            tp, fp, fn, sim, _ = _match_single(
                o, gi, di, ds, ga, da, dc, min_overlap, t, True, metric0)
            return jnp.stack([tp.astype(jnp.float32), fp.astype(jnp.float32),
                              fn.astype(jnp.float32),
                              jnp.where(sim != -1.0, sim, 0.0)])

        pr = jax.vmap(one_thresh)(thresholds)          # (T, 4)
        return carry + pr, None

    t = thresholds.shape[0]
    init = jnp.zeros((t, 4), jnp.float32)
    total, _ = jax.lax.scan(one_frame, init,
                            (ov, gt_ig, det_ig, det_scores, gt_alpha,
                             det_alpha, dc_ov))
    return total


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def _pad_stack(arrays, max_len, fill, dtype=np.float32):
    out = np.full((len(arrays), max_len, *np.shape(arrays[0])[1:]), fill,
                  dtype)
    for i, a in enumerate(arrays):
        if len(a):
            out[i, :len(a)] = a
    return out


def eval_class(gt_annos, dt_annos, current_class: int, difficulty: int,
               metric: int, min_overlap: float, compute_aos=False):
    """One (class, difficulty, metric, overlap) cell. Returns dict with
    precision/recall/aos arrays of length N_SAMPLE_PTS."""
    f = len(gt_annos)
    assert f == len(dt_annos)

    cleaned = [clean_data(gt_annos[i], dt_annos[i], current_class, difficulty)
               for i in range(f)]
    num_valid_gt = sum(c[0] for c in cleaned)

    overlaps = []
    for i in range(f):
        if metric == 0:
            ov = image_box_overlap(dt_annos[i]['bbox'], gt_annos[i]['bbox'])
        elif metric == 1:
            ov = bev_box_overlap(gt_annos[i], dt_annos[i]).T
        else:
            ov = d3_box_overlap(gt_annos[i], dt_annos[i]).T
        overlaps.append(ov.astype(np.float32))          # (D, G)

    gmax = max(max((o.shape[1] for o in overlaps), default=1), 1)
    dmax = max(max((o.shape[0] for o in overlaps), default=1), 1)
    cmax = max(max((len(c[3]) for c in cleaned), default=1), 1)

    ov_pad = np.zeros((f, dmax, gmax), np.float32)
    for i, o in enumerate(overlaps):
        ov_pad[i, :o.shape[0], :o.shape[1]] = o
    gt_ig = _pad_stack([c[1] for c in cleaned], gmax, -1, np.int32)
    det_ig = _pad_stack([c[2] for c in cleaned], dmax, -1, np.int32)
    det_scores = _pad_stack([dt_annos[i]['score'] for i in range(f)],
                            dmax, _NO_SCORE)
    gt_alpha = _pad_stack([gt_annos[i]['alpha'] for i in range(f)], gmax, 0.0)
    det_alpha = _pad_stack([dt_annos[i]['alpha'] for i in range(f)], dmax, 0.0)

    # dontcare overlaps (criterion 0: intersection / det area), metric 0 only
    dc_ov = np.zeros((f, dmax, cmax), np.float32)
    if metric == 0:
        for i in range(f):
            dc = cleaned[i][3]
            if len(dc):
                o = image_box_overlap(dt_annos[i]['bbox'], dc, criterion=0)
                dc_ov[i, :o.shape[0], :o.shape[1]] = o

    # stage 1: collect tp scores -> thresholds
    _, _, _, _, tp_scores = _stage1_all_frames(
        jnp.asarray(ov_pad), jnp.asarray(gt_ig), jnp.asarray(det_ig),
        jnp.asarray(det_scores), jnp.asarray(gt_alpha),
        jnp.asarray(det_alpha), min_overlap, metric == 0)
    tp_scores = np.asarray(tp_scores).reshape(-1)
    tp_scores = tp_scores[tp_scores > _NO_SCORE / 2]
    if num_valid_gt == 0 or len(tp_scores) == 0:
        z = np.zeros(N_SAMPLE_PTS)
        return {'precision': z, 'recall': z.copy(), 'orientation': z.copy()}
    thresholds = get_thresholds(tp_scores, num_valid_gt)

    # stage 2: PR curves
    pr = np.asarray(_stage2_all_frames(
        jnp.asarray(ov_pad), jnp.asarray(gt_ig), jnp.asarray(det_ig),
        jnp.asarray(det_scores), jnp.asarray(gt_alpha),
        jnp.asarray(det_alpha), jnp.asarray(dc_ov), min_overlap,
        jnp.asarray(thresholds, jnp.float32), metric == 0))

    t = len(thresholds)
    precision = np.zeros(N_SAMPLE_PTS)
    recall = np.zeros(N_SAMPLE_PTS)
    aos = np.zeros(N_SAMPLE_PTS)
    with np.errstate(divide='ignore', invalid='ignore'):
        precision[:t] = pr[:, 0] / np.maximum(pr[:, 0] + pr[:, 1], 1e-9)
        recall[:t] = pr[:, 0] / np.maximum(pr[:, 0] + pr[:, 2], 1e-9)
        if compute_aos:
            aos[:t] = pr[:, 3] / np.maximum(pr[:, 0] + pr[:, 1], 1e-9)
    # right-max smoothing
    for i in range(N_SAMPLE_PTS):
        precision[i] = precision[i:].max()
        recall[i] = recall[i:].max()
        if compute_aos:
            aos[i] = aos[i:].max()
    return {'precision': precision, 'recall': recall, 'orientation': aos}


def get_mAP_R11(prec):
    return sum(prec[..., i] for i in range(0, N_SAMPLE_PTS, 4)) / 11 * 100


def get_mAP_R40(prec):
    return sum(prec[..., i] for i in range(1, N_SAMPLE_PTS)) / 40 * 100


# official overlap thresholds [hard, loose][metric bbox/bev/3d][class]
_OVERLAP_0_7 = np.array([[0.7, 0.5, 0.5, 0.7, 0.5, 0.7]] * 3)
_OVERLAP_0_5 = np.array([[0.7, 0.5, 0.5, 0.7, 0.5, 0.5],
                         [0.5, 0.25, 0.25, 0.5, 0.25, 0.5],
                         [0.5, 0.25, 0.25, 0.5, 0.25, 0.5]])
_MIN_OVERLAPS = np.stack([_OVERLAP_0_7, _OVERLAP_0_5], axis=0)  # (2, 3, 6)

_NAME_TO_CLASS = {'Car': 0, 'Pedestrian': 1, 'Cyclist': 2, 'Van': 3,
                  'Person_sitting': 4, 'Truck': 5}


def get_official_eval_result(gt_annos, dt_annos, current_classes):
    """Returns (result_str, ret_dict) like the reference (:639-746).

    ret_dict keys: '{cls}_3d/easy_R40' etc, plus R11 variants.
    """
    if not isinstance(current_classes, (list, tuple)):
        current_classes = [current_classes]
    class_ids = [_NAME_TO_CLASS[c] if isinstance(c, str) else c
                 for c in current_classes]
    class_names = {v: k for k, v in _NAME_TO_CLASS.items()}

    compute_aos = False
    for anno in dt_annos:
        if anno['alpha'].shape[0] != 0:
            compute_aos = anno['alpha'][0] != -10
            break

    result = ''
    ret_dict = {}
    for cls_id in class_ids:
        name = class_names[cls_id]
        for oi in range(2):  # 0: strict overlaps, 1: loose
            table = {}
            for metric, mname in [(0, 'bbox'), (1, 'bev'), (2, '3d')]:
                mo = _MIN_OVERLAPS[oi, metric, cls_id]
                r11, r40, aos11, aos40 = [], [], [], []
                for diff in (0, 1, 2):
                    cell = eval_class(gt_annos, dt_annos, cls_id, diff,
                                      metric, mo, compute_aos=compute_aos)
                    r11.append(get_mAP_R11(cell['precision']))
                    r40.append(get_mAP_R40(cell['precision']))
                    if compute_aos and metric == 0:
                        aos11.append(get_mAP_R11(cell['orientation']))
                        aos40.append(get_mAP_R40(cell['orientation']))
                table[mname] = (r11, r40)
                if compute_aos and metric == 0:
                    table['aos'] = (aos11, aos40)

            mo_str = ', '.join(f'{_MIN_OVERLAPS[oi, m, cls_id]:.2f}'
                               for m in range(3))
            result += f'{name} AP@{mo_str}:\n'
            for mname in ('bbox', 'bev', '3d', 'aos'):
                if mname not in table:
                    continue
                r11, r40 = table[mname]
                result += (f'{mname:4s} AP:{r11[0]:.4f}, {r11[1]:.4f}, '
                           f'{r11[2]:.4f}\n')
            result += f'{name} AP_R40@{mo_str}:\n'
            for mname in ('bbox', 'bev', '3d', 'aos'):
                if mname not in table:
                    continue
                r11, r40 = table[mname]
                result += (f'{mname:4s} AP:{r40[0]:.4f}, {r40[1]:.4f}, '
                           f'{r40[2]:.4f}\n')

            if oi == 0:
                for di, dn in enumerate(('easy', 'moderate', 'hard')):
                    for mname, key in (('3d', '3d'), ('bev', 'bev'),
                                       ('bbox', 'image')):
                        ret_dict[f'{name}_{key}/{dn}_R40'] = table[mname][1][di]
                        ret_dict[f'{name}_{key}/{dn}_R11'] = table[mname][0][di]
                    if 'aos' in table:
                        ret_dict[f'{name}_aos/{dn}_R40'] = table['aos'][1][di]
    return result, ret_dict
