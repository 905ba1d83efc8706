"""Golden parity: run the REFERENCE's pure-torch utilities (loaded from
/root/reference with native deps stubbed) against our JAX implementations
on identical random inputs.  This is the strongest cross-check available
without trained weights."""
import jax.numpy as jnp
import numpy as np
import pytest

from reference_loader import load_reference_utils

ref = load_reference_utils()
pytestmark = pytest.mark.skipif(ref is None, reason='reference unavailable')

if ref is not None:
    import torch


def rand_boxes(rng, n, with_extra=0):
    b = np.zeros((n, 7 + with_extra), np.float32)
    b[:, 0:3] = rng.uniform(-40, 40, (n, 3))
    b[:, 3:6] = rng.uniform(0.5, 5, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    if with_extra:
        b[:, 7:] = rng.uniform(-1, 1, (n, with_extra))
    return b


def test_residual_coder_encode_decode(rng):
    from glenet_tpu.utils.box_coder import ResidualCoder
    ours = ResidualCoder()
    theirs = ref['box_coder_utils'].ResidualCoder()
    boxes = rand_boxes(rng, 64)
    anchors = rand_boxes(rng, 64)
    want = theirs.encode_torch(torch.tensor(boxes.copy()),
                               torch.tensor(anchors.copy())).numpy()
    got = np.asarray(ours.encode(jnp.asarray(boxes), jnp.asarray(anchors)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    enc = rng.randn(64, 7).astype(np.float32) * 0.2
    want = theirs.decode_torch(torch.tensor(enc.copy()),
                               torch.tensor(anchors.copy())).numpy()
    got = np.asarray(ours.decode(jnp.asarray(enc), jnp.asarray(anchors)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_residual_coder_sincos(rng):
    from glenet_tpu.utils.box_coder import ResidualCoder
    ours = ResidualCoder(encode_angle_by_sincos=True)
    theirs = ref['box_coder_utils'].ResidualCoder(encode_angle_by_sincos=True)
    boxes = rand_boxes(rng, 32)
    anchors = rand_boxes(rng, 32)
    want = theirs.encode_torch(torch.tensor(boxes.copy()),
                               torch.tensor(anchors.copy())).numpy()
    got = np.asarray(ours.encode(jnp.asarray(boxes), jnp.asarray(anchors)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_focal_loss_parity(rng):
    from glenet_tpu.utils import losses
    logits = rng.randn(2, 32, 3).astype(np.float32) * 3
    targets = (rng.rand(2, 32, 3) > 0.7).astype(np.float32)
    weights = rng.rand(2, 32).astype(np.float32)
    theirs = ref['loss_utils'].SigmoidFocalClassificationLoss()
    want = theirs(torch.tensor(logits), torch.tensor(targets),
                  torch.tensor(weights)).numpy()
    got = np.asarray(losses.sigmoid_focal_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(weights)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_smooth_l1_parity(rng):
    from glenet_tpu.utils import losses
    preds = rng.randn(2, 32, 7).astype(np.float32)
    targets = rng.randn(2, 32, 7).astype(np.float32)
    targets[0, 3] = np.nan  # nan-target masking path
    weights = rng.rand(2, 32).astype(np.float32)
    cw = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.5]
    theirs = ref['loss_utils'].WeightedSmoothL1Loss(code_weights=cw)
    theirs.code_weights = theirs.code_weights.cpu() \
        if hasattr(theirs.code_weights, 'cpu') else theirs.code_weights
    want = theirs(torch.tensor(preds), torch.tensor(targets),
                  torch.tensor(weights)).numpy()
    got = np.asarray(losses.weighted_smooth_l1(
        jnp.asarray(preds), jnp.asarray(targets), jnp.asarray(weights),
        code_weights=cw))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_corner_loss_parity(rng):
    from glenet_tpu.utils import losses
    pred = rand_boxes(rng, 16)
    gt = pred + rng.uniform(-0.3, 0.3, pred.shape).astype(np.float32)
    want = ref['loss_utils'].get_corner_loss_lidar(
        torch.tensor(pred.copy()), torch.tensor(gt.copy())).numpy()
    got = np.asarray(losses.corner_loss_lidar(
        jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_boxes_to_corners_parity(rng):
    from glenet_tpu.utils import box_utils as ours
    boxes = rand_boxes(rng, 16)
    want = ref['box_utils'].boxes_to_corners_3d(
        torch.tensor(boxes.copy())).numpy()
    got = np.asarray(ours.boxes_to_corners_3d(jnp.asarray(boxes)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_nearest_bev_iou_parity(rng):
    from glenet_tpu.utils import box_utils as ours
    a = rand_boxes(rng, 24)
    b = rand_boxes(rng, 16)
    want = ref['box_utils'].boxes3d_nearest_bev_iou(
        torch.tensor(a.copy()), torch.tensor(b.copy())).numpy()
    got = np.asarray(ours.boxes3d_nearest_bev_iou(
        jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_limit_period_parity(rng):
    from glenet_tpu.utils import common
    vals = rng.uniform(-10, 10, 100).astype(np.float32)
    want = ref['common_utils'].limit_period(
        torch.tensor(vals), offset=0.5, period=2 * np.pi).numpy()
    got = np.asarray(common.limit_period(jnp.asarray(vals)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_lidar_camera_conversion_parity(rng):
    from glenet_tpu.utils import box_utils as ours
    from glenet_tpu.utils.calibration_kitti import dummy_calibration
    calib = dummy_calibration()
    boxes = rand_boxes(rng, 12)
    want = ref['box_utils'].boxes3d_lidar_to_kitti_camera(
        boxes.copy(), calib)
    got = ours.boxes3d_lidar_to_kitti_camera(boxes.copy(), calib)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    back = ours.boxes3d_kitti_camera_to_lidar(got.astype(np.float32), calib)
    ref_back = ref['box_utils'].boxes3d_kitti_camera_to_lidar(
        want.astype(np.float32), calib)
    np.testing.assert_allclose(back, ref_back, rtol=1e-4, atol=1e-4)


def test_kl_label_loss_parity(rng):
    """Full KLD regression loss vs a torch transcription of
    anchor_head_kl_label.py:131-221 on identical tensors."""
    from glenet_tpu.models import anchor_heads
    B, N, C = 2, 64, 7
    box_preds = rng.randn(B, N, C).astype(np.float32) * 0.1
    std_preds = rng.randn(B, N, C).astype(np.float32)
    targets = rng.randn(B, N, C).astype(np.float32) * 0.1
    labels = (rng.rand(B, N) < 0.3).astype(np.int32)
    unc = np.where(labels[..., None] > 0,
                   rng.uniform(0.01, 1, (B, N, C)), 0).astype(np.float32)

    # ours
    got, _ = anchor_heads.reg_loss_kl_label(
        jnp.asarray(box_preds), jnp.asarray(std_preds), jnp.asarray(targets),
        jnp.asarray(labels), jnp.asarray(unc))

    # torch transcription
    t = torch
    bp, sp, tg = t.tensor(box_preds), t.tensor(std_preds.copy()), t.tensor(targets)
    lab = t.tensor(labels)
    positives = lab > 0
    reg_w = positives.float()
    reg_w = reg_w / t.clamp(positives.sum(1, keepdim=True).float(), min=1.0)
    label_var_log = t.log(t.tensor(unc) + 1e-10)
    sp[sp < -50] = -50
    sin_p = t.cat([bp[..., :6],
                   t.sin(bp[..., 6:7]) * t.cos(tg[..., 6:7])], -1)
    sin_t = t.cat([tg[..., :6],
                   t.cos(bp[..., 6:7]) * t.sin(tg[..., 6:7])], -1)
    loss_fn = ref['loss_utils'].WeightedSmoothL1Loss()
    l1 = loss_fn(sin_p, sin_t, weights=reg_w)
    src = (t.exp(-sp) * l1).sum() / B
    square = (t.exp(label_var_log - sp) * reg_w.unsqueeze(-1)).sum() / B
    logt = (-0.5 * (label_var_log - sp) * reg_w.unsqueeze(-1)).sum() / B
    want = float(src + square + logt)
    np.testing.assert_allclose(float(got) / 1.0, want, rtol=1e-3)
