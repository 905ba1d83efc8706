import jax.numpy as jnp
import numpy as np

from glenet_tpu.utils import losses


def test_sigmoid_bce_matches_naive():
    logits = np.linspace(-8, 8, 33, dtype=np.float32)
    targets = (np.arange(33) % 2).astype(np.float32)
    got = np.asarray(losses.sigmoid_bce_with_logits(
        jnp.asarray(logits), jnp.asarray(targets)))
    p = 1 / (1 + np.exp(-logits))
    want = -(targets * np.log(p + 1e-12) + (1 - targets) * np.log(1 - p + 1e-12))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_focal_loss_shape_and_weighting(rng):
    logits = rng.randn(2, 10, 3).astype(np.float32)
    targets = np.zeros((2, 10, 3), np.float32)
    targets[0, 0, 1] = 1
    weights = np.ones((2, 10), np.float32)
    out = np.asarray(losses.sigmoid_focal_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(weights)))
    assert out.shape == (2, 10, 3)
    # zero weights zero the loss
    out0 = np.asarray(losses.sigmoid_focal_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.zeros((2, 10))))
    assert np.abs(out0).max() == 0


def test_focal_loss_easy_example_downweighted():
    # well-classified positive (large logit) should have tiny loss vs
    # misclassified positive
    t = jnp.ones((1, 1, 1))
    w = jnp.ones((1, 1))
    easy = float(losses.sigmoid_focal_loss(jnp.full((1, 1, 1), 6.0), t, w).sum())
    hard = float(losses.sigmoid_focal_loss(jnp.full((1, 1, 1), -6.0), t, w).sum())
    assert hard > 100 * easy


def test_smooth_l1_knee():
    beta = 1.0 / 9.0
    diffs = np.array([0.0, beta / 2, beta, 1.0], np.float32)
    got = np.asarray(losses.smooth_l1(jnp.asarray(diffs), beta))
    want = np.where(np.abs(diffs) < beta,
                    0.5 * diffs ** 2 / beta, np.abs(diffs) - 0.5 * beta)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_weighted_smooth_l1_nan_targets_ignored(rng):
    preds = rng.randn(1, 4, 7).astype(np.float32)
    targets = preds.copy() + 1.0
    targets[0, 2] = np.nan
    out = np.asarray(losses.weighted_smooth_l1(
        jnp.asarray(preds), jnp.asarray(targets), jnp.ones((1, 4))))
    assert np.isfinite(out).all()
    assert np.abs(out[0, 2]).max() == 0


def test_code_weights_applied(rng):
    preds = jnp.zeros((1, 2, 7))
    targets = jnp.ones((1, 2, 7)) * 2  # |diff| = 2 -> linear regime
    cw = [1, 1, 1, 1, 1, 1, 0.5]
    out = np.asarray(losses.weighted_smooth_l1(preds, targets, jnp.ones((1, 2)),
                                               code_weights=cw))
    assert abs(out[0, 0, 6] - (1.0 - 0.5 / 9)) < 1e-5  # smooth_l1(1.0)
    assert abs(out[0, 0, 0] - (2.0 - 0.5 / 9)) < 1e-5  # smooth_l1(2.0)


def test_weighted_cross_entropy():
    logits = jnp.asarray([[[10.0, -10.0], [-10.0, 10.0]]])
    one_hot = jnp.asarray([[[1.0, 0.0], [1.0, 0.0]]])
    w = jnp.ones((1, 2))
    out = np.asarray(losses.weighted_cross_entropy(logits, one_hot, w))
    assert out[0, 0] < 1e-4      # correct
    assert out[0, 1] > 10        # wrong


def test_corner_loss_zero_for_identical(rng):
    boxes = np.zeros((5, 7), np.float32)
    boxes[:, 3:6] = 2.0
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 5)
    out = np.asarray(losses.corner_loss_lidar(jnp.asarray(boxes), jnp.asarray(boxes)))
    np.testing.assert_allclose(out, 0, atol=1e-5)


def test_corner_loss_flip_invariant():
    a = jnp.asarray(np.array([[0, 0, 0, 4, 2, 1.5, 0.0]], np.float32))
    b = jnp.asarray(np.array([[0, 0, 0, 4, 2, 1.5, np.pi]], np.float32))
    out = float(losses.corner_loss_lidar(a, b)[0])
    assert out < 1e-5


def test_add_sin_difference():
    a = jnp.asarray(np.array([[[0, 0, 0, 0, 0, 0, 0.7]]], np.float32))
    b = jnp.asarray(np.array([[[0, 0, 0, 0, 0, 0, 0.2]]], np.float32))
    sa, sb = losses.add_sin_difference(a, b)
    np.testing.assert_allclose(float(sa[0, 0, 6]), np.sin(0.7) * np.cos(0.2), rtol=1e-5)
    np.testing.assert_allclose(float(sb[0, 0, 6]), np.cos(0.7) * np.sin(0.2), rtol=1e-5)


def test_kl_label_reg_loss_reduces_to_parts(rng):
    B, N, C = 2, 16, 7
    preds = rng.randn(B, N, C).astype(np.float32) * 0.1
    targets = rng.randn(B, N, C).astype(np.float32) * 0.1
    std_preds = rng.randn(B, N, C).astype(np.float32)
    pos = rng.rand(B, N) < 0.25
    reg_w = pos.astype(np.float32)
    reg_w /= np.clip(pos.sum(1, keepdims=True), 1, None)
    label_var = np.where(pos[..., None], rng.uniform(0.01, 1, (B, N, C)), 0.0).astype(np.float32)

    total, parts = losses.kl_label_reg_loss(
        jnp.asarray(preds), jnp.asarray(std_preds), jnp.asarray(targets),
        jnp.asarray(reg_w), jnp.asarray(label_var))
    total = float(total)
    assert np.isfinite(total)
    np.testing.assert_allclose(
        total,
        float(parts['loc_loss_src']) + float(parts['loc_loss_square'])
        + float(parts['loc_loss_log']), rtol=1e-5)

    # with perfect prediction the src term vanishes and, per dim,
    # f(s) = exp(t - s) - 0.5 (t - s) is minimized at s = t + ln 2
    label_var = np.maximum(label_var, 1e-6)
    t = np.log(np.where(pos[..., None], label_var, 1.0) + 1e-10).astype(np.float32)
    s_opt = t + np.log(2.0).astype(np.float32)
    total_min, _ = losses.kl_label_reg_loss(
        jnp.asarray(targets), jnp.asarray(s_opt), jnp.asarray(targets),
        jnp.asarray(reg_w), jnp.asarray(label_var))
    for off in (-1.5, 1.5):
        total_off, _ = losses.kl_label_reg_loss(
            jnp.asarray(targets), jnp.asarray(s_opt + off), jnp.asarray(targets),
            jnp.asarray(reg_w), jnp.asarray(label_var))
        assert float(total_min) < float(total_off)
