import jax.numpy as jnp
import numpy as np

from glenet_tpu.utils.box_coder import ResidualCoder


def _np_encode(boxes, anchors):
    """Independent numpy oracle for ResidualCoder.encode
    (semantics of reference pcdet/utils/box_coder_utils.py:13-43)."""
    anchors = anchors.copy()
    boxes = boxes.copy()
    anchors[:, 3:6] = np.clip(anchors[:, 3:6], 1e-5, None)
    boxes[:, 3:6] = np.clip(boxes[:, 3:6], 1e-5, None)
    diag = np.sqrt(anchors[:, 3] ** 2 + anchors[:, 4] ** 2)
    out = np.zeros_like(boxes)
    out[:, 0] = (boxes[:, 0] - anchors[:, 0]) / diag
    out[:, 1] = (boxes[:, 1] - anchors[:, 1]) / diag
    out[:, 2] = (boxes[:, 2] - anchors[:, 2]) / anchors[:, 5]
    out[:, 3:6] = np.log(boxes[:, 3:6] / anchors[:, 3:6])
    out[:, 6] = boxes[:, 6] - anchors[:, 6]
    return out


def random_boxes(rng, n):
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0:3] = rng.uniform(-40, 40, (n, 3))
    boxes[:, 3:6] = rng.uniform(0.5, 5.0, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


def test_encode_matches_oracle(rng):
    coder = ResidualCoder()
    boxes = random_boxes(rng, 64)
    anchors = random_boxes(rng, 64)
    got = np.asarray(coder.encode(jnp.asarray(boxes), jnp.asarray(anchors)))
    want = _np_encode(boxes, anchors)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)


def test_roundtrip(rng):
    coder = ResidualCoder()
    boxes = random_boxes(rng, 128)
    anchors = random_boxes(rng, 128)
    enc = coder.encode(jnp.asarray(boxes), jnp.asarray(anchors))
    dec = np.asarray(coder.decode(enc, jnp.asarray(anchors)))
    np.testing.assert_allclose(dec, boxes, rtol=1e-4, atol=1e-4)


def test_roundtrip_sincos(rng):
    coder = ResidualCoder(encode_angle_by_sincos=True)
    assert coder.code_size == 8
    boxes = random_boxes(rng, 32)
    anchors = random_boxes(rng, 32)
    enc = coder.encode(jnp.asarray(boxes), jnp.asarray(anchors))
    assert enc.shape == (32, 8)
    dec = np.asarray(coder.decode(enc, jnp.asarray(anchors)))
    np.testing.assert_allclose(dec[:, :6], boxes[:, :6], rtol=1e-4, atol=1e-4)
    # heading recovered modulo 2*pi
    dh = np.abs(np.angle(np.exp(1j * (dec[:, 6] - boxes[:, 6]))))
    assert dh.max() < 1e-4


def test_batched_decode(rng):
    coder = ResidualCoder()
    boxes = random_boxes(rng, 24).reshape(2, 12, 7)
    anchors = random_boxes(rng, 24).reshape(2, 12, 7)
    enc = coder.encode(jnp.asarray(boxes), jnp.asarray(anchors))
    dec = np.asarray(coder.decode(enc, jnp.asarray(anchors)))
    np.testing.assert_allclose(dec, boxes, rtol=1e-4, atol=1e-4)
