"""Box coders (pure-functional JAX).

Math contract matches the reference pcdet/utils/box_coder_utils.py:
  - ResidualCoder (:5-77): xyz residuals normalized by anchor BEV diagonal /
    dz, log-ratio dims, heading as delta or (sin, cos) difference.
  - PointResidualCoder (:146-222): point-based encoding for point heads.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ResidualCoder:
    code_size: int = 7
    encode_angle_by_sincos: bool = False

    def __post_init__(self):
        if self.encode_angle_by_sincos:
            object.__setattr__(self, 'code_size', self.code_size + 1)

    def encode(self, boxes, anchors):
        """boxes, anchors: (..., 7 + C) -> (..., code_size)."""
        anchors = jnp.concatenate(
            [anchors[..., :3], jnp.clip(anchors[..., 3:6], 1e-5, None), anchors[..., 6:]], axis=-1)
        boxes = jnp.concatenate(
            [boxes[..., :3], jnp.clip(boxes[..., 3:6], 1e-5, None), boxes[..., 6:]], axis=-1)

        xa, ya, za, dxa, dya, dza, ra = [anchors[..., i] for i in range(7)]
        xg, yg, zg, dxg, dyg, dzg, rg = [boxes[..., i] for i in range(7)]

        diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
        xt = (xg - xa) / diagonal
        yt = (yg - ya) / diagonal
        zt = (zg - za) / dza
        dxt = jnp.log(dxg / dxa)
        dyt = jnp.log(dyg / dya)
        dzt = jnp.log(dzg / dza)
        if self.encode_angle_by_sincos:
            rts = [jnp.cos(rg) - jnp.cos(ra), jnp.sin(rg) - jnp.sin(ra)]
        else:
            rts = [rg - ra]
        cts = [boxes[..., i] - anchors[..., i] for i in range(7, boxes.shape[-1])]
        return jnp.stack([xt, yt, zt, dxt, dyt, dzt, *rts, *cts], axis=-1)

    def decode(self, box_encodings, anchors):
        """box_encodings: (..., code_size), anchors: (..., 7 + C) -> boxes."""
        xa, ya, za, dxa, dya, dza, ra = [anchors[..., i] for i in range(7)]
        if self.encode_angle_by_sincos:
            xt, yt, zt, dxt, dyt, dzt, cost, sint = [
                box_encodings[..., i] for i in range(8)]
            n_extra = box_encodings.shape[-1] - 8
        else:
            xt, yt, zt, dxt, dyt, dzt, rt = [box_encodings[..., i] for i in range(7)]
            n_extra = box_encodings.shape[-1] - 7

        diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * dza + za
        dxg = jnp.exp(dxt) * dxa
        dyg = jnp.exp(dyt) * dya
        dzg = jnp.exp(dzt) * dza
        if self.encode_angle_by_sincos:
            rg = jnp.arctan2(sint + jnp.sin(ra), cost + jnp.cos(ra))
        else:
            rg = rt + ra
        extras = [box_encodings[..., -n_extra + i] + anchors[..., 7 + i]
                  for i in range(n_extra)]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *extras], axis=-1)


@dataclasses.dataclass(frozen=True)
class PointResidualCoder:
    """Point-head coder (reference box_coder_utils.py:146-222).

    Encodes gt boxes against per-point locations with class-mean sizes.
    """
    code_size: int = 8
    use_mean_size: bool = True
    mean_size: tuple = ()

    def encode(self, gt_boxes, points, gt_classes=None):
        gt_boxes = jnp.concatenate(
            [gt_boxes[..., :3], jnp.clip(gt_boxes[..., 3:6], 1e-5, None), gt_boxes[..., 6:]], axis=-1)
        xg, yg, zg, dxg, dyg, dzg, rg = [gt_boxes[..., i] for i in range(7)]
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
        if self.use_mean_size:
            mean = jnp.asarray(self.mean_size, jnp.float32)[gt_classes - 1]
            dxa, dya, dza = mean[..., 0], mean[..., 1], mean[..., 2]
            diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
            xt = (xg - xa) / diagonal
            yt = (yg - ya) / diagonal
            zt = (zg - za) / dza
            dxt = jnp.log(dxg / dxa)
            dyt = jnp.log(dyg / dya)
            dzt = jnp.log(dzg / dza)
        else:
            xt, yt, zt = xg - xa, yg - ya, zg - za
            dxt, dyt, dzt = jnp.log(dxg), jnp.log(dyg), jnp.log(dzg)
        return jnp.stack([xt, yt, zt, dxt, dyt, dzt,
                          jnp.cos(rg), jnp.sin(rg)], axis=-1)

    def decode(self, box_encodings, points, pred_classes=None):
        xt, yt, zt, dxt, dyt, dzt, cost, sint = [
            box_encodings[..., i] for i in range(8)]
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
        if self.use_mean_size:
            mean = jnp.asarray(self.mean_size, jnp.float32)[pred_classes - 1]
            dxa, dya, dza = mean[..., 0], mean[..., 1], mean[..., 2]
            diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
            xg = xt * diagonal + xa
            yg = yt * diagonal + ya
            zg = zt * dza + za
            dxg = jnp.exp(dxt) * dxa
            dyg = jnp.exp(dyt) * dya
            dzg = jnp.exp(dzt) * dza
        else:
            xg, yg, zg = xt + xa, yt + ya, zt + za
            dxg, dyg, dzg = jnp.exp(dxt), jnp.exp(dyt), jnp.exp(dzt)
        rg = jnp.arctan2(sint, cost)
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg], axis=-1)


@dataclasses.dataclass(frozen=True)
class PreviousResidualDecoder:
    """Legacy decoder (reference box_coder_utils.py:80-112): same residual
    decode as ResidualCoder but sizes are direct w/l/h residual-exponents —
    used when loading SECOND-v1-era models."""
    code_size: int = 7

    @staticmethod
    def decode(box_encodings, anchors):
        xa, ya, za, dxa, dya, dza, ra = [anchors[..., i] for i in range(7)]
        xt, yt, zt, wt, lt, ht, rt = [box_encodings[..., i] for i in range(7)]
        diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * dza + za
        dxg = jnp.exp(lt) * dxa
        dyg = jnp.exp(wt) * dya
        dzg = jnp.exp(ht) * dza
        rg = rt + ra
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg], axis=-1)


_CODERS = {
    'ResidualCoder': ResidualCoder,
    'PointResidualCoder': PointResidualCoder,
    'PreviousResidualDecoder': PreviousResidualDecoder,
}


def build_box_coder(name: str, **kwargs):
    return _CODERS[name](**kwargs)
