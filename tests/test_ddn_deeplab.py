"""DDNDeepLabV3 (CaDDN depth net) torch->flax conversion parity.

Builds a randomly initialized torch MIRROR of torchvision's
deeplabv3_resnet topology — same module structure, therefore the same
state-dict names torchvision checkpoints carry (backbone.conv1,
backbone.layerL.B.convK/bnK/downsample.{0,1}, classifier.0.convs...,
classifier.{1,2,4}) — converts it with
weight_converter.convert_ddn_deeplabv3, and asserts output equivalence
of features + logits (reference consumption:
/root/reference/pcdet/models/backbones_3d/vfe/image_vfe_modules/ffn/ddn/
ddn_template.py:108-141).  torchvision itself is not installed in this
image; with it, the identical names resolve from the real checkpoints.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from glenet_tpu.models.ddn_deeplab import DDNDeepLabV3
from glenet_tpu.utils.weight_converter import convert_ddn_deeplabv3

BLOCKS = (1, 1, 1, 1)      # depth-reduced ResNet; widths are the real ones
NUM_BINS = 6


class TorchBottleneck(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                padding=dilation, dilation=dilation,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, stride=stride,
                           bias=False),
                tnn.BatchNorm2d(planes * 4))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        sc = x if self.downsample is None else self.downsample(x)
        return F.relu(out + sc)


class TorchTrunk(tnn.Module):
    """torchvision resnet with replace_stride_with_dilation=[F, T, T]."""
    def __init__(self, blocks=BLOCKS):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        specs = [(64, 1, 1, 1), (128, 2, 1, 1), (256, 1, 1, 2),
                 (512, 1, 2, 4)]
        inplanes = 64
        for li, ((planes, stride, d_first, d_rest), n) in enumerate(
                zip(specs, blocks), start=1):
            layers = []
            for bi in range(n):
                layers.append(TorchBottleneck(
                    inplanes, planes,
                    stride=stride if bi == 0 else 1,
                    dilation=d_first if bi == 0 else d_rest,
                    downsample=bi == 0))
                inplanes = planes * 4
            setattr(self, f'layer{li}', tnn.Sequential(*layers))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        l1 = self.layer1(x)
        x = self.layer2(l1)
        x = self.layer3(x)
        l4 = self.layer4(x)
        return l1, l4


def _aspp_branch_1x1(cin, cout):
    return tnn.Sequential(tnn.Conv2d(cin, cout, 1, bias=False),
                          tnn.BatchNorm2d(cout), tnn.ReLU())


class TorchASPPPooling(tnn.Sequential):
    def __init__(self, cin, cout):
        super().__init__(tnn.AdaptiveAvgPool2d(1),
                         tnn.Conv2d(cin, cout, 1, bias=False),
                         tnn.BatchNorm2d(cout), tnn.ReLU())

    def forward(self, x):
        size = x.shape[-2:]
        for mod in self:
            x = mod(x)
        return F.interpolate(x, size=size, mode='bilinear',
                             align_corners=False)


class TorchASPP(tnn.Module):
    def __init__(self, cin, rates=(12, 24, 36), cout=256):
        super().__init__()
        convs = [_aspp_branch_1x1(cin, cout)]
        for r in rates:
            convs.append(tnn.Sequential(
                tnn.Conv2d(cin, cout, 3, padding=r, dilation=r,
                           bias=False),
                tnn.BatchNorm2d(cout), tnn.ReLU()))
        convs.append(TorchASPPPooling(cin, cout))
        self.convs = tnn.ModuleList(convs)
        self.project = tnn.Sequential(
            tnn.Conv2d(5 * cout, cout, 1, bias=False),
            tnn.BatchNorm2d(cout), tnn.ReLU(), tnn.Dropout(0.5))

    def forward(self, x):
        res = [conv(x) for conv in self.convs]
        return self.project(torch.cat(res, dim=1))


class TorchDeepLabV3(tnn.Module):
    def __init__(self, blocks=BLOCKS, num_classes=NUM_BINS + 1):
        super().__init__()
        self.backbone = TorchTrunk(blocks)
        self.classifier = tnn.Sequential(
            TorchASPP(2048), tnn.Conv2d(256, 256, 3, padding=1,
                                        bias=False),
            tnn.BatchNorm2d(256), tnn.ReLU(),
            tnn.Conv2d(256, num_classes, 1))

    def forward(self, x):
        l1, l4 = self.backbone(x)
        logits = self.classifier(l4)
        logits = F.interpolate(logits, size=l1.shape[-2:],
                               mode='bilinear', align_corners=False)
        return l1, logits


def test_ddn_deeplabv3_conversion_parity():
    torch.manual_seed(0)
    tm = TorchDeepLabV3().eval()
    # non-trivial running stats so the BN conversion is load-bearing
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.7, 1.5)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    params, stats = convert_ddn_deeplabv3(sd, blocks=BLOCKS)
    net = DDNDeepLabV3(num_bins=NUM_BINS, blocks=BLOCKS,
                       normalize_input=False)

    rng = np.random.RandomState(1)
    img = rng.randn(1, 64, 96, 3).astype(np.float32)
    feats, logits = net.apply(
        {'params': params, 'batch_stats': stats},
        jnp.asarray(img), train=False)

    with torch.no_grad():
        tl1, tlog = tm(torch.from_numpy(
            np.transpose(img, (0, 3, 1, 2))))
    np.testing.assert_allclose(
        np.asarray(feats), np.transpose(tl1.numpy(), (0, 2, 3, 1)),
        atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(logits), np.transpose(tlog.numpy(), (0, 2, 3, 1)),
        atol=2e-3, rtol=1e-3)
    assert feats.shape == (1, 16, 24, 256)
    assert logits.shape == (1, 16, 24, NUM_BINS + 1)


def test_caddn_deeplab_config_builds():
    """The reference-topology CaDDN config resolves and builds (heavy
    trunk — construction only, no init)."""
    from pathlib import Path
    from glenet_tpu.config import cfg_from_yaml_file
    from glenet_tpu.models.detectors import build_detector
    root = Path(__file__).resolve().parent.parent
    cfg = cfg_from_yaml_file(
        str(root / 'configs/kitti_models/CaDDN_deeplab.yaml'))
    assert cfg.MODEL.VFE.FFN.DDN.NAME == 'DDNDeepLabV3'
    det = build_detector(cfg)
    assert det is not None
