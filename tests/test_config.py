"""Config system: YAML loading, nested _BASE_CONFIG_ inheritance, --set
dotted overrides."""
import numpy as np
import pytest
import yaml

from glenet_tpu.config import Cfg, cfg_from_list, cfg_from_yaml_file


def test_nested_base_config(tmp_path):
    base = tmp_path / 'base.yaml'
    base.write_text(yaml.safe_dump({
        'DATA_PATH': 'data/kitti',
        'POINT_CLOUD_RANGE': [0, -40, -3, 70.4, 40, 1],
        'DATA_PROCESSOR': [{'NAME': 'a'}],
    }))
    child = tmp_path / 'model.yaml'
    child.write_text(yaml.safe_dump({
        'CLASS_NAMES': ['Car'],
        'DATA_CONFIG': {
            '_BASE_CONFIG_': str(base),
            'POINT_CLOUD_RANGE': [0, -8, -3, 16, 8, 1],
        },
        'MODEL': {'NAME': 'X'},
    }))
    cfg = cfg_from_yaml_file(str(child))
    # override wins, base keys inherited
    assert cfg.DATA_CONFIG.POINT_CLOUD_RANGE == [0, -8, -3, 16, 8, 1]
    assert cfg.DATA_CONFIG.DATA_PATH == 'data/kitti'
    assert cfg.DATA_CONFIG.DATA_PROCESSOR[0].NAME == 'a'
    assert cfg.TAG == 'model'


def test_repo_configs_load():
    for f in ('configs/kitti_models/pointpillar.yaml',
              'configs/kitti_models/second.yaml',
              'configs/kitti_models/GLENet_S.yaml',
              'configs/kitti_models/GLENet_C.yaml',
              'configs/kitti_models/GLENet_VR.yaml',
              'configs/kitti_models/pointrcnn.yaml',
              'configs/waymo_models/GLENet_S.yaml',
              'configs/waymo_models/centerpoint.yaml',
              'configs/cvae/exp_gen.yaml'):
        cfg = cfg_from_yaml_file(f)
        assert 'CLASS_NAMES' in cfg or 'MODEL' in cfg, f


def test_cfg_from_list_overrides():
    cfg = Cfg({'MODEL': {'NAME': 'A', 'LR': 0.1,
                         'LIST': [1, 2, 3], 'FLAG': True}})
    cfg_from_list(['MODEL.NAME', 'B', 'MODEL.LR', '0.5',
                   'MODEL.FLAG', 'False'], cfg)
    assert cfg.MODEL.NAME == 'B'
    assert cfg.MODEL.LR == 0.5
    assert cfg.MODEL.FLAG is False


def test_cfg_from_list_rejects_unknown():
    cfg = Cfg({'A': {'B': 1}})
    with pytest.raises((AssertionError, KeyError)):
        cfg_from_list(['A.NOPE', '2'], cfg)


def test_all_model_configs_build_detectors():
    """Zoo-wide net: every shipped model config must construct a detector
    (config schema -> module wiring; shape/numeric coverage lives in the
    per-family e2e tests and convergence harnesses)."""
    from pathlib import Path

    from glenet_tpu.models.detectors import build_detector

    root = Path(__file__).resolve().parent.parent
    cfgs = sorted((root / 'configs').glob('*_models/*.yaml'))
    assert len(cfgs) >= 29, [c.name for c in cfgs]
    for f in cfgs:
        det = build_detector(cfg_from_yaml_file(str(f)))
        assert det.net is not None, f
