"""3D scene export: standalone HTML viewer + PLY wireframes
(headless-native equivalent of reference tools/visual_utils)."""
import json
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / 'tools'))

from visual_utils import scene_vis


def _scene():
    rng = np.random.RandomState(0)
    pts = np.stack([rng.uniform(0, 40, 500), rng.uniform(-10, 10, 500),
                    rng.uniform(-2, 1, 500), rng.uniform(0, 1, 500)],
                   1).astype(np.float32)
    gt = np.array([[15, 0, -1.0, 3.9, 1.6, 1.56, 0.3]], np.float32)
    det = np.array([[15.1, 0.05, -1.0, 3.85, 1.62, 1.5, 0.28]], np.float32)
    return pts, gt, det


def test_export_scene_html(tmp_path):
    pts, gt, det = _scene()
    out = scene_vis.export_scene_html(
        pts, tmp_path / 's.html', gt_boxes=gt, ref_boxes=det,
        ref_scores=[0.9], ref_labels=[1], class_names=['Car'])
    html = Path(out).read_text()
    # embedded payload must be valid JSON with the right cardinalities
    m = re.search(r'const DATA = (\{.*?\});\n', html, re.S)
    assert m, 'DATA payload missing'
    data = json.loads(m.group(1))
    assert len(data['points']) == 500 * 4
    assert len(data['boxes']) == 2           # 1 gt + 1 det
    assert data['boxes'][0]['color'] == 'rgb(40,220,80)'
    assert 'Car 0.90' in data['boxes'][1]['label']
    assert '<canvas' in html and 'boxEdges' in html


def test_export_scene_html_decimates(tmp_path):
    pts, _, _ = _scene()
    out = scene_vis.export_scene_html(pts, tmp_path / 'd.html',
                                      max_points=100)
    data = json.loads(re.search(r'const DATA = (\{.*?\});\n',
                                Path(out).read_text(), re.S).group(1))
    assert len(data['points']) == 100 * 4


def test_export_ply(tmp_path):
    pts, gt, det = _scene()
    out = scene_vis.export_ply(pts, tmp_path / 's.ply', gt_boxes=gt,
                               ref_boxes=det)
    lines = Path(out).read_text().splitlines()
    assert lines[0] == 'ply'
    nv = int([l for l in lines if l.startswith('element vertex')][0].split()[-1])
    ne = int([l for l in lines if l.startswith('element edge')][0].split()[-1])
    assert nv == 500 + 2 * 8                 # points + 8 corners per box
    assert ne == 2 * 12                      # 12 edges per box
    header_end = lines.index('end_header')
    assert len(lines) == header_end + 1 + nv + ne
