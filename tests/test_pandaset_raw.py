"""Pandaset raw-info assembly (devkit-free geometry) vs direct
transliterations of the reference math
(/root/reference/pcdet/datasets/pandaset/pandaset_dataset.py:160-252)."""
import numpy as np

from glenet_tpu.datasets import pandaset_raw as pr


def yaw_pose(yaw, t=(10.0, -4.0, 1.2)):
    return {'position': {'x': t[0], 'y': t[1], 'z': t[2]},
            'heading': {'w': np.cos(yaw / 2), 'x': 0.0, 'y': 0.0,
                        'z': np.sin(yaw / 2)}}


def rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def test_points_to_normative_geometry():
    yaw = 0.7
    pose = yaw_pose(yaw)
    w = np.array([[12.0, -3.0, 2.0], [9.5, -4.0, 0.2]])
    inten = np.array([0.3, 0.9])
    got = pr.points_to_normative(w, inten, pose)

    # ego = R^T (w - t); normative x = ego_y, y = -ego_x
    ego = (w - [10.0, -4.0, 1.2]) @ rotz(yaw)
    want = np.stack([ego[:, 1], -ego[:, 0], ego[:, 2]], 1)
    np.testing.assert_allclose(got[:, :3], want, atol=1e-6)
    np.testing.assert_allclose(got[:, 3], inten, atol=1e-6)


def test_cuboids_roundtrip_against_points():
    """A cuboid center transforms exactly like a point, and the yaw
    offset equals the pose yaw relation: a box aligned with the world
    y axis ends up aligned with the ego y axis rotated by zrot."""
    yaw = -0.35
    pose = yaw_pose(yaw)
    centers = np.array([[11.0, -2.0, 1.0]])
    dims = np.array([[1.9, 4.6, 1.7]])          # pandaset (dx, dy, dz)
    yaws = np.array([0.25])

    boxes, zrot = pr.cuboids_to_normative(centers, dims, yaws, pose)
    pts = pr.points_to_normative(centers, np.zeros(1), pose)
    np.testing.assert_allclose(boxes[0, :3], pts[0, :3], atol=1e-6)
    # dims swap dx <-> dy (pandaset_dataset.py:243-246)
    np.testing.assert_allclose(boxes[0, 3:6], [4.6, 1.9, 1.7], atol=1e-6)
    # zrot: transformed world-y axis angle; for a pure-z-rotation pose
    # the ego y axis is world y rotated by -yaw -> zrot == -(-yaw)...
    # check against the reference formula directly
    y2 = pr.world_to_ego(np.array([[0, 0, 0], [0, 1.0, 0]]), pose)
    yx = y2[1] - y2[0]
    assert abs(zrot - np.arctan2(-yx[0], yx[1])) < 1e-12
    np.testing.assert_allclose(boxes[0, 6], 0.25 + zrot, atol=1e-6)


def test_sequence_infos_schema():
    infos = pr.build_sequence_infos('/data/pandaset', '001', 3)
    assert len(infos) == 3
    for ii, info in enumerate(infos):
        assert info['sequence'] == '001'
        assert info['frame_idx'] == ii
        assert info['lidar_path'].endswith(f'dataset/001/lidar/{ii:02d}.pkl.gz')
        assert info['cuboids_path'].endswith(
            f'dataset/001/annotations/cuboids/{ii:02d}.pkl.gz')
    try:
        pr.build_sequence_infos('/d', 's', 101)
        raise AssertionError('expected ValueError for > 100 frames')
    except ValueError:
        pass
