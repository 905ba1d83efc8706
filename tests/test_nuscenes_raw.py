"""Devkit-free tests for the NuScenes raw-info assembly
(glenet_tpu/datasets/nuscenes_raw.py) with synthetic pose/calib records:
the transform chaining, box frame conversion, yaw extraction, sweep
walk, and the reference info schema."""
import numpy as np

from glenet_tpu.datasets import nuscenes_raw as nr


def yaw_quat(a):
    return (np.cos(a / 2), 0.0, 0.0, np.sin(a / 2))


def rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def test_quat_and_transform_matrix():
    a = 0.7
    np.testing.assert_allclose(nr.quat_to_rot(yaw_quat(a)), rotz(a),
                               atol=1e-12)
    t = [1.0, -2.0, 0.5]
    fwd = nr.transform_matrix(t, yaw_quat(a))
    inv = nr.transform_matrix(t, yaw_quat(a), inverse=True)
    np.testing.assert_allclose(fwd @ inv, np.eye(4), atol=1e-12)
    assert abs(nr.quaternion_yaw(yaw_quat(a)) - a) < 1e-12


def test_boxes_global_to_sensor_geometry():
    ego = {'translation': [10.0, 5.0, 0.0], 'rotation': yaw_quat(0.3)}
    cal = {'translation': [1.0, 0.0, 1.8], 'rotation': yaw_quat(-0.1)}
    p = np.array([20.0, 9.0, 1.0])
    psi = 1.1
    vel = np.array([2.0, 0.0, 0.0])

    gt, v_sensor = nr.boxes_global_to_sensor(
        p[None], np.array([[1.9, 4.6, 1.7]]), [yaw_quat(psi)], vel[None],
        ego, cal)
    expect_c = rotz(0.1) @ (rotz(-0.3) @ (p - ego['translation'])
                            - np.array(cal['translation']))
    np.testing.assert_allclose(gt[0, :3], expect_c, atol=1e-5)
    # wlh -> (l, w, h)
    np.testing.assert_allclose(gt[0, 3:6], [4.6, 1.9, 1.7], atol=1e-6)
    assert abs(gt[0, 6] - (psi - 0.3 + 0.1)) < 1e-5
    expect_v = (rotz(0.1) @ rotz(-0.3) @ vel)[:2]
    np.testing.assert_allclose(gt[0, 7:9], expect_v, atol=1e-5)
    # the returned (N, 3) velocity is the same sensor-frame vector
    np.testing.assert_allclose(v_sensor[0, :2], expect_v, atol=1e-5)
    np.testing.assert_allclose(
        v_sensor[0], rotz(0.1) @ rotz(-0.3) @ vel, atol=1e-5)


def _mock_world(n_hist=3, dt_us=100_000):
    """A LIDAR_TOP sample_data chain: ego moving +2 m x per sweep."""
    records = {'sample_data': {}, 'ego_pose': {}, 'calibrated_sensor': {}}
    cal = {'translation': [0.5, 0.0, 1.6], 'rotation': yaw_quat(0.0)}
    records['calibrated_sensor']['c0'] = cal
    prev = ''
    for i in range(n_hist + 1):
        tok = f'sd{i}'
        records['ego_pose'][f'p{i}'] = {
            'translation': [2.0 * i, 0.0, 0.0], 'rotation': yaw_quat(0.0)}
        records['sample_data'][tok] = {
            'token': tok, 'prev': prev, 'timestamp': 1_000_000 + i * dt_us,
            'ego_pose_token': f'p{i}', 'calibrated_sensor_token': 'c0'}
        prev = tok

    def get(table, token):
        return records[table][token]

    return records, get


def test_chain_sweeps_transform_and_time():
    records, get = _mock_world(n_hist=3)
    ref_sd = records['sample_data']['sd3']
    sweeps = nr.chain_sweeps(
        get, ref_sd, records['calibrated_sensor']['c0'],
        records['ego_pose']['p3'], '/data',
        lambda t: f'/data/{t}.bin', max_sweeps=4)
    assert len(sweeps) == 3
    # a global-fixed point seen from sweep sd2 maps into the ref frame
    # shifted by the 2 m of ego motion between the sweeps
    tm = sweeps[0]['transform_matrix']
    x_prev = np.array([1.0, 2.0, 0.0, 1.0])     # in sd2's sensor frame
    x_ref = tm @ x_prev
    np.testing.assert_allclose(x_ref[:3], [1.0 - 2.0, 2.0, 0.0],
                               atol=1e-10)
    assert abs(sweeps[0]['time_lag'] - 0.1) < 1e-9
    assert sweeps[1]['sample_data_token'] == 'sd1'

    # short history: last sweep repeats
    ref_sd1 = records['sample_data']['sd1']
    sweeps = nr.chain_sweeps(
        get, ref_sd1, records['calibrated_sensor']['c0'],
        records['ego_pose']['p1'], '/data',
        lambda t: f'/data/{t}.bin', max_sweeps=4)
    assert len(sweeps) == 3
    assert sweeps[1] is sweeps[2]


def test_build_sample_info_schema_and_filter():
    records, get = _mock_world(n_hist=1)
    sample = {'token': 's0', 'data': {'LIDAR_TOP': 'sd1'},
              'scene_token': 'sc0'}

    def box_fn(s):
        centers = [[5.0, 0.0, 0.5], [8.0, 1.0, 0.5]]
        sizes = [[1.9, 4.6, 1.7]] * 2
        quats = [yaw_quat(0.2)] * 2
        vels = np.zeros((2, 3))
        names = ['vehicle.car', 'human.pedestrian.adult']
        tokens = ['a0', 'a1']
        return centers, sizes, quats, vels, names, tokens, [12, 0], [0, 0]

    info = nr.build_sample_info(get, sample, '/data',
                                lambda t: f'/data/{t}.bin', max_sweeps=3,
                                box_fn=box_fn,
                                cam_fn=lambda s: ('/data/cam0.jpg',
                                                  np.eye(3)))
    for key in ('lidar_path', 'token', 'ref_from_car', 'car_from_global',
                'timestamp', 'sweeps', 'gt_boxes', 'gt_names',
                'num_lidar_pts', 'cam_front_path', 'cam_intrinsic'):
        assert key in info, key
    assert info['gt_boxes'].shape == (1, 9)       # zero-point box dropped
    assert info['gt_names'][0] == 'car'           # general -> detection
    assert len(info['sweeps']) == 2
    # gt_boxes_velocity is SENSOR-frame: consistent with gt_boxes[:, 7:9]
    np.testing.assert_allclose(info['gt_boxes_velocity'][:, :2],
                               info['gt_boxes'][:, 7:9], atol=1e-6)
    assert info['cam_intrinsic'].shape == (3, 3)
