"""Pose math: quaternions, slerp, normalization, RANSAC point of interest.

Mirrors and extends the reference's only test module
(``tests/test_UtilsCV.py`` — geometry unit tests), plus coverage the
reference lacks (recenter/spherify invariants, slerp endpoints).
"""

import numpy as np
import pytest

from nerf_and_dietnerf_tpu.core import pose_math as pm


def random_rotation(rng):
    q = rng.normal(size=4)
    return pm.quat_to_rotation_matrix(q / np.linalg.norm(q))


def test_quat_matrix_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        r = random_rotation(rng)
        r2 = pm.quat_to_rotation_matrix(pm.quat_from_rotation_matrix(r))
        np.testing.assert_allclose(r2, r, atol=1e-9)


def test_rotation_matrices_are_orthonormal():
    for mat in [pm.rot_x(33.0), pm.rot_y(-71.0), pm.rot_z(190.0)]:
        r = mat[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-12)


def test_sphere_c2w_looks_at_origin():
    for (radius, x, y) in [(1.0, 0, 0), (2.0, -45, 60), (0.8, -90, 180)]:
        c2w = pm.sphere_c2w(radius, x, y, 0)
        pos = c2w[:3, 3]
        np.testing.assert_allclose(np.linalg.norm(pos), radius, atol=1e-12)
        # Viewing direction (-z column) points back at the origin.
        np.testing.assert_allclose(pm.camera_direction(c2w), -pos / radius, atol=1e-9)


def test_quat_between_vectors():
    rng = np.random.default_rng(1)
    for _ in range(10):
        v1, v2 = rng.normal(size=3), rng.normal(size=3)
        q = pm.quat_between_vectors(v1, v2)
        rotated = pm.rotate_vector(pm.normalize(v1), q)
        np.testing.assert_allclose(rotated, pm.normalize(v2), atol=1e-9)


def test_quat_between_antiparallel_vectors():
    v = np.array([0.0, 0.0, 1.0])
    q = pm.quat_between_vectors(v, -v)
    np.testing.assert_allclose(pm.rotate_vector(v, q), -v, atol=1e-9)
    # Also the x-axis degenerate branch:
    x = np.array([1.0, 0.0, 0.0])
    q = pm.quat_between_vectors(x, -x)
    np.testing.assert_allclose(pm.rotate_vector(x, q), -x, atol=1e-9)


def test_rotation_matrix_source_to_dest():
    rng = np.random.default_rng(2)
    a, b = random_rotation(rng), random_rotation(rng)
    r = pm.rotation_matrix_source_to_dest(a, b)
    np.testing.assert_allclose(r[:3, :3] @ a, b, atol=1e-9)


def test_slerp_endpoints_and_midpoint():
    rng = np.random.default_rng(3)
    m1, m2 = np.eye(4), np.eye(4)
    m1[:3, :3] = random_rotation(rng)
    m2[:3, :3] = random_rotation(rng)
    m1[:3, 3], m2[:3, 3] = [1, 2, 3], [4, 5, 6]
    np.testing.assert_allclose(pm.interpolate_c2w(m1, m2, 0.0), m1, atol=1e-9)
    np.testing.assert_allclose(pm.interpolate_c2w(m1, m2, 1.0), m2, atol=1e-9)
    mid = pm.interpolate_c2w(m1, m2, 0.5)
    np.testing.assert_allclose(mid[:3, 3], [2.5, 3.5, 4.5], atol=1e-12)
    r = mid[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)
    # Geodesic midpoint: equal angular distance to both endpoints.
    def angle(p, q):
        return np.arccos(np.clip((np.trace(p.T @ q) - 1) / 2, -1, 1))
    np.testing.assert_allclose(angle(m1[:3, :3], r), angle(r, m2[:3, :3]), atol=1e-7)


def test_slerp_takes_shortest_path():
    m1 = np.eye(4)
    m2 = np.eye(4)
    m2[:3, :3] = pm.rot_z(350.0)[:3, :3]  # -10 deg the short way
    mid = pm.interpolate_c2w(m1, m2, 0.5)
    _, _, z = pm.euler_degrees_from_matrix(mid[:3, :3])
    assert abs(z - (-5.0)) < 1e-6


def test_path_between_counts_and_stretch():
    m1, m2 = np.eye(4), np.eye(4)
    m2[:3, 3] = [1, 0, 0]
    path = pm.c2w_path_between(m1, m2, 16)
    assert path.shape == (16, 4, 4)
    stretched = pm.c2w_path_between_with_stretch(m1, m2, 10)
    assert stretched.shape == (10, 4, 4)
    xs = stretched[:, 0, 3]
    # Ease-out: later steps are smaller than earlier ones.
    steps = np.diff(xs)
    assert steps[-1] < steps[0]
    np.testing.assert_allclose(xs[0], 0.0, atol=1e-12)
    np.testing.assert_allclose(xs[-1], 1.0, atol=1e-12)


def test_poses_average_and_recenter():
    rng = np.random.default_rng(4)
    poses = []
    for _ in range(12):
        m = np.eye(4)
        m[:3, :3] = random_rotation(rng)
        m[:3, 3] = rng.normal(size=3) + [0, 0, 5]
        poses.append(m)
    poses = np.stack(poses)
    recentered, avg = pm.recenter_poses(poses)
    # Average translation of recentered poses ~ 0.
    np.testing.assert_allclose(recentered[:, :3, 3].mean(0), 0.0, atol=1e-9)
    # avg @ recentered == original.
    np.testing.assert_allclose(avg @ pm.to_homogeneous(recentered[:, :3, :4]), poses, atol=1e-9)


def test_spherify_scales_into_unit_sphere():
    rng = np.random.default_rng(5)
    poses = np.stack([np.eye(4)] * 8)
    poses[:, :3, 3] = rng.normal(size=(8, 3)) * 10
    bounds = np.array([2.0, 6.0])
    scaled, new_bounds, scale = pm.spherify_poses(poses, bounds)
    radii = np.linalg.norm(scaled[:, :3, 3], axis=-1)
    np.testing.assert_allclose(radii.max(), 1.0, rtol=1e-9)
    np.testing.assert_allclose(new_bounds, bounds * scale)


def test_line_intersection_exact():
    point = np.array([1.0, 2.0, 3.0])
    rng = np.random.default_rng(6)
    lines = []
    for _ in range(6):
        d = pm.normalize(rng.normal(size=3))
        lines.append([d, point - 2.5 * d])
    est = pm.intersect_lines_least_squares(np.asarray(lines))
    np.testing.assert_allclose(est, point, atol=1e-8)


def test_line_intersection_single_line_is_none():
    assert pm.intersect_lines_least_squares(np.zeros((1, 2, 3)) + [[1, 0, 0]]) is None


def test_point_to_lines_distance():
    line = np.array([[[1.0, 0.0, 0.0], [0.0, 0.0, 0.0]]])  # the x axis
    d = pm.point_to_lines_distance(np.array([5.0, 3.0, 4.0]), line)
    np.testing.assert_allclose(d, 25.0)  # squared distance


def test_ransac_with_outliers():
    point = np.array([-1.0, 0.5, 2.0])
    rng = np.random.default_rng(7)
    lines = []
    for _ in range(15):
        d = pm.normalize(rng.normal(size=3))
        lines.append([d, point - 3 * d])
    for _ in range(4):  # outliers
        lines.append([pm.normalize(rng.normal(size=3)), rng.normal(size=3) + 20])
    est, inliers = pm.ransac_line_intersection(np.asarray(lines), num_iter=300, rng=rng)
    np.testing.assert_allclose(est, point, atol=1e-6)
    assert len(inliers) >= 15


def test_estimate_point_of_interest_spherical():
    poi = np.array([0.2, -0.1, 0.4])
    c2ws = []
    rng = np.random.default_rng(8)
    for _ in range(20):
        c2w = pm.sphere_c2w(1.5, rng.uniform(-80, 0), rng.uniform(-180, 180), 0)
        c2w[:3, 3] += poi
        c2ws.append(c2w)
    est, spherical = pm.estimate_point_of_interest(np.stack(c2ws))
    assert spherical
    np.testing.assert_allclose(est, poi, atol=1e-6)


def test_estimate_point_of_interest_parallel_views_not_spherical():
    c2ws = []
    for x in np.linspace(-1, 1, 10):
        m = np.eye(4)
        m[0, 3] = x
        c2ws.append(m)
    est, spherical = pm.estimate_point_of_interest(np.stack(c2ws))
    assert not spherical


def test_l_to_r_matrices():
    mats = pm.l_to_r_c2w_matrices(5)
    assert mats.shape == (5, 4, 4)
    np.testing.assert_allclose(mats[:, 0, 3], [-1, -0.5, 0, 0.5, 1])
    np.testing.assert_allclose(mats[:, :3, :3], np.stack([np.eye(3)] * 5))


def test_sphere_orbit_matrices():
    mats = pm.sphere_orbit_c2w_matrices(10)
    assert mats.shape == (20, 4, 4)
    np.testing.assert_allclose(np.linalg.norm(mats[:, :3, 3], axis=-1), 1.0, rtol=1e-5)


def test_multi_waypoint_path():
    ws = np.stack([np.eye(4)] * 3)
    ws[1, 0, 3] = 1.0
    ws[2, 1, 3] = 1.0
    path = pm.multi_waypoint_path(ws, 8)
    assert path.shape == (24, 4, 4)  # 3 legs incl. the closing one
