"""Invariant + golden tests for camera math and flow/depth/point conversions."""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.fast

from gps_gaussian_tpu.geometry import cameras, pointcloud, stereo


def _random_cam(rng, res=64):
    K = np.array([[0.8 * res, 0, res / 2],
                  [0, 0.8 * res, res / 2 + 2],
                  [0, 0, 1.0]], dtype=np.float64)
    # random-ish look-at pose
    angle = rng.uniform(0, 2 * np.pi)
    eye = np.array([2 * np.sin(angle), 0.9, 2 * np.cos(angle)])
    fwd = (np.array([0, 0.85, 0]) - eye)
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd])
    t = -R @ eye
    return K, np.concatenate([R, t[:, None]], axis=1)


def test_slerp_matches_scipy(rng):
    scipy_rot = pytest.importorskip("scipy.spatial.transform")
    Rot, Slerp = scipy_rot.Rotation, scipy_rot.Slerp
    for _ in range(5):
        _, E0 = _random_cam(rng)
        _, E1 = _random_cam(rng)
        r = Rot.from_matrix(np.stack([E0[:3, :3], E1[:3, :3]]))
        sl = Slerp([0, 1], r)
        for ratio in (0.0, 0.25, 0.5, 0.9, 1.0):
            ours = cameras.slerp_rotations(E0[:3, :3], E1[:3, :3], ratio)
            ref = sl(ratio).as_matrix()
            np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_quat_roundtrip(rng):
    for _ in range(10):
        _, E = _random_cam(rng)
        q = cameras.mat_to_quat(E[:3, :3])
        np.testing.assert_allclose(cameras.quat_to_mat(q), E[:3, :3],
                                   atol=1e-10)


def test_world_to_view_and_projection():
    rng = np.random.default_rng(5)
    K, E = _random_cam(rng, res=128)
    view = cameras.extr_to_view(E)
    # view must equal [R|t] in homogeneous form
    np.testing.assert_allclose(view[:3, :3], E[:3, :3], atol=1e-6)
    np.testing.assert_allclose(view[:3, 3], E[:3, 3], atol=1e-6)

    # projection maps a point at pixel (u,v) to NDC consistent with K
    P = cameras.projection_matrix(0.01, 100.0, K, 128, 128)
    pts = rng.normal(scale=0.3, size=(20, 3)) + np.array([0, 0.85, 0])
    cam_pts = (E[:3, :3] @ pts.T + E[:3, 3:]).T
    hom = (P @ np.concatenate([cam_pts, np.ones((20, 1))], axis=1).T).T
    ndc = hom[:, :2] / hom[:, 3:4]
    # pixel from NDC with the 3DGS convention: ((ndc + 1) * S - 1) / 2
    px = ((ndc + 1) * 128 - 1) * 0.5
    uv = (K @ cam_pts.T)
    uv = (uv[:2] / uv[2]).T
    # the GL frustum is intrinsics-faithful up to the half-pixel convention
    np.testing.assert_allclose(px, uv - 0.5, atol=1e-4)


def test_inv_depth_points_roundtrip(rng):
    K, E = _random_cam(rng, res=32)
    K = K.astype(np.float32); E = E.astype(np.float32)
    inv_depth = (1.0 / rng.uniform(1.5, 2.5, size=(2, 32, 32))).astype(np.float32)
    intr = jnp.asarray(np.stack([K, K]))
    extr = jnp.asarray(np.stack([E, E]))
    pts = pointcloud.inv_depth_to_points(jnp.asarray(inv_depth), extr, intr)
    back = pointcloud.points_to_inv_depth(pts, extr, intr)
    np.testing.assert_allclose(np.asarray(back), inv_depth, rtol=1e-4)


def test_flow_depth_roundtrip(rng):
    res = 16
    b = 2
    intr = np.tile(np.array([[100.0, 0, 7.5], [0, 100.0, 8.5], [0, 0, 1]],
                            dtype=np.float32), (b, 1, 1))
    ref_intr = intr.copy()
    ref_intr[:, 0, 2] += 3.0
    tf_x = np.full((b,), -40.0, dtype=np.float32)
    inv_depth = (1.0 / rng.uniform(1.5, 2.5, (b, res, res, 1))).astype(np.float32)

    flow = pointcloud.stereo_flow_from_inv_depth(
        jnp.asarray(inv_depth), jnp.asarray(intr), jnp.asarray(ref_intr),
        jnp.asarray(tf_x))
    mask = jnp.ones((b, res, res, 1), jnp.float32)
    back = pointcloud.flow_to_inv_depth(flow, jnp.asarray(intr),
                                        jnp.asarray(ref_intr),
                                        jnp.asarray(tf_x), mask)
    np.testing.assert_allclose(np.asarray(back), inv_depth, rtol=1e-5)


def test_full_geometry_chain_vs_rectified_projection(rng):
    """points -> rectified inv-depth -> flow -> inv-depth -> points closes."""
    res = 32
    K0, E0 = _random_cam(rng, res)
    K1 = K0.copy()
    # build a rectified pair
    cam, _, _ = stereo.rectify_stereo_pair(K0, E0, K1, E0 + 0, (res, res))
    # nudge second camera: use a real distinct pose
    _, E1b = _random_cam(rng, res)
    cam, _, _ = stereo.rectify_stereo_pair(K0, E0, K1, E1b, (res, res))

    intr = jnp.asarray(cam["intr0"][None])
    ref_intr = jnp.asarray(cam["intr1"][None])
    extr = jnp.asarray(cam["extr0"][None])
    tf_x = jnp.asarray(np.array([cam["tf_x"]]))

    inv_depth = (1.0 / rng.uniform(1.8, 2.2, (1, res, res))).astype(np.float32)
    pts = pointcloud.inv_depth_to_points(jnp.asarray(inv_depth), extr, intr)
    inv_back = pointcloud.points_to_inv_depth(pts, extr, intr)
    flow = pointcloud.stereo_flow_from_inv_depth(
        inv_back[..., None], intr, ref_intr, tf_x)
    inv2 = pointcloud.flow_to_inv_depth(
        flow, intr, ref_intr, tf_x, jnp.ones((1, res, res, 1)))
    np.testing.assert_allclose(np.asarray(inv2[..., 0]), inv_depth, rtol=1e-4)


def test_perspective_project(rng):
    K, E = _random_cam(rng, 64)
    pts = rng.normal(scale=0.3, size=(1, 10, 3)) + np.array([0, 0.85, 0])
    calib = (K @ np.concatenate([E[:3, :3], E[:3, 3:]], axis=1))[None]
    out = pointcloud.perspective_project(jnp.asarray(pts, jnp.float32),
                                         jnp.asarray(calib, jnp.float32))
    cam_pts = (E[:3, :3] @ pts[0].T + E[:3, 3:])
    uv = K @ cam_pts
    np.testing.assert_allclose(np.asarray(out[0, :, 0]), uv[0] / uv[2],
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out[0, :, 2]), cam_pts[2], rtol=1e-4)


def test_interpolated_camera_endpoints(rng):
    K0, E0 = _random_cam(rng)
    K1, E1 = _random_cam(rng)
    for ratio, K_t, E_t in ((0.0, K0, E0), (1.0, K1, E1)):
        intr_new, extr_new = cameras.interpolate_pose(K0, E0, K1, E1, ratio)
        np.testing.assert_allclose(intr_new, K_t, atol=1e-5)
        np.testing.assert_allclose(extr_new, E_t[:3, :], atol=1e-5)
