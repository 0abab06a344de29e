"""Golden tests of the from-scratch rectifier against OpenCV, plus invariants."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from gps_gaussian_tpu.geometry import stereo


def random_rig(rng, baseline=0.4, noise=0.05):
    """Two cameras on a ring looking at the origin (THuman-style rig)."""
    res = 256
    K0 = np.array([[0.8 * res, 0, res / 2], [0, 0.8 * res, res / 2 + 6],
                   [0, 0, 1.0]])
    K1 = K0.copy()
    K1[0, 0] *= 1 + rng.uniform(-0.02, 0.02)
    K1[1, 1] *= 1 + rng.uniform(-0.02, 0.02)

    def look_at(eye, target=np.array([0.0, 0.85, 0.0])):
        fwd = target - eye
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, np.array([0.0, 1.0, 0.0]))
        right = right / np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd], axis=0)
        t = -R @ eye
        return np.concatenate([R, t[:, None]], axis=1)

    a0 = rng.uniform(0, 2 * np.pi)
    a1 = a0 + 22.5 / 180 * np.pi
    eye0 = np.array([2.0 * np.sin(a0), 0.85 + rng.uniform(-noise, noise),
                     2.0 * np.cos(a0)])
    eye1 = np.array([2.0 * np.sin(a1), 0.85 + rng.uniform(-noise, noise),
                     2.0 * np.cos(a1)])
    return K0, look_at(eye0), K1, look_at(eye1), res


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_matches_opencv(seed):
    rng = np.random.default_rng(seed)
    K0, E0, K1, E1, res = random_rig(rng)
    R, T = stereo.relative_pose(E0, E1)

    R0_cv, R1_cv, P0_cv, P1_cv, *_ = cv2.stereoRectify(
        K0, np.zeros(4), K1, np.zeros(4), (res, res), R, T.reshape(3, 1), flags=0)
    R0, R1, P0, P1 = stereo.stereo_rectify(K0, K1, (res, res), R, T)

    np.testing.assert_allclose(R0, R0_cv, atol=1e-8)
    np.testing.assert_allclose(R1, R1_cv, atol=1e-8)
    np.testing.assert_allclose(P0, P0_cv, atol=1e-6)
    np.testing.assert_allclose(P1, P1_cv, atol=1e-6)


def test_rectify_map_matches_opencv():
    rng = np.random.default_rng(7)
    K0, E0, K1, E1, res = random_rig(rng)
    R, T = stereo.relative_pose(E0, E1)
    R0, R1, P0, P1 = stereo.stereo_rectify(K0, K1, (res, res), R, T)

    mx_cv, my_cv = cv2.initUndistortRectifyMap(
        K0, np.zeros(4), R0, P0, (res, res), cv2.CV_32FC1)
    mx, my = stereo.init_rectify_map(K0, R0, P0, (res, res))
    np.testing.assert_allclose(mx, mx_cv, atol=2e-4)
    np.testing.assert_allclose(my, my_cv, atol=2e-4)


def test_remap_matches_opencv():
    rng = np.random.default_rng(11)
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    mx = (rng.random((64, 64)) * 70 - 3).astype(np.float32)
    my = (rng.random((64, 64)) * 70 - 3).astype(np.float32)
    ours = stereo.remap_bilinear(img, mx, my).astype(np.float32)
    ref = cv2.remap(img, mx, my, cv2.INTER_LINEAR).astype(np.float32)
    # cv2 uses fixed-point (5-bit) interpolation weights: allow 1-2 LSB.
    assert np.abs(ours - ref).max() <= 2.0


def test_erode_matches_opencv():
    rng = np.random.default_rng(13)
    mask = (rng.random((48, 48)) > 0.4).astype(np.float32)
    ref = cv2.erode(mask, np.ones((3, 3), np.uint8))
    ours = stereo.erode3x3(mask)
    np.testing.assert_allclose(ours, ref)


def test_row_alignment_invariant():
    """After rectification a world point projects to the same row in both views."""
    rng = np.random.default_rng(3)
    K0, E0, K1, E1, res = random_rig(rng)
    cam, _, _ = stereo.rectify_stereo_pair(K0, E0, K1, E1, (res, res))

    pts = rng.normal(scale=0.3, size=(50, 3)) + np.array([0, 0.85, 0])

    def project(K, E):
        p = E[:3, :3] @ pts.T + E[:3, 3:]
        uv = K @ p
        return uv[:2] / uv[2]

    uv0 = project(cam["intr0"], cam["extr0"])
    uv1 = project(cam["intr1"], cam["extr1"])
    np.testing.assert_allclose(uv0[1], uv1[1], atol=1e-3)  # same rows

    # disparity relation: u1 - u0 == (cx1 - cx0) + Tf_x / z  (inverse depth)
    z0 = (cam["extr0"][:3, :3] @ pts.T + cam["extr0"][:3, 3:])[2]
    z1 = (cam["extr1"][:3, :3] @ pts.T + cam["extr1"][:3, 3:])[2]
    np.testing.assert_allclose(z0, z1, atol=1e-6)  # same rectified depth
    offset = cam["intr1"][0, 2] - cam["intr0"][0, 2]
    disparity_pred = cam["tf_x"] / z0
    np.testing.assert_allclose(uv1[0] - uv0[0], offset + disparity_pred,
                               atol=1e-3)
