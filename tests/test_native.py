"""Native C++ kernels vs numpy oracles + mesh renderer geometry checks."""

import numpy as np
import pytest

from gps_gaussian_tpu import native
from gps_gaussian_tpu.geometry import stereo


def test_native_builds():
    assert native.available(), "g++ toolchain is baked in; build must work"


def test_remap_matches_numpy(rng):
    img = rng.normal(size=(37, 41, 3)).astype(np.float32)
    map_x = rng.uniform(-2, 43, size=(20, 25)).astype(np.float32)
    map_y = rng.uniform(-2, 40, size=(20, 25)).astype(np.float32)
    ours = native.remap_bilinear(img, map_x, map_y)
    ref = stereo.remap_bilinear(img, map_x, map_y)
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    # uint8 path (what the dataset loader feeds)
    img8 = rng.integers(0, 255, size=(37, 41, 3)).astype(np.uint8)
    ours8 = native.remap_bilinear(img8, map_x, map_y)
    ref8 = stereo.remap_bilinear(img8, map_x, map_y)
    assert np.abs(ours8.astype(int) - ref8.astype(int)).max() <= 1


def test_erode_matches_numpy(rng):
    m = (rng.uniform(size=(33, 29)) > 0.4).astype(np.float32)
    np.testing.assert_allclose(native.erode3x3(m), stereo.erode3x3(m))


def _camera(res):
    K = np.array([[0.8 * res, 0, res / 2], [0, 0.8 * res, res / 2],
                  [0, 0, 1]], np.float32)
    E = np.eye(3, 4, dtype=np.float32)
    E[2, 3] = 2.0
    return K, E


def _icosphere(r=0.4, center=(0, 0, 0), n=12):
    """Lat-long sphere mesh."""
    vs, fs = [], []
    for i in range(n + 1):
        theta = np.pi * i / n
        for j in range(2 * n):
            phi = np.pi * j / n
            vs.append([r * np.sin(theta) * np.cos(phi) + center[0],
                       r * np.cos(theta) + center[1],
                       r * np.sin(theta) * np.sin(phi) + center[2]])
    cols = 2 * n
    for i in range(n):
        for j in range(cols):
            a = i * cols + j
            b = i * cols + (j + 1) % cols
            c = (i + 1) * cols + j
            d = (i + 1) * cols + (j + 1) % cols
            fs.append([a, b, c])
            fs.append([b, d, c])
    return np.asarray(vs, np.float32), np.asarray(fs, np.int32)


def test_mesh_raster_depth_is_exact_inverse_z():
    res = 64
    K, E = _camera(res)
    verts, faces = _icosphere()
    color = np.ones((len(verts), 3), np.float32)
    rgb, invz, mask, nrm = native.rasterize_mesh(verts, faces, color, K, E,
                                                 res, res)
    assert mask[res // 2, res // 2] == 255
    # center pixel ray hits the front of the sphere at z = 2.0 - 0.4
    z_center = 1.0 / invz[res // 2, res // 2]
    np.testing.assert_allclose(z_center, 1.6, atol=0.02)
    # background empty
    assert mask[2, 2] == 0 and invz[2, 2] == 0
    # silhouette is a disc of radius ~ f * r / z_mid
    area = (mask > 0).sum()
    r_px = 0.8 * res * 0.4 / 2.0
    np.testing.assert_allclose(area, np.pi * r_px ** 2, rtol=0.15)


def test_mesh_raster_native_matches_numpy_fallback():
    res = 48
    K, E = _camera(res)
    verts, faces = _icosphere(n=6)
    color = np.tile(np.array([[0.8, 0.5, 0.2]], np.float32),
                    (len(verts), 1))
    rgb_n, invz_n, mask_n, _ = native.rasterize_mesh(verts, faces, color,
                                                     K, E, res, res)
    rgb_p, invz_p, mask_p, _ = native._rasterize_mesh_numpy(
        verts, faces, color, K, E, res, res, None, None, None, 0.25)
    assert (mask_n != mask_p).mean() < 0.02      # edge pixels may differ
    both = (mask_n > 0) & (mask_p > 0)
    np.testing.assert_allclose(invz_n[both], invz_p[both], rtol=1e-3)
    np.testing.assert_allclose(rgb_n[both], rgb_p[both], atol=0.02)


def test_render_scans_pipeline(tmp_path, rng):
    """OBJ -> rendered views -> loadable by the dataset."""
    from gps_gaussian_tpu.data import render_scans
    from gps_gaussian_tpu.data.thuman import DatasetConfig, StereoHumanDataset

    # write a small OBJ humanoid stand-in (a tall box)
    verts, faces = _icosphere(r=0.5, center=(0, 0.9, 0), n=8)
    scan_dir = tmp_path / "scans" / "0001"
    scan_dir.mkdir(parents=True)
    with open(scan_dir / "0001.obj", "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for tri in faces:
            f.write(f"f {tri[0]+1} {tri[1]+1} {tri[2]+1}\n")

    out = tmp_path / "rendered"
    done = list(render_scans.render_dataset(tmp_path / "scans", out,
                                            res=96, hr=False, val_every=1))
    assert done == [("0001", "val")]

    cfg = DatasetConfig(data_root=str(out), src_res=96,
                        use_processed_data=False)
    ds = StereoHumanDataset(cfg, "val")
    s = ds.get_sample(0, (3,), rng)
    assert s["lmain"]["img"].shape == (96, 96, 3)
    assert s["lmain"]["valid"].sum() > 50   # GT flow from rendered depth


def test_height_randomization_and_yaw_normalization(tmp_path):
    """Data-prep fidelity vs reference render_data.py:108-142: per-scan
    height 1.80+-0.05, bbox-aware jitter, SMPL-X yaw (PCA fallback)."""
    import pickle

    from gps_gaussian_tpu.data import render_scans

    rng0 = np.random.default_rng(0)
    verts = rng0.normal(size=(500, 3)).astype(np.float32)
    heights = []
    for seed in range(20):
        v = render_scans.normalize_scan(verts,
                                        np.random.default_rng(seed))
        heights.append(v[:, 1].max() - v[:, 1].min())
        assert abs(v[:, 1].min()) < 1e-5           # feet on y=0
    heights = np.asarray(heights)
    assert (np.abs(heights - 1.80) <= 0.05 + 1e-6).all()
    assert heights.std() > 0.01                    # actually randomised

    # PCA yaw fallback must TRACK the true yaw (mod 180, the axis
    # ambiguity) under the reference's rotationY convention
    # (taichi_three/transform.py:14) — the same sign as the SMPL-X path
    wide = np.stack([np.linspace(-0.4, 0.4, 200),
                     np.linspace(0, 1.8, 200),
                     0.02 * rng0.normal(size=200)], axis=1).astype(np.float32)
    for deg in (0.0, 30.0, 60.0, -40.0):
        th = np.deg2rad(deg)
        rot = np.array([[np.cos(th), 0, np.sin(th)],
                        [0, 1, 0],
                        [-np.sin(th), 0, np.cos(th)]], np.float32)
        est = render_scans.scan_yaw_degrees(tmp_path, wide @ rot.T)
        d = (est - deg) % 180.0
        assert min(d, 180.0 - d) < 2.0, (deg, est)

    # SMPL-X param wins over PCA when present
    scan_dir = tmp_path / "scanA"
    scan_dir.mkdir()
    with open(scan_dir / "smplx_param.pkl", "wb") as f:
        pickle.dump({"global_orient": np.array([[0.0, np.pi / 2, 0.0]])}, f)
    y_smpl = render_scans.scan_yaw_degrees(scan_dir, wide)
    assert y_smpl == pytest.approx(90.0, abs=1e-4)
