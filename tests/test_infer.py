"""Freeview inference end-to-end on synthetic data."""

import numpy as np
import jax
import pytest

from gps_gaussian_tpu.data import synth
from gps_gaussian_tpu.data.thuman import DatasetConfig, StereoHumanDataset
from gps_gaussian_tpu.infer.freeview import FreeviewRenderer, load_renderer
from gps_gaussian_tpu.train.config import load_config
from gps_gaussian_tpu.train.trainer import make_model

RES = 64


@pytest.fixture(scope="module")
def test_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("inferdata")
    synth.generate_dataset(root, n_train=1, n_val=0, res=RES, hr=False)
    return root / "train"


def _cfg(root):
    return load_config(
        None, dataset=dict(data_root=str(root), src_res=RES,
                           use_hr_img=False, use_processed_data=False),
        raster=dict(max_tiles_per_gaussian=8, max_per_tile=256,
                    backend="jnp"))


def test_freeview_static_sweep(test_root):
    cfg = _cfg(test_root)
    ds_cfg = DatasetConfig(data_root=str(test_root), src_res=RES,
                           use_processed_data=False)
    dataset = StereoHumanDataset(ds_cfg, "test")

    model = make_model(cfg, with_gs=True)
    from gps_gaussian_tpu.data.loader import collate

    batch = collate([dataset.get_test_sample(0)])
    params = model.init(jax.random.PRNGKey(0), batch, iters=3,
                        test_mode=True)
    r = FreeviewRenderer(cfg, params, dataset)
    images = r.infer_static(0, n_views=3)
    assert len(images) == 3
    for img in images:
        assert img.shape == (RES, RES, 3)
        assert np.isfinite(img).all()
    # distinct viewpoints must give distinct images
    assert np.abs(images[0] - images[2]).mean() > 1e-4


def test_freeview_sequence_and_ckpt_roundtrip(test_root, tmp_path):
    cfg = _cfg(test_root)
    ds_cfg = DatasetConfig(data_root=str(test_root), src_res=RES,
                           use_processed_data=False)
    dataset = StereoHumanDataset(ds_cfg, "test")

    # save random params as a checkpoint, then load through load_renderer
    from gps_gaussian_tpu.data.loader import collate
    from gps_gaussian_tpu.train import state as state_lib

    model = make_model(cfg, with_gs=True)
    batch = collate([dataset.get_test_sample(0)])
    params = model.init(jax.random.PRNGKey(1), batch, iters=3,
                        test_mode=True)
    st = state_lib.create_state(cfg, params)
    state_lib.save_checkpoint(str(tmp_path / "ckpt"), st, wait=True)

    r = load_renderer(cfg, str(tmp_path / "ckpt"), dataset)
    frames = list(r.infer_sequence(ratio=0.5))
    assert len(frames) == 1
    name, img = frames[0]
    assert img.shape == (RES, RES, 3) and np.isfinite(img).all()


def test_freeview_mesh_sharded_matches_single(test_root):
    """FreeviewRenderer(mesh=...) routes through the tile-sharded
    renderer and must produce the single-device image."""
    from gps_gaussian_tpu.data.loader import collate
    from gps_gaussian_tpu.train.sharding import make_mesh

    cfg = load_config(
        None, dataset=dict(data_root=str(test_root), src_res=RES,
                           use_hr_img=False, use_processed_data=False),
        raster=dict(max_tiles_per_gaussian=8, max_per_tile=256,
                    backend="pallas"))
    # interpret-mode pallas on the CPU mesh
    import dataclasses
    ds_cfg = DatasetConfig(data_root=str(test_root), src_res=RES,
                           use_processed_data=False)
    dataset = StereoHumanDataset(ds_cfg, "test")
    model = make_model(cfg, with_gs=True)
    batch = collate([dataset.get_test_sample(0)])
    params = model.init(jax.random.PRNGKey(0), batch, iters=3,
                        test_mode=True)

    r1 = FreeviewRenderer(cfg, params, dataset)
    r1.rcfg = dataclasses.replace(r1.rcfg, interpret=True)
    rm = FreeviewRenderer(cfg, params, dataset, mesh=make_mesh())
    rm.rcfg = dataclasses.replace(rm.rcfg, interpret=True)
    assert rm.mesh is not None

    gauss = r1.gaussians(batch)
    cam = r1.novel_camera_at(dataset.get_test_sample(0), 0.5, RES, RES)
    img1, _ = r1.render(gauss, cam)
    imgm, _ = rm.render(gauss, cam)
    np.testing.assert_allclose(np.asarray(imgm), np.asarray(img1),
                               atol=1e-5)
