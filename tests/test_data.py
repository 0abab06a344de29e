"""Data pipeline: synthetic generation, rectified loading, GT-flow geometry."""

import numpy as np
import jax.numpy as jnp
import pytest

from gps_gaussian_tpu.data import synth
from gps_gaussian_tpu.data.loader import BatchLoader, collate
from gps_gaussian_tpu.data.thuman import (DatasetConfig, StereoHumanDataset,
                                          unproject_inv_depth)
from gps_gaussian_tpu.geometry.pointcloud import (flow_to_inv_depth,
                                                  inv_depth_to_points)

RES = 96


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthdata")
    synth.generate_dataset(root, n_train=2, n_val=1, res=RES, hr=True)
    return root


def test_generated_layout(dataset_root):
    scan = sorted((dataset_root / "train" / "img").iterdir())[0]
    vids = sorted(p.name for p in scan.iterdir())
    assert "0.jpg" in vids and "4.jpg" in vids
    assert "2_hr.jpg" in vids          # novel views carry hi-res targets
    assert (dataset_root / "train" / "depth" / scan.name / "0.png").exists()
    assert (dataset_root / "train" / "parm" / scan.name /
            "0_intrinsic.npy").exists()


def test_depth_roundtrip_through_files(dataset_root):
    """uint16 inverse-depth files reproject onto the sphere surfaces."""
    from gps_gaussian_tpu.data.thuman import _read_inv_depth
    scan = sorted((dataset_root / "train" / "img").iterdir())[0].name
    base = dataset_root / "train"
    invd = _read_inv_depth(base / "depth" / scan / "0.png")
    intr = np.load(base / "parm" / scan / "0_intrinsic.npy")
    extr = np.load(base / "parm" / scan / "0_extrinsic.npy")
    pts = unproject_inv_depth(invd, intr, extr)
    sel = invd > 0.05
    assert sel.sum() > 100
    # all surface points live inside the scene bounding sphere
    r = np.linalg.norm(pts[sel] - np.array([0, 0.85, 0]), axis=-1)
    assert float(r.max()) < 1.6


def test_sample_and_gt_flow_geometry(dataset_root):
    cfg = DatasetConfig(data_root=str(dataset_root), src_res=RES,
                        use_processed_data=False)
    ds = StereoHumanDataset(cfg, "train")
    rng = np.random.default_rng(0)
    s = ds.get_sample(0, cfg.train_novel_ids, rng)

    lm = s["lmain"]
    assert lm["img"].shape == (RES, RES, 3)
    assert lm["img"].min() >= -1.0 and lm["img"].max() <= 1.0
    assert s["novel"]["img"].shape[0] == RES  # hr off by default

    # GT flow -> inverse depth -> world points must land on the scene
    batch = collate([s])
    inv_d = flow_to_inv_depth(
        jnp.asarray(batch.lmain.flow), jnp.asarray(batch.lmain.intr),
        jnp.asarray(batch.lmain.ref_intr), jnp.asarray(batch.lmain.tf_x),
        jnp.asarray(batch.lmain.valid))
    pts = inv_depth_to_points(jnp.asarray(inv_d[..., 0]),
                              jnp.asarray(batch.lmain.extr),
                              jnp.asarray(batch.lmain.intr))
    valid = np.asarray(batch.lmain.valid[0, ..., 0]) > 0.5
    assert valid.sum() > 100
    p = np.asarray(pts[0])[valid]
    r = np.linalg.norm(p - np.array([0, 0.85, 0]), axis=-1)
    # eroded-mask edges can still straddle depth discontinuities; the bulk
    # of the points must sit on the figure
    assert float(np.percentile(r, 95)) < 1.6

    # left/right reconstructions describe the same surface: compare
    # both views' point clouds via their distance distributions
    inv_d_r = flow_to_inv_depth(
        jnp.asarray(batch.rmain.flow), jnp.asarray(batch.rmain.intr),
        jnp.asarray(batch.rmain.ref_intr), jnp.asarray(batch.rmain.tf_x),
        jnp.asarray(batch.rmain.valid))
    pts_r = inv_depth_to_points(jnp.asarray(inv_d_r[..., 0]),
                                jnp.asarray(batch.rmain.extr),
                                jnp.asarray(batch.rmain.intr))
    valid_r = np.asarray(batch.rmain.valid[0, ..., 0]) > 0.5
    pr = np.asarray(pts_r[0])[valid_r]
    c_l, c_r = p.mean(axis=0), pr.mean(axis=0)
    assert np.linalg.norm(c_l - c_r) < 0.1


def test_rectified_cache_roundtrip(dataset_root):
    cfg = DatasetConfig(data_root=str(dataset_root), src_res=RES,
                        use_processed_data=True)
    ds = StereoHumanDataset(cfg, "val")
    a = ds.rectified_stereo(ds.scans[0])   # builds cache
    b = ds.rectified_stereo(ds.scans[0])   # reads cache
    np.testing.assert_allclose(a["flow0"], b["flow0"])
    # the build epoch must see the SAME (jpg-quantized) pixels as every
    # later cache hit — no first-epoch drift
    np.testing.assert_array_equal(a["img0"], b["img0"])
    np.testing.assert_array_equal(a["mask1"], b["mask1"])
    np.testing.assert_array_equal(a["valid0"], b["valid0"])
    assert (dataset_root / "rectified_local" / "val").exists()
    # compact v2 cache: images ride as jpg bytes, not float arrays —
    # the archive must be far smaller than the raw f32 payload
    path = dataset_root / "rectified_local" / "val" / f"{ds.scans[0]}.npz"
    raw_f32 = 2 * (RES * RES) * (3 + 1 + 1 + 1) * 4   # img+mask+flow+valid
    assert path.stat().st_size < raw_f32 / 3
    # jpg is lossy but bounded: within a few gray levels of the source
    fresh = ds._build_rectified(ds.scans[0])
    assert np.abs(np.asarray(b["img0"], np.float32)
                  - np.asarray(fresh["img0"], np.float32)).mean() < 3.0


def test_batch_loader(dataset_root):
    cfg = DatasetConfig(data_root=str(dataset_root), src_res=RES,
                        use_processed_data=False)
    ds = StereoHumanDataset(cfg, "train")
    loader = BatchLoader(ds, batch_size=2, novel_ids=cfg.train_novel_ids,
                         num_threads=1)
    try:
        batch = next(loader)
        assert batch.lmain.img.shape == (2, RES, RES, 3)
        assert batch.novel.img.shape == (2, RES, RES, 3)
        assert batch.novel.camera.view.shape == (2, 4, 4)
    finally:
        loader.close()


def test_batch_loader_epoch_without_replacement(dataset_root):
    """The epoch permutation visits every index exactly once per epoch."""
    cfg = DatasetConfig(data_root=str(dataset_root), src_res=RES,
                        use_processed_data=False)
    ds = StereoHumanDataset(cfg, "train")
    loader = BatchLoader(ds, batch_size=2, novel_ids=cfg.train_novel_ids,
                         num_threads=0)  # drive _next_task directly
    n = len(loader.indices)
    seen = []
    # two epochs worth of tasks
    draws = -(-2 * n // 2)
    for _ in range(draws):
        idxs, _ = loader._next_task()
        seen.extend(idxs)
    first_epoch = seen[:n]
    assert sorted(first_epoch) == sorted(loader.indices)
    loader.close()


def test_batch_loader_multiprocess(dataset_root):
    cfg = DatasetConfig(data_root=str(dataset_root), src_res=RES,
                        use_processed_data=False)
    ds = StereoHumanDataset(cfg, "train")
    loader = BatchLoader(ds, batch_size=2, novel_ids=cfg.train_novel_ids,
                         num_procs=2)
    try:
        for _ in range(3):
            batch = next(loader)
            assert batch.lmain.img.shape == (2, RES, RES, 3)
            assert batch.novel.img.shape == (2, RES, RES, 3)
    finally:
        loader.close()


def test_eval_batches_deterministic_full_sweep(dataset_root):
    from gps_gaussian_tpu.data.loader import eval_batches

    cfg = DatasetConfig(data_root=str(dataset_root), src_res=RES,
                        use_processed_data=False)
    ds = StereoHumanDataset(cfg, "val")
    sweep1 = list(eval_batches(ds, 2, cfg.val_novel_ids))
    sweep2 = list(eval_batches(ds, 2, cfg.val_novel_ids))
    assert len(sweep1) == -(-len(ds) // 2)
    for (b1, w1), (b2, w2) in zip(sweep1, sweep2):
        np.testing.assert_array_equal(b1.lmain.img, b2.lmain.img)
        np.testing.assert_array_equal(b1.novel.img, b2.novel.img)
        np.testing.assert_array_equal(w1, w2)
    # weights mask exactly the wrapped-tail duplicates: total live
    # weight over the sweep equals the dataset size
    assert sum(float(w.sum()) for _, w in sweep1) == len(ds)
    # max_batches caps the sweep
    assert len(list(eval_batches(ds, 2, cfg.val_novel_ids,
                                 max_batches=1))) == 1


def test_eval_batches_same_count_across_hosts(dataset_root):
    """Multi-host: every process must run the SAME number of eval steps
    (the sharded eval step carries collectives) even when the dataset
    size is not divisible by the process count."""
    from gps_gaussian_tpu.data.loader import eval_batches

    cfg = DatasetConfig(data_root=str(dataset_root), src_res=RES,
                        use_processed_data=False)
    ds = StereoHumanDataset(cfg, "val")
    for count in (2, 3, max(len(ds), 2)):
        sweeps = [list(eval_batches(ds, 2, cfg.val_novel_ids,
                                    process_index=p, process_count=count))
                  for p in range(count)]
        lens = {len(s) for s in sweeps}
        assert len(lens) == 1, (count, lens)
        # global live weight still covers every sample exactly once
        tot = sum(float(w.sum()) for s in sweeps for _, w in s)
        assert tot == len(ds), (count, tot)
