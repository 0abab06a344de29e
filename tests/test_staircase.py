"""Span-staircase pair expansion: exactness vs the legacy uniform-K path.

The staircase (RasterizeConfig.span_schedule) re-orders rows by tile span
and hands out per-rank duplicate capacities; with classes sized so nothing
drops it must be BIT-IDENTICAL to the legacy expansion — same image, same
gradients, same counters (the pair sort keys are unique per (tile, depth)
for distinct depths, so pair order is unchanged).  Covers the capability
of the CUDA rasterizer's duplicateWithKeys stage (SURVEY.md §2.3 N1) under
the TPU-native static-shape constraint.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gps_gaussian_tpu.geometry import cameras
from gps_gaussian_tpu.kernels.rasterizer import (RasterizeConfig,
                                                 rasterize_single)

pytestmark = pytest.mark.fast


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    res, n = 64, 512
    xyz = rng.normal(0, 0.3, (n, 3)).astype(np.float32)
    xyz[:, 2] += 2.0
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    scale = rng.uniform(0.005, 0.03, (n, 3)).astype(np.float32)
    op = rng.uniform(0.2, 0.9, (n, 1)).astype(np.float32)
    col = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    valid = (rng.uniform(size=(n,)) < 0.6).astype(np.float32)
    K = np.array([[0.8 * res, 0, res / 2], [0, 0.8 * res, res / 2],
                  [0, 0, 1]], np.float32)
    E = np.eye(3, 4, dtype=np.float32)
    cam = cameras.camera_from_intr_extr(K, E, res, res)
    return res, xyz, q, scale, op, col, valid, cam


def _run(scene, cfg):
    res, xyz, q, scale, op, col, valid, cam = scene
    bg = jnp.zeros(3, jnp.float32)
    view, proj = jnp.asarray(cam["view"]), jnp.asarray(cam["proj"])

    def loss(xyz, q, scale, op, col):
        img, aux = rasterize_single(
            xyz, q, scale, op, col, jnp.asarray(valid), view, proj,
            cam["tanfovx"], cam["tanfovy"], res, res, bg, cfg)
        w = jnp.cos(jnp.arange(img.size, dtype=jnp.float32)
                    ).reshape(img.shape)
        return jnp.sum(img * w), (img, aux)

    (_, (img, aux)), g = jax.value_and_grad(
        loss, argnums=(0, 1, 2, 3, 4), has_aux=True)(
        jnp.asarray(xyz), jnp.asarray(q), jnp.asarray(scale),
        jnp.asarray(op), jnp.asarray(col))
    return img, aux, g


def test_staircase_matches_legacy_bitwise(scene):
    base = dict(backend="pallas", interpret=True, fg_cap=320,
                max_per_tile=512, pair_budget=4096)
    legacy = RasterizeConfig(max_tiles_per_gaussian=16, **base)
    # single full-width class: cannot drop relative to legacy K=16
    stair = RasterizeConfig(span_schedule=((16, 320),), **base)
    # realistic descending staircase sized not to drop on this scene
    stair2 = RasterizeConfig(span_schedule=((16, 64), (8, 128), (4, 128)),
                             **base)

    img_l, aux_l, g_l = _run(scene, legacy)
    for cfg in (stair, stair2):
        img_s, aux_s, g_s = _run(scene, cfg)
        assert jnp.array_equal(img_l, img_s)
        for a, b in zip(g_l, g_s):
            assert jnp.array_equal(a, b)
        assert int(aux_s.num_dropped) == int(aux_l.num_dropped) == 0
        assert int(aux_s.num_pair_dropped) == 0


def test_ellipse_rects_close_and_cheaper(scene):
    """Per-axis (ellipse-AABB) binning: image within the alpha<=0.011
    tail bound of circle rects, never MORE pairs, grads still flow."""
    base = dict(backend="pallas", interpret=True, fg_cap=320,
                max_per_tile=512, pair_budget=4096)
    circle = RasterizeConfig(span_schedule=((16, 320),), **base)
    ellipse = RasterizeConfig(span_schedule=((16, 320),),
                              ellipse_rects=True, **base)
    img_c, aux_c, g_c = _run(scene, circle)
    img_e, aux_e, g_e = _run(scene, ellipse)
    assert float(jnp.abs(img_c - img_e).max()) < 0.05
    # drops counted against the (smaller) ellipse totals stay zero here
    assert int(aux_e.num_dropped) == 0
    for g in g_e:
        assert bool(jnp.isfinite(g).all())


def test_tie_heavy_train_fwd_matches_primal(scene):
    """The train-mode pair sort carries an extra slot operand that the
    inference primal sort omits (is_stable=False on both).  On pairs
    sharing a (tile, qdepth) bin XLA's tie resolution MUST still agree
    between the two sorts or train and eval renders diverge bitwise —
    pin that assumption with a scene where every Gaussian shares one
    depth (maximally tie-heavy)."""
    res, xyz, q, scale, op, col, valid, cam = scene
    xyz = np.array(xyz)
    xyz[:, 2] = 2.0          # all gaussians in one quantized depth bin
    cfg = RasterizeConfig(backend="pallas", interpret=True, fg_cap=320,
                          max_per_tile=512, pair_budget=4096,
                          span_schedule=((16, 320),))
    bg = jnp.zeros(3, jnp.float32)
    view, proj = jnp.asarray(cam["view"]), jnp.asarray(cam["proj"])
    args = (jnp.asarray(xyz), jnp.asarray(q), jnp.asarray(scale),
            jnp.asarray(op), jnp.asarray(col), jnp.asarray(valid), view,
            proj, cam["tanfovx"], cam["tanfovy"], res, res, bg, cfg)

    img_primal, _ = rasterize_single(*args)          # no-slot sort

    def loss(xyz):
        img, _ = rasterize_single(xyz, *args[1:])
        return jnp.sum(img), img

    (_, img_train), _ = jax.value_and_grad(loss, has_aux=True)(args[0])
    assert jnp.array_equal(img_primal, img_train)


def test_staircase_counts_drops(scene):
    """A starved schedule must COUNT the dropped pairs, never silently
    truncate (SURVEY.md §7 hard part 2)."""
    base = dict(backend="pallas", interpret=True, fg_cap=320,
                max_per_tile=512, pair_budget=4096)
    starved = RasterizeConfig(span_schedule=((2, 64), (1, 64)), **base)
    img, aux, _ = _run(scene, starved)
    assert int(aux.num_dropped) > 0
