"""The headline bench's config literals must pass the kernel's own static
validation — a red driver bench from a pure-literal config error
(BENCH_r04: span_schedule 375,808 rows > fg_cap 352,256) must be
impossible to commit.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gps_gaussian_tpu.kernels.rasterizer.pallas_kernel import (  # noqa: E402
    validate_span_schedule)

pytestmark = pytest.mark.fast


def test_bench_config_passes_staircase_validation():
    # bench.py is shadowed by the bench/ package — load it by path
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_headline",
        Path(__file__).resolve().parent.parent / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    cfg = bench.bench_raster_config()
    assert cfg.span_schedule is not None
    # exactly what render_sorted_staircase checks at trace time (batch 1)
    validate_span_schedule(cfg.span_schedule, cfg.fg_cap, batch=1)
    # the compaction path's own static requirement
    assert cfg.fg_cap % 8 == 0, "fg_cap must be a multiple of 8 (super-rows)"
    # schedule must cover the scene's expected foreground (~314.6k rows at
    # fg_frac 0.15 of 2*1024^2) or rows get silently pair-dropped en masse
    n_fg_expected = int(0.15 * 2 * 1024 * 1024)
    assert sum(c for _, c in cfg.span_schedule) >= n_fg_expected
    assert cfg.fg_cap >= n_fg_expected


def test_validator_rejects_bench_r04_regression():
    with pytest.raises(ValueError, match="rows > \\s*fg_cap|rows > fg_cap"):
        validate_span_schedule(
            ((9, 6144), (6, 56320), (4, 225280), (2, 71680), (1, 16384)),
            352_256)
    with pytest.raises(ValueError, match="6 bits"):
        validate_span_schedule(((64, 8),), 352_256)
    with pytest.raises(ValueError, match="batch"):
        validate_span_schedule(((9, 8),), 352_256, batch=9)
    # the shipped-shape happy path
    validate_span_schedule(((9, 8), (1, 8)), 16, batch=2)
