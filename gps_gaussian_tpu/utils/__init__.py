from gps_gaussian_tpu.utils.containers import (
    GaussianMaps,
    NovelCamera,
    NovelView,
    SourceView,
    StereoSample,
)

__all__ = [
    "GaussianMaps",
    "NovelCamera",
    "NovelView",
    "SourceView",
    "StereoSample",
]
