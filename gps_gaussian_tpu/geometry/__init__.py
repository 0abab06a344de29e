from gps_gaussian_tpu.geometry import cameras, pointcloud, stereo

__all__ = ["cameras", "pointcloud", "stereo"]
