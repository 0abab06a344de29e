"""GPS-Gaussian TPU: TPU-native generalizable pixel-wise 3D Gaussian splatting.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
aipixel/GPS-Gaussian (CVPR 2024): real-time human novel-view synthesis from a
rectified stereo pair via a RAFT-Stereo disparity head, a pixel-wise Gaussian
parameter regressor, and a differentiable tile-binned Gaussian rasterizer.

Layout (reference layer map: /root/reference, SURVEY.md §1):
  geometry/  camera math, stereo rectification, flow<->depth<->points
  ops/       Pallas/XLA kernels: rasterizer, correlation pyramid, sampling
  models/    flax networks: UNet extractor, RAFT-Stereo GRU head, GS regressor
  data/      dataset, offline rectification cache, synthetic fixtures
  train/     losses, metrics, train states, stage1/stage2 loops
  parallel/  device mesh + sharding helpers (DP over stereo pairs, tile/gaussian
             sharding for multi-chip rendering)
  infer/     freeview interpolation / sequence renderers
  utils/     typed pytrees (the fixed-shape data contract), logging
"""

__version__ = "0.1.0"
