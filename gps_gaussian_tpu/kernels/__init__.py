"""Hot-path kernels: the differentiable Gaussian-splat rasterizer et al."""
