"""Device mesh + data-parallel sharding (SURVEY.md §2.4 TPU plan).

The reference is single-GPU with no distributed support (SURVEY.md §5.8);
here data parallelism is first-class: stereo pairs shard over the ('data',)
mesh axis, parameters/optimizer state replicate, and XLA inserts the
gradient all-reduce over ICI (overlapped with backward by the latency-
hiding scheduler).  Multi-host entry goes through jax.distributed.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leaves with a leading batch axis shard over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch pytree with batch-axis sharding."""
    bs = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, bs)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


def init_distributed():
    """Multi-host initialisation (no-op on a single process).

    Failures are WARNED, never swallowed silently: a misconfigured
    multi-host job that falls back to single-process should say so."""
    if jax.process_count() > 1:
        return  # already initialised by the launcher
    try:
        jax.distributed.initialize()
    except Exception as e:
        import logging

        logging.getLogger("gps_tpu.sharding").warning(
            "jax.distributed.initialize() failed (%s); continuing "
            "single-process — multi-host jobs will NOT see each other", e)
