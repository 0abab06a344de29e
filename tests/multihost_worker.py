"""Worker for the 2-process fake-cluster test (launched by
test_multihost.py).  Runs one sharded stage-2 train step over a global
8-device mesh built from 2 processes x 4 virtual CPU devices."""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2
    assert jax.device_count() == 8
    assert jax.local_device_count() == 4

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gps_gaussian_tpu.testing import fake_stereo_batch
    from gps_gaussian_tpu.train import sharding, state as state_lib
    from gps_gaussian_tpu.train.config import load_config
    from gps_gaussian_tpu.train.trainer import (make_model,
                                                make_raster_config,
                                                make_train_step)

    cfg = load_config(
        None, batch_size=8,
        raster=dict(max_tiles_per_gaussian=8, max_per_tile=128,
                    backend="jnp"))
    mesh = sharding.make_mesh()
    spec = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    # every process builds the same global batch; each contributes its
    # local quarter via make_array_from_process_local_data
    host_batch = fake_stereo_batch(batch=8, res=32, novel_res=32, seed=5)

    def globalize(x):
        x = np.asarray(x)
        local = x[pid * 4:(pid + 1) * 4]
        return jax.make_array_from_process_local_data(spec, local, x.shape)

    batch = jax.tree_util.tree_map(globalize, host_batch)

    model = make_model(cfg, with_gs=True)
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") \
            else _null():
        params = model.init(jax.random.PRNGKey(0), host_batch,
                            iters=cfg.raft.train_iters)
    params = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            rep, np.asarray(x), np.asarray(x).shape), params)
    state = state_lib.create_state(cfg, params)

    step = jax.jit(make_train_step(model, cfg, "stage2",
                                   make_raster_config(cfg)))
    state, metrics = step(state, batch)
    vals = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    assert int(state.step) == 1
    print(f"WORKER{pid} OK", vals, flush=True)


class _null:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
