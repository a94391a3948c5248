"""Multi-host integration worker (spawned by ``test_multihost.py``).

One JAX process of a 2-process x 4-virtual-CPU-device runtime: joins the
``jax.distributed`` coordinator, builds the same 8-device global mesh as
the single-process reference, assembles its own contiguous block of
batch rows via ``globalize_batch``, runs shard_map train steps, and
prints the (replicated) final loss/grad-norm for the parent to compare.

Run: ``python mh_worker.py <process_id> <num_processes> <port> <steps>
[seq]`` — ``seq`` > 1 also shards the keypoint axis (context parallelism
composed with multi-host).
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # the box presets axon
jax.config.update("jax_enable_x64", True)
from mdgat_tpu.core.platform import machine_keyed_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", machine_keyed_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


def main():
    pid, nproc, port, steps = (int(a) for a in sys.argv[1:5])
    seq = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    from mdgat_tpu.parallel import (initialize_distributed,
                                    make_mesh, replicate)
    from mdgat_tpu.parallel.multihost import (globalize_batch,
                                              process_batch_rows)
    assert initialize_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

    import numpy as np
    from mdgat_tpu.models import MDGAT
    from mdgat_tpu.parallel import make_shard_map_train_step
    from mdgat_tpu.train import create_train_state

    from test_model import tiny_cfg
    from test_train import real_gt_batch

    cfg = tiny_cfg()
    model = MDGAT(cfg)
    state, tx = create_train_state(model, jax.random.PRNGKey(1), 1e-4)
    mesh = make_mesh(data=4 * nproc // seq, seq=seq)
    state = replicate(state, mesh)
    step = make_shard_map_train_step(model, tx, mesh, donate=False)

    batch_size = 8
    rows = process_batch_rows(mesh, batch_size, shard_seq=seq > 1)
    assert rows == slice(pid * batch_size // nproc,
                         (pid + 1) * batch_size // nproc), rows
    metrics = None
    for i in range(steps):
        # every process synthesizes the same global batch (same seed) and
        # feeds only its own rows — standing in for per-host disk loads
        gbatch = {k: np.asarray(v)
                  for k, v in real_gt_batch(cfg, b=batch_size,
                                            seed=10 + i).items()}
        local = {k: v[rows] for k, v in gbatch.items()}
        state, metrics = step(state, globalize_batch(local, mesh,
                                                     batch_size,
                                                     shard_seq=seq > 1))
    print(f"MH_RESULT loss={float(np.asarray(metrics['loss'])):.17g} "
          f"grad_norm={float(np.asarray(metrics['grad_norm'])):.17g}",
          flush=True)


if __name__ == "__main__":
    main()
