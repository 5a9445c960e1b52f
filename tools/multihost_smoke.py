"""Multi-host validation worker: one PROCESS of an N-process CPU job.

Launched N times by tests/test_multihost.py (and usable by hand):

  python tools/multihost_smoke.py <process_id> <num_processes> <port>

Each process gets 4 virtual CPU devices; the job builds ONE global
(data=2N, model=2) mesh via jax.distributed, loads only its rows of the
global batch, assembles global arrays with
jax.make_array_from_process_local_data, and runs two DP x TP train steps.
Prints `MHOK <loss0> <loss1> <param_checksum>` — every process must print
identical values, and they must match the single-process mesh step on the
same global batch (asserted by the test).

This is the multi-host proof SURVEY.md §2.2 requires in place of the
reference's single-node NCCL stack (train_realestate10k.py:71).
"""

import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    os.environ.pop('JAX_PLATFORMS', None)

    import jax
    jax.config.update('jax_platforms', 'cpu')

    from cross_attention_renderer_tpu.parallel.distributed import (
        initialize, make_global_mesh, process_batch_slice)
    initialize(f'localhost:{port}', nproc, pid,
               local_device_ids=list(range(4)))
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert jax.local_device_count() == 4

    import numpy as np

    from cross_attention_renderer_tpu.data import make_scene
    from cross_attention_renderer_tpu.models import CrossAttentionRenderer
    from cross_attention_renderer_tpu.train.trainer import (
        TrainConfig, create_train_state, make_train_step, shard_state)

    TINY = dict(fusion_features=32, vit_width=64, vit_depth=2, vit_heads=2,
                resnet_layers=(1, 1, 1))
    GLOBAL_BATCH = 4 * nproc

    mesh = make_global_mesh(model=2)       # data = 2*nproc, TP inside hosts
    model = CrossAttentionRenderer(n_view=2, npoints=8, **TINY)
    cfg = TrainConfig(lr=1e-3)

    # Every process materializes the same GLOBAL batch host-side (make_scene
    # is seed-deterministic) and keeps only its rows.
    start, size = process_batch_slice(GLOBAL_BATCH)
    scenes = [make_scene(s, batch=GLOBAL_BATCH, n_view=2, H=64, W=64,
                         n_rays=16) for s in (0, 1)]
    local = [jax.tree.map(lambda x: np.asarray(x)[start:start + size], s)
             for s in scenes]

    state = create_train_state(model, local[0], cfg)
    state = shard_state(state, mesh)
    step = make_train_step(model, cfg, mesh=mesh)

    state, m0 = step(state, local[0])
    state, m1 = step(state, local[1])

    # phi/lin_out is replicated under the TP rules -> fully addressable.
    k = state.params['params']['phi']['lin_out']['kernel']
    checksum = float(jax.jit(lambda a: (a.astype('float32') ** 2).sum())(k))
    print(f'MHOK {float(m0["total_loss"]):.8f} '
          f'{float(m1["total_loss"]):.8f} {checksum:.8f}', flush=True)


if __name__ == '__main__':
    main()
