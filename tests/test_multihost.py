"""Multi-host (multi-process) distribution tests.

The real 2-process run happens in SUBPROCESSES (each with its own 4-device
CPU backend + jax.distributed rendezvous on localhost) because the test
process itself owns a single-process 8-device backend. The single-process
helpers are tested in-process.
"""

import socket
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def test_single_process_passthrough():
    """All distributed helpers degrade to the single-process behavior."""
    from cross_attention_renderer_tpu.parallel.distributed import (
        global_scene, initialize, is_primary, make_global_mesh,
        process_batch_slice)
    initialize()                       # no-op without a coordinator
    assert is_primary()
    assert process_batch_slice(12) == (0, 12)
    mesh = make_global_mesh(model=2)
    assert dict(mesh.shape) == {'data': 4, 'model': 2, 'rays': 1}

    from cross_attention_renderer_tpu.data import make_scene
    scene = make_scene(0, batch=4, n_view=2, H=64, W=64, n_rays=16)
    g = global_scene(scene, mesh)
    rgb = g['context']['rgb']
    assert rgb.sharding.spec == jax.sharding.PartitionSpec(
        'data', None, None, None, None)
    np.testing.assert_array_equal(np.asarray(rgb),
                                  np.asarray(scene['context']['rgb']))


def test_batch_iterator_shards_partition_the_global_batch():
    """Process shards are disjoint, cover each global batch, and keep
    globally unique item serials."""
    from cross_attention_renderer_tpu.data.realestate import batch_iterator

    class Probe:
        def __len__(self):
            return 16

        def getitem_seeded(self, idx, serial):
            return {'idx': np.array(idx), 'serial': np.array(serial)}

    def take(shard, n_batches=3):
        it = batch_iterator(Probe(), 8, seed=3, to_device=False, shard=shard)
        return [next(it) for _ in range(n_batches)]

    full = take((0, 1))
    p0 = take((0, 2))
    p1 = take((1, 2))
    for b_full, b0, b1 in zip(full, p0, p1):
        np.testing.assert_array_equal(
            np.concatenate([b0['idx'], b1['idx']]), b_full['idx'])
        np.testing.assert_array_equal(
            np.concatenate([b0['serial'], b1['serial']]), b_full['serial'])


@pytest.mark.slow
def test_two_process_cpu_train_step(tmp_path):
    """2 processes x 4 virtual CPU devices: jax.distributed rendezvous, a
    global DP(4)xTP(2) mesh, per-process input rows assembled with
    make_array_from_process_local_data, two train steps — both processes
    must agree with each other AND with the single-process mesh step on the
    same global batch."""
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, str(REPO / 'tools' / 'multihost_smoke.py'),
         str(pid), '2', str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env={**__import__('os').environ,
                       'PYTHONPATH': str(REPO)})
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, out
    lines = [next(l for l in o.splitlines() if l.startswith('MHOK'))
             for o in outs]
    assert lines[0] == lines[1], lines

    # single-process ground truth on the same global batch
    from cross_attention_renderer_tpu.data import make_scene
    from cross_attention_renderer_tpu.models import CrossAttentionRenderer
    from cross_attention_renderer_tpu.parallel import make_mesh
    from cross_attention_renderer_tpu.train.trainer import (
        TrainConfig, create_train_state, make_train_step, shard_state)
    TINY = dict(fusion_features=32, vit_width=64, vit_depth=2, vit_heads=2,
                resnet_layers=(1, 1, 1))
    model = CrossAttentionRenderer(n_view=2, npoints=8, **TINY)
    cfg = TrainConfig(lr=1e-3)
    scenes = [make_scene(s, batch=8, n_view=2, H=64, W=64, n_rays=16)
              for s in (0, 1)]
    mesh = make_mesh(data=4, model=2)
    state = shard_state(create_train_state(model, scenes[0], cfg), mesh)
    step = make_train_step(model, cfg, mesh=mesh)
    state, m0 = step(state, scenes[0])
    state, m1 = step(state, scenes[1])
    k = state.params['params']['phi']['lin_out']['kernel']
    want = (float(m0['total_loss']), float(m1['total_loss']),
            float(np.sum(np.asarray(k, np.float32) ** 2)))
    got = tuple(float(x) for x in lines[0].split()[1:])
    np.testing.assert_allclose(got, want, rtol=2e-4)
