"""Multi-host (multi-process) distribution: pod slices and beyond.

Replaces the reference's single-node NCCL rendezvous
(``train_realestate10k.py:71`` — ``dist.init_process_group('nccl',
init_method='tcp://localhost:1493')`` + ``mp.spawn`` per GPU) with the
TPU-native recipe:

  * one process per host, ``jax.distributed.initialize`` for the rendezvous
    (SURVEY.md §2.2 comm-backend row);
  * ONE global mesh over all processes' devices — the ``data`` axis spans
    the DCN (process) boundary first, so gradient all-reduces ride ICI
    within a slice and cross DCN only for the final partial reduction;
  * deterministic per-process input sharding: every process loads only its
    rows of the global batch (:func:`process_batch_slice`) and the global
    device array is assembled with ``jax.make_array_from_process_local_data``
    (:func:`global_scene`) — replacing the reference's per-rank independent
    full-dataset shuffle ("shuffle and hope", train_realestate10k.py:80-86).

Single-process sessions pass through every helper unchanged, so the trainer
and CLI call them unconditionally.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cross_attention_renderer_tpu.parallel.mesh import scene_shardings

Array = Any


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[list[int]] = None) -> None:
    """Join the multi-process job (no-op for single-process runs).

    Thin wrapper over ``jax.distributed.initialize``; arguments may also
    come from the standard env vars (``JAX_COORDINATOR_ADDRESS`` etc.) or,
    on real multi-host TPU pods, from the TPU metadata with no arguments at
    all. Must run before any other JAX call (it changes the device set).
    """
    if (coordinator_address is None and num_processes is None
            and process_id is None
            and 'JAX_COORDINATOR_ADDRESS' not in os.environ):
        return  # single-process session
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)


def make_global_mesh(data: int = 0, model: int = 1, rays: int = 1) -> Mesh:
    """Build the (data, model, rays) mesh over ALL processes' devices.

    The ``data`` axis is laid out process-major: ``jax.devices()`` orders
    devices by process, so reshaping (data, model, rays) row-major puts the
    process (DCN) boundary on the outermost stride of ``data`` while
    ``model``/``rays`` stay inside one process's slice — collectives for TP
    and ray-SP never leave ICI, and the DP all-reduce does a hierarchical
    ICI-then-DCN reduction (XLA does this automatically for meshes whose
    DCN axis is outermost). ``data=0`` means "all remaining".

    Constraint (asserted): ``model * rays`` must divide the per-process
    device count, i.e. TP/SP groups never straddle hosts.
    """
    devices = jax.devices()
    n = len(devices)
    per_proc = jax.local_device_count()
    assert per_proc % (model * rays) == 0, (
        f'model*rays ({model}*{rays}) must divide the per-process device '
        f'count {per_proc}: TP/ray groups must not straddle hosts')
    if data == 0:
        assert n % (model * rays) == 0, (n, model, rays)
        data = n // (model * rays)
    assert data * model * rays == n, (data, model, rays, n)
    import numpy as np
    dev_array = np.asarray(devices).reshape(data, model, rays)
    return Mesh(dev_array, ('data', 'model', 'rays'))


def process_batch_slice(global_batch: int) -> tuple[int, int]:
    """(start, size) of this process's rows of the global batch.

    Deterministic contiguous split: process p loads rows
    [p*size, (p+1)*size). The global batch must divide evenly — uneven
    host batches would make the jitted step's shapes process-dependent.
    """
    nproc = jax.process_count()
    assert global_batch % nproc == 0, (
        f'global batch {global_batch} must divide by process count {nproc}')
    size = global_batch // nproc
    return jax.process_index() * size, size


def global_scene(scene_local: dict, mesh: Mesh,
                 batch_axis: str = 'data') -> dict:
    """Assemble the global (jax.Array) scene from process-local host data.

    Each process passes its own batch rows; the result is one global array
    per leaf, batch-sharded over ``batch_axis`` exactly like the
    single-process ``device_put`` path. Single-process: equivalent to
    ``jax.device_put(scene, scene_shardings(scene, mesh))``.
    """
    import numpy as np
    if jax.process_count() == 1:
        return jax.device_put(scene_local, scene_shardings(scene_local, mesh))

    nproc = jax.process_count()

    def put(x):
        x = np.asarray(x)
        spec = [None] * x.ndim
        global_shape = list(x.shape)
        if x.ndim >= 1:
            global_shape[0] = x.shape[0] * nproc
            if global_shape[0] % mesh.shape[batch_axis] == 0:
                spec[0] = batch_axis
            else:   # replicated leaf: all processes hold identical rows
                global_shape[0] = x.shape[0]
        sharding = NamedSharding(mesh, P(*spec))
        if spec and spec[0] is None:
            return jax.make_array_from_callback(
                tuple(global_shape), sharding, lambda idx: x[idx])
        return jax.make_array_from_process_local_data(
            sharding, x, tuple(global_shape))

    return jax.tree.map(put, scene_local)


def is_primary() -> bool:
    """True on the logging/checkpoint-writing process (reference rank-0
    semantics, training.py:60,82,105)."""
    return jax.process_index() == 0
