"""Training runtime (L4): jitted mesh-parallel train step + curriculum loop.

Replaces the reference's process-per-GPU NCCL stack (``training.py:21-28``,
``train_realestate10k.py:60-135``) with the TPU-native recipe: one process,
one ``jax.jit`` train step over a device mesh, parameters and optimizer state
sharded via ``NamedSharding`` (TP rules in
:mod:`cross_attention_renderer_tpu.parallel.mesh`), batch sharded over the
``data`` axis. Gradient reduction is an XLA-inserted all-reduce over ICI —
the per-parameter Python-loop ``dist.all_reduce`` of the reference
(training.py:21-28) has no equivalent here by design.

Optimizer matches the reference prescription: Adam(lr 5e-5, betas
(0.99, 0.999)) (train_realestate10k.py:39,93) with global-norm clip 1.0
(training.py:130-134). Checkpointing via orbax with the reference's
"current + milestone" cadence (training.py:82-84,118-120,233-246).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from cross_attention_renderer_tpu.losses import LFLoss, total_loss
from cross_attention_renderer_tpu.parallel import param_shardings

Array = Any


class TrainState(train_state.TrainState):
    """Standard flax TrainState (params + optax state + step)."""


@dataclasses.dataclass
class TrainConfig:
    lr: float = 5e-5
    beta1: float = 0.99           # train_realestate10k.py:93
    beta2: float = 0.999
    clip_norm: float = 1.0        # training.py:130-132
    depth: bool = False
    lpips: bool = False
    l2_weight: float = 1e-3
    steps_til_summary: int = 1000  # train_realestate10k.py cadence
    epochs_til_checkpoint: int = 1
    iters_til_checkpoint: int = 10000


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.clip_norm),
        optax.adam(cfg.lr, b1=cfg.beta1, b2=cfg.beta2),
    )


def create_train_state(model, scene, cfg: TrainConfig,
                       rng=None) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    params = jax.jit(model.init)(rng, scene)
    return TrainState.create(apply_fn=model.apply, params=params,
                             tx=make_optimizer(cfg))


def _train_model(model):
    """The model configuration used inside the train step: fused Pallas
    kernels OFF (jnp paths), unless ``CAR_TRAIN_KERNELS=1`` opts in.

    Measured policy (BENCH_NOTES round 4): the kernels' custom VJPs
    recompute the jnp reference forward in the backward anyway, so under
    ``value_and_grad`` they only add a redundant Pallas forward — and the
    flagship batch-12 program with the kernels inlined crashes the TPU
    compiler's register allocator outright. The jnp path is the training
    configuration that the steps/s numbers describe; the kernels remain
    the eval/render hot path.
    """
    import os
    if os.environ.get('CAR_TRAIN_KERNELS', '0') == '1':
        return model
    if getattr(model, 'fused_attention', None) is None and \
            getattr(model, 'fused_epilogue', None) is None:
        return model.clone(fused_attention=False, fused_epilogue=False)
    return model


def make_loss_fn(model, cfg: TrainConfig,
                 lpips_fn: Optional[Callable] = None,
                 loss_schedules: Optional[dict] = None):
    """loss_schedules: optional {loss_name: fn(step)->weight}, evaluated
    inside the jitted step (fns must be jnp-traceable). Ref: the per-loss
    schedule hooks in training.py:96-107."""
    model = _train_model(model)
    loss = LFLoss(l2_weight=cfg.l2_weight, depth=cfg.depth,
                  lpips_fn=lpips_fn if cfg.lpips else None)

    def loss_fn(params, scene, step=0):
        out = model.apply(params, scene)
        losses = loss(out, scene['query'])
        if loss_schedules:
            losses = {k: (v * loss_schedules[k](step)
                          if k in loss_schedules else v)
                      for k, v in losses.items()}
        return total_loss(losses), losses

    return loss_fn


def make_train_step(model, cfg: TrainConfig, mesh=None,
                    lpips_fn: Optional[Callable] = None,
                    loss_schedules: Optional[dict] = None):
    """Build the jitted (state, scene) -> (state, metrics) step.

    With a mesh, parameters/opt-state follow the TP rules and the scene is
    batch-sharded over 'data'; XLA inserts the gradient all-reduce.
    """
    loss_fn = make_loss_fn(model, cfg, lpips_fn, loss_schedules)

    def step(state: TrainState, scene) -> tuple[TrainState, dict]:
        (tot, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, scene, state.step)
        gnorm = optax.global_norm(grads)
        new_state = state.apply_gradients(grads=grads)
        metrics = {'total_loss': tot, 'grad_norm': gnorm}
        metrics.update({k: jnp.mean(v) for k, v in losses.items()})
        return new_state, metrics

    jitted = jax.jit(step, donate_argnums=0)
    if mesh is None:
        return jitted

    def mesh_step(state, scene):
        # Inputs are committed to their shardings (state via shard_state,
        # scene batch-sharded over 'data'); jit propagates them and XLA
        # inserts the gradient all-reduce over ICI (and DCN across hosts).
        # Multi-process: `scene` holds this process's batch rows only and
        # global_scene assembles the global array (single-process it is
        # exactly device_put(scene_shardings)).
        from cross_attention_renderer_tpu.parallel.distributed import (
            global_scene)
        scene = global_scene(scene, mesh)
        return jitted(state, scene)

    return mesh_step


def shard_state(state: TrainState, mesh) -> TrainState:
    """Place params per the TP rules (opt state follows params' shardings)."""
    p_shard = param_shardings(state.params, mesh)
    params = jax.device_put(state.params, p_shard)

    def opt_put(x):
        return jax.device_put(
            x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))

    # Adam mu/nu mirror the param tree: shard them identically.
    def put_opt_state(os):
        if isinstance(os, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=opt_put(os.count),
                mu=jax.device_put(os.mu, p_shard),
                nu=jax.device_put(os.nu, p_shard))
        return jax.tree.map(opt_put, os,
                            is_leaf=lambda x: isinstance(x, jax.Array))

    opt_state = tuple(put_opt_state(os) for os in state.opt_state)
    return state.replace(params=params, opt_state=opt_state)


# ---------------------------------------------------------------------------
# Checkpointing (orbax): "current + milestone" cadence like training.py.
# ---------------------------------------------------------------------------

def save_checkpoint(ckpt_dir: str | Path, state: TrainState,
                    name: str = 'current'):
    import orbax.checkpoint as ocp
    path = (Path(ckpt_dir) / name).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {'params': state.params, 'opt_state': state.opt_state,
                      'step': state.step}, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(ckpt_dir: str | Path, state: TrainState,
                       name: str = 'current',
                       restore_optimizer: bool = False) -> TrainState:
    """Warm start. Like the reference, the optimizer state is NOT restored
    by default (train_realestate10k.py:100-101 keeps it commented out)."""
    import orbax.checkpoint as ocp
    path = (Path(ckpt_dir) / name).absolute()
    ckptr = ocp.StandardCheckpointer()
    target = {'params': state.params, 'opt_state': state.opt_state,
              'step': state.step}
    restored = ckptr.restore(path, target)
    state = state.replace(params=restored['params'])
    if restore_optimizer:
        state = state.replace(opt_state=restored['opt_state'],
                              step=restored['step'])
    return state


# ---------------------------------------------------------------------------
# Curriculum training loop (reference training.training/train,
# training.py:32-248).
# ---------------------------------------------------------------------------

def fit(model, cfg: TrainConfig, data_iter: Iterator[dict], max_steps: int,
        ckpt_dir: Optional[str] = None, mesh=None, state: Optional[TrainState] = None,
        log_fn: Optional[Callable[[int, dict], None]] = None,
        val_fn: Optional[Callable[[TrainState, int], None]] = None,
        lpips_fn: Optional[Callable] = None,
        loss_schedules: Optional[dict] = None,
        resume: bool = True) -> TrainState:
    """Single curriculum stage: iterate `data_iter` for `max_steps` steps.

    ``lpips_fn`` is required when ``cfg.lpips`` is set — the stage-2
    fine-tune (reference README.md:56-58, loss_functions.py:102-118) must
    not silently train without its perceptual term.

    Fault tolerance (the trainer-level recovery the reference lacks —
    SURVEY.md §5): when ``resume`` and a 'current' checkpoint exists in
    ``ckpt_dir``, training continues from it (params + optimizer + step).
    """
    if cfg.lpips and lpips_fn is None:
        raise ValueError(
            'cfg.lpips=True but no lpips_fn was provided; construct one '
            'with losses.lpips.load_lpips() (stage-2 fine-tune must not '
            'silently train without the LPIPS term)')
    first = next(data_iter)
    if state is None:
        state = create_train_state(model, first, cfg)
        # Shard BEFORE restoring: orbax then restores straight into the
        # NamedSharding-placed buffers (the post-preemption path of a real
        # multi-chip job — no host-side staging of the full state).
        if mesh is not None:
            state = shard_state(state, mesh)
        if (resume and ckpt_dir
                and (Path(ckpt_dir) / 'current').exists()):
            state = restore_checkpoint(ckpt_dir, state, 'current',
                                       restore_optimizer=True)
            print(f'resumed from {ckpt_dir}/current at step '
                  f'{int(state.step)}', flush=True)
    elif mesh is not None:
        state = shard_state(state, mesh)
    step_fn = make_train_step(model, cfg, mesh, lpips_fn=lpips_fn,
                              loss_schedules=loss_schedules)

    scene = first
    start = int(state.step)
    for i in range(start, max_steps):
        state, metrics = step_fn(state, scene)
        if i + 1 < max_steps:
            scene = next(data_iter)
        if log_fn is not None:
            log_fn(i, metrics)
        if ckpt_dir and (i + 1) % cfg.iters_til_checkpoint == 0:
            save_checkpoint(ckpt_dir, state, f'step_{i + 1:06d}')
        if ckpt_dir and (i + 1) % cfg.steps_til_summary == 0:
            save_checkpoint(ckpt_dir, state, 'current')
            if val_fn is not None:
                val_fn(state, i)
    if ckpt_dir:
        save_checkpoint(ckpt_dir, state, 'final')
    jax.block_until_ready(state.params)
    return state
