"""Training-step throughput on the real chip, reference stage-1 config.

Flagship 2-view model, batch 12, 192 query rays (train_realestate10k.py
batch_size/query_sparsity), bf16 compute, synthetic in-memory scenes.
Round-1 reference: 1.36 steps/s (BENCH_NOTES.md).
"""

import time

import jax
import jax.numpy as jnp

from cross_attention_renderer_tpu.data import make_scene
from cross_attention_renderer_tpu.models import CrossAttentionRenderer
from cross_attention_renderer_tpu.train.trainer import (
    TrainConfig, create_train_state, make_train_step)


def main():
    scene = make_scene(0, batch=12, n_view=2, H=256, W=256, n_rays=192)
    model = CrossAttentionRenderer(n_view=2, dtype=jnp.bfloat16)
    cfg = TrainConfig()
    state = create_train_state(model, scene, cfg)
    step = make_train_step(model, cfg)

    state, metrics = step(state, scene)
    float(metrics['total_loss'])  # compile + settle
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, scene)
    float(metrics['total_loss'])
    dt = (time.perf_counter() - t0) / n
    print(f'train step: {dt * 1e3:.1f} ms  {1 / dt:.2f} steps/s')


if __name__ == '__main__':
    main()
