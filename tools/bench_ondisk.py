"""On-disk training throughput: the reference stage-1 prescription fed
from a real on-disk corpus (tools/make_corpus.py) through the native
loader + threaded prefetch, vs the synthetic-in-memory number.

Measures (a) the input pipeline alone (scenes/s drained from
batch_iterator), (b) full train steps/s of the flagship 122M bf16 config
(batch 12, 192 query rays — train_realestate10k.py:81), for ``--steps``
steps.

Usage: python -m tools.bench_ondisk --root /tmp/re10k_corpus \
            [--steps 500] [--workers 4] [--iter-only]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', required=True)
    ap.add_argument('--steps', type=int, default=500)
    ap.add_argument('--workers', type=int, default=4)
    ap.add_argument('--batch', type=int, default=12)
    ap.add_argument('--iter-only', action='store_true')
    ap.add_argument('--iter-batches', type=int, default=40)
    args = ap.parse_args()

    from cross_attention_renderer_tpu.data.realestate import (
        RealEstate10k, batch_iterator)

    ds = RealEstate10k(f'{args.root}/frames', f'{args.root}/poses.mat',
                       num_ctxt_views=2, query_sparsity=192, augment=True,
                       lpips=False, seed=0)
    print(f'{len(ds)} scenes on disk')

    it = batch_iterator(ds, args.batch, seed=0, num_workers=args.workers)
    next(it)                       # warm the prefetch pipeline
    t0 = time.perf_counter()
    for _ in range(args.iter_batches):
        batch = next(it)
    dt = time.perf_counter() - t0
    sps = args.iter_batches * args.batch / dt
    print(f'iterator: {sps:.1f} scenes/s '
          f'({args.iter_batches} batches of {args.batch}, '
          f'workers={args.workers})')
    if args.iter_only:
        return

    import jax
    import jax.numpy as jnp
    from cross_attention_renderer_tpu.models import CrossAttentionRenderer
    from cross_attention_renderer_tpu.train.trainer import (
        TrainConfig, create_train_state, make_train_step)

    model = CrossAttentionRenderer(n_view=2, dtype=jnp.bfloat16)
    first = jax.tree.map(jnp.asarray, batch)
    cfg = TrainConfig()
    state = create_train_state(model, first, cfg)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f'params: {n_params / 1e6:.1f}M  (bf16 compute)')
    step = make_train_step(model, cfg)

    state, metrics = step(state, first)            # compile
    jax.block_until_ready(metrics['total_loss'])
    t0 = time.perf_counter()
    for i in range(args.steps):
        scene = jax.tree.map(jnp.asarray, next(it))
        state, metrics = step(state, scene)
    tot = float(metrics['total_loss'])             # sync
    dt = time.perf_counter() - t0
    print(f'on-disk training: {args.steps / dt:.2f} steps/s '
          f'({args.steps} steps, loss {tot:.3f})')


if __name__ == '__main__':
    main()
