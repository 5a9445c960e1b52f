"""Isolate which fused kernel breaks the TPU train-step compile.

The flagship train step at HEAD dies in XLA regalloc (RET_CHECK
live_range_finder.cc:29) — see BENCH_NOTES round 4. This probes the four
(epilogue, attention) on/off combinations on a REDUCED flagship (full
channel widths, fewer ViT blocks — the crash is in the render backward,
not the encoder) so each compile is minutes not tens of minutes.

Usage: python tools/probe_train_compile.py [epi] [attn]
  epi/attn: 1|0 — run exactly one combination per process (compiler state
  is not reusable after the RET_CHECK crash).
"""

import os
import sys

epi = sys.argv[1] if len(sys.argv) > 1 else '1'
attn = sys.argv[2] if len(sys.argv) > 2 else '1'
depth = int(sys.argv[3]) if len(sys.argv) > 3 else 2
batch = int(sys.argv[4]) if len(sys.argv) > 4 else 2
os.environ['CAR_FUSED_EPILOGUE'] = epi

import jax
import jax.numpy as jnp

from cross_attention_renderer_tpu.data import make_scene
from cross_attention_renderer_tpu.models import CrossAttentionRenderer
from cross_attention_renderer_tpu.train.trainer import (
    TrainConfig, create_train_state, make_train_step)


def main():
    scene = make_scene(0, batch=batch, n_view=2, H=256, W=256, n_rays=192)
    model = CrossAttentionRenderer(n_view=2, dtype=jnp.bfloat16,
                                   vit_depth=depth,
                                   fused_attention=(attn == '1'))
    cfg = TrainConfig()
    state = create_train_state(model, scene, cfg)
    step = make_train_step(model, cfg)
    state, metrics = step(state, scene)
    print(f'epi={epi} attn={attn} depth={depth} batch={batch}: OK  '
          f'total_loss={float(metrics["total_loss"]):.4f}', flush=True)


if __name__ == '__main__':
    main()
