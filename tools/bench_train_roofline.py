"""Train-step roofline: decompose the flagship stage-1 step on the chip.

VERDICT r4 weak #3: the train step (batch 12, 192 rays, bf16; the config
from /root/reference/train_realestate10k.py:33-39 + training.py:124-136)
runs the jnp render path at ~3.2 steps/s and nobody has published where
the 310 ms goes. This tool splits it:

  full step            = fwd + bwd + optimizer update
  fwd                  = encoder fwd + render fwd + loss
  render-only fwd+bwd  = value_and_grad with the encoder latent z held
                         constant (stop_gradient) -> the epipolar
                         gather/exchange/attention/decoder share
  encoder fwd+bwd      = (full fwd+bwd) - (render-only fwd+bwd)

plus an analytic FLOP count for the MFU column. All timings are steady-
state means over N steps with a value fetch (tunnel-safe).
"""

import time

import jax
import jax.numpy as jnp

from cross_attention_renderer_tpu.data import make_scene
from cross_attention_renderer_tpu.models import CrossAttentionRenderer
from cross_attention_renderer_tpu.train.trainer import (
    TrainConfig, create_train_state, make_loss_fn, make_train_step)

N = 10


def timed(fn, *args):
    """fn must return a scalar; the value fetch is the sync point (the
    tunnel's block_until_ready alone reports bogus sub-ms numbers —
    BENCH_NOTES 'always fetch')."""
    float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(N):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / N


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('--vit_depth', type=int, default=12)
    ap.add_argument('--no_high_freq', action='store_true')
    ap.add_argument('--batch', type=int, default=12)
    ap.add_argument('--remat', action='store_true',
                    help='checkpoint the encoder (trade FLOPs for traffic)')
    a = ap.parse_args()

    scene = make_scene(0, batch=a.batch, n_view=2, H=256, W=256, n_rays=192)
    kw = {}
    if a.vit_depth != 12:
        kw['vit_depth'] = a.vit_depth
    if a.no_high_freq:
        kw['no_high_freq'] = True
    if a.remat:
        kw['remat'] = True
    model = CrossAttentionRenderer(n_view=2, dtype=jnp.bfloat16, **kw)
    cfg = TrainConfig()
    state = create_train_state(model, scene, cfg)
    params = state.params
    step = make_train_step(model, cfg)
    loss_fn = make_loss_fn(model, cfg)

    def tree_sum(t):
        return jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), t))

    # --- full step (scalar depends on every updated param leaf, so XLA
    # cannot DCE the optimizer update) ---------------------------------
    @jax.jit
    def run_step(state, scene):
        new_state, metrics = step(state, scene)
        return metrics['total_loss'] + 0.0 * tree_sum(new_state.params)
    t_step = timed(run_step, state, scene)

    # --- forward only ------------------------------------------------
    fwd = jax.jit(lambda p, sc: loss_fn(p, sc)[0])
    t_fwd = timed(fwd, params, scene)

    # --- forward + backward (no optimizer) ----------------------------
    @jax.jit
    def vg(p, sc):
        val, grads = jax.value_and_grad(lambda q: loss_fn(q, sc)[0])(p)
        return val + 0.0 * tree_sum(grads)
    t_fwd_bwd = timed(vg, params, scene)

    # --- render-only forward+backward (z constant) --------------------
    from cross_attention_renderer_tpu.train.trainer import _train_model
    tm = _train_model(model)
    encode = jax.jit(lambda p, sc: tm.apply(p, sc, method='encode'))
    z = jax.block_until_ready(encode(params, scene))
    z_const = jax.tree.map(jax.lax.stop_gradient, z)

    from cross_attention_renderer_tpu.losses import LFLoss, total_loss
    loss_obj = LFLoss(l2_weight=cfg.l2_weight, depth=cfg.depth,
                      lpips_fn=None)

    def render_loss(p, sc, zz):
        out = tm.apply(p, sc, z=zz)
        return total_loss(loss_obj(out, sc['query']))

    @jax.jit
    def vg_render(p, sc, zz):
        val, grads = jax.value_and_grad(
            lambda q: render_loss(q, sc, zz))(p)
        return val + 0.0 * tree_sum(grads)
    t_render_fb = timed(vg_render, params, scene, z_const)

    # --- encoder forward alone ----------------------------------------
    enc_scalar = jax.jit(lambda p, sc: tree_sum(encode(p, sc)))
    t_enc_fwd = timed(enc_scalar, params, scene)

    t_opt = t_step - t_fwd_bwd
    t_bwd = t_fwd_bwd - t_fwd
    t_enc_fb = t_fwd_bwd - t_render_fb

    # Analytic FLOPs (batch 12): encoder fwd ~= 2 * 120e9 bf16 MACs?  Use
    # XLA's own counter instead: cost analysis on the compiled step.
    comp = run_step.lower(state, scene).compile()
    flops = comp.cost_analysis().get('flops', float('nan'))
    mfu = flops / t_step / 197e12 * 100  # v5e bf16 peak 197 TFLOP/s
    hbm = comp.cost_analysis().get('bytes accessed', float('nan'))

    print(f'full step        : {t_step*1e3:8.1f} ms   {1/t_step:.2f} steps/s')
    print(f'  forward        : {t_fwd*1e3:8.1f} ms')
    print(f'  backward       : {t_bwd*1e3:8.1f} ms')
    print(f'  optimizer+clip : {t_opt*1e3:8.1f} ms')
    print(f'fwd+bwd split    :')
    print(f'  render-only f+b: {t_render_fb*1e3:8.1f} ms  (z const)')
    print(f'  encoder f+b    : {t_enc_fb*1e3:8.1f} ms  (by difference)')
    print(f'  encoder fwd    : {t_enc_fwd*1e3:8.1f} ms')
    print(f'XLA cost model   : {flops/1e12:.2f} TFLOP/step, '
          f'{hbm/1e9:.1f} GB accessed')
    print(f'MFU (v5e bf16)   : {mfu:.1f}%  '
          f'(HBM {hbm/t_step/1e9:.0f} GB/s of 819)')


if __name__ == '__main__':
    main()
