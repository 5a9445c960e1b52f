"""End-to-end capability run on the real TPU: learn to render novel views
of held-out synthetic worlds (the round-1 demo protocol, BENCH_NOTES.md).

Trains a ~8M medium config on multi-view-consistent textured-plane worlds
(data/synthetic.py make_plane_scene) and evaluates full-image PSNR on an
UNSEEN world + UNSEEN query pose every ``--eval-every`` steps. Writes a
GT-vs-prediction image to docs/capability_demo.png at the end.

Usage: python -m tools.capability_run [--steps 4000] [--worlds 128]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from cross_attention_renderer_tpu.data.synthetic import (make_boxes_scene,
                                                          make_plane_scene)
from cross_attention_renderer_tpu.models import CrossAttentionRenderer
from cross_attention_renderer_tpu.train.trainer import (
    TrainConfig, create_train_state, make_train_step)

H = W = 64
BATCH = 8
N_RAYS = 256

# Model configs shared with tools/eval_pruned.py. 'medium' is the 8M TPU
# demo (round-1 protocol); 'tiny' trains on host CPU in ~15 min for
# fast-eval quality checks when the chip is unreachable.
CONFIGS = {
    'medium': dict(npoints=32, fusion_features=128, vit_width=256,
                   vit_depth=4, vit_heads=8, resnet_layers=(2, 2, 2)),
    'tiny': dict(npoints=16, fusion_features=32, vit_width=64,
                 vit_depth=2, vit_heads=2, resnet_layers=(1, 1, 1)),
}


def load_world(seed, kind='plane'):
    maker = make_boxes_scene if kind == 'boxes' else make_plane_scene
    s = maker(seed, n_view=2, H=H, W=W)                # full-image query
    return jax.tree.map(np.asarray, s)


def batch_scene(worlds, rng):
    picks = rng.integers(0, len(worlds), BATCH)
    out = {'context': {}, 'query': {}}
    for grp in ('context', 'query'):
        keys = worlds[0][grp].keys()
        for k in keys:
            out[grp][k] = np.concatenate(
                [worlds[p][grp][k] for p in picks], axis=0)
    sel = rng.integers(0, H * W, (BATCH, N_RAYS))
    uv = np.stack([out['query']['uv'][b, 0, sel[b]] for b in range(BATCH)])
    gt = np.stack([out['query']['rgb'][b, 0, sel[b]] for b in range(BATCH)])
    out['query']['uv'] = uv[:, None]
    out['query']['rgb'] = gt[:, None]
    return jax.tree.map(jnp.asarray, out)


def psnr(pred, gt):
    mse = float(np.mean((pred - gt) ** 2))
    return 10.0 * np.log10(4.0 / max(mse, 1e-10))      # rgb in [-1, 1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=4000)
    ap.add_argument('--worlds', type=int, default=128)
    ap.add_argument('--eval-every', type=int, default=500)
    ap.add_argument('--lr', type=float, default=2.5e-4)
    ap.add_argument('--dtype', default='f32', choices=['f32', 'bf16'],
                    help='compute dtype (params/optimizer stay f32)')
    ap.add_argument('--out', default='docs/capability_demo.png')
    ap.add_argument('--save', default=None, metavar='PATH.npz',
                    help='save the best params (flattened npz) for reuse '
                         'by tools/eval_pruned.py')
    ap.add_argument('--config', default='medium',
                    choices=['medium', 'tiny'],
                    help='medium = the 8M TPU demo config; tiny = a '
                         'CPU-trainable config for fast-eval quality '
                         'checks when the chip is unavailable')
    ap.add_argument('--world', default='plane', choices=['plane', 'boxes'],
                    help='boxes adds floating occluders (depth structure '
                         'that makes sampling strategy matter)')
    ap.add_argument('--platform', default='auto', choices=['auto', 'cpu'],
                    help='cpu forces the host backend (the axon plugin '
                         'ignores JAX_PLATFORMS; a down tunnel hangs '
                         'device init)')
    args = ap.parse_args()
    if args.platform == 'cpu':
        jax.config.update('jax_platforms', 'cpu')

    rng = np.random.default_rng(0)
    worlds = [load_world(s, args.world) for s in range(args.worlds)]
    held_out = jax.tree.map(jnp.asarray, load_world(100003, args.world))

    model = CrossAttentionRenderer(
        n_view=2, **CONFIGS[args.config],
        dtype=jnp.bfloat16 if args.dtype == 'bf16' else jnp.float32)
    # lr 5e-4 diverges around step ~2k on this workload even with plain
    # cosine decay; warmup + a 2.5e-4 peak is stable for the full run.
    import optax
    warmup = min(300, max(1, args.steps // 10))
    cfg = TrainConfig(lr=optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=warmup,
        decay_steps=max(args.steps, warmup + 1)))
    scene0 = batch_scene(worlds, rng)
    state = create_train_state(model, scene0, cfg)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f'params: {n_params / 1e6:.1f}M')
    step = make_train_step(model, cfg)

    @jax.jit
    def render_eval(params, scene):
        return model.apply(params, scene)['rgb']

    def eval_psnr(params):
        pred = np.asarray(render_eval(params, held_out), np.float32)
        gt = np.asarray(held_out['query']['rgb'], np.float32)
        return psnr(pred, gt), pred

    p0, _ = eval_psnr(state.params)
    print(f'step 0: {p0:.1f} dB (held-out world + pose)')

    t0 = time.perf_counter()
    best = -1e9
    best_params = state.params
    for i in range(1, args.steps + 1):
        state, metrics = step(state, batch_scene(worlds, rng))
        if i % args.eval_every == 0:
            p, pred = eval_psnr(state.params)
            if p > best:
                # snapshot to HOST: the train step donates the state, so
                # keeping device references to old params dangles them
                best = p
                best_params = jax.tree.map(np.asarray, state.params)
            rate = i / (time.perf_counter() - t0)
            print(f'step {i}: loss {float(metrics["total_loss"]):.4f}  '
                  f'gnorm {float(metrics["grad_norm"]):.3e}  '
                  f'eval {p:.1f} dB  ({rate:.1f} steps/s)', flush=True)

    p, pred = eval_psnr(state.params)
    if p > best:
        best = p
        best_params = jax.tree.map(np.asarray, state.params)
    best_params = jax.tree.map(jnp.asarray, best_params)
    p, pred = eval_psnr(best_params)   # demo from the best checkpoint
    print(f'final(best): {p:.1f} dB')

    if args.save:
        from cross_attention_renderer_tpu.utils.params_io import save_params
        save_params(args.save, best_params)
        print(f'saved best params to {args.save}')

    try:
        import imageio.v2 as imageio
        gt = np.asarray(held_out['query']['rgb'], np.float32)
        img = np.concatenate([gt.reshape(H, W, 3),
                              pred.reshape(H, W, 3)], axis=1)
        img = np.clip((img + 1.0) * 127.5, 0, 255).astype(np.uint8)
        imageio.imwrite(args.out, img)
        print(f'wrote {args.out}')
    except Exception as e:                             # pragma: no cover
        print(f'demo image skipped: {e}')


if __name__ == '__main__':
    main()
