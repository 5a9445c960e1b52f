"""Trajectory video rendering CLI.

TPU-native replacement for ``render_realestate10k_traj.py`` /
``render_acid_traj.py``: loads the up-to-128-frame GT camera trajectory,
computes the encoder latent once, renders each pose in jitted ray chunks,
writes an mp4 plus per-frame PSNR/SSIM.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import numpy as np

from cross_attention_renderer_tpu.cli.common import (FrameWriter,
    base_parser, build_model, fast_eval_kwargs)
from cross_attention_renderer_tpu.data.realestate import trajectory_scene
from cross_attention_renderer_tpu.train import (
    TrainConfig, create_train_state, restore_checkpoint)
from cross_attention_renderer_tpu.train.evaluation import (
    make_image_renderer)
from cross_attention_renderer_tpu.utils.metrics import eval_image_metrics


def main(argv=None):
    p = base_parser('Render a camera trajectory video')
    p.add_argument('--scene_path', type=str, required=True)
    p.add_argument('--pose_dir', type=str, required=True)
    p.add_argument('--ray_chunk', type=int, default=8192)
    p.add_argument('--out', type=str, default='traj.mp4')
    opt = p.parse_args(argv)

    traj = trajectory_scene(opt.scene_path, opt.pose_dir, views=opt.views)
    model = build_model(opt)

    n_frames = traj['query']['cam2world'].shape[1]
    H = W = traj['context']['rgb'].shape[-3]

    def frame_scene(i):
        return {
            'context': traj['context'],
            'query': {
                'cam2world': traj['query']['cam2world'][:, i:i + 1],
                'intrinsics': traj['query']['intrinsics'][:, i:i + 1],
                'uv': traj['query']['uv'][:, i:i + 1],
                'rgb': traj['query']['rgb'][:, i:i + 1].reshape(1, 1, -1, 3),
            },
        }

    scene0 = jax.tree.map(np.asarray, frame_scene(0))
    init_scene = dict(scene0)
    init_scene['query'] = dict(scene0['query'])
    init_scene['query']['uv'] = scene0['query']['uv'][:, :, :128]
    init_scene['query']['rgb'] = scene0['query']['rgb'][:, :, :128]
    state = create_train_state(model, init_scene, TrainConfig())
    if opt.checkpoint_path:
        state = restore_checkpoint(opt.checkpoint_path, state)
    params = state.params

    n_chunks = max(1, (H * W) // opt.ray_chunk)
    encode, render_image = make_image_renderer(model, params, n_chunks,
                                               **fast_eval_kwargs(opt))
    z = encode(scene0)

    writer = FrameWriter(opt.out, fps=10)
    psnrs, ssims = [], []
    for i in range(n_frames):
        scene = jax.tree.map(np.asarray, frame_scene(i))
        t0 = time.time()
        rgb, valid = render_image(scene, z)
        pred01 = np.asarray((rgb.reshape(H, W, 3) + 1) * 0.5)
        target01 = np.asarray(
            (scene['query']['rgb'].reshape(H, W, 3) + 1) * 0.5)
        mask = np.asarray(valid.reshape(H, W, 1))
        m = eval_image_metrics(pred01, target01, mask)
        psnrs.append(float(m['psnr']))
        ssims.append(float(m['ssim']))
        writer.append(
            (np.clip(np.asarray(m['pred']), 0, 1) * 255).astype(np.uint8))
        print(f'frame {i + 1}/{n_frames} {time.time() - t0:.2f}s '
              f'psnr={psnrs[-1]:.2f} ssim={ssims[-1]:.3f}', flush=True)
    writer.close()
    print(f'wrote {writer.path}; mean psnr={np.mean(psnrs):.2f} '
          f'ssim={np.mean(ssims):.3f}')


if __name__ == '__main__':
    main()
