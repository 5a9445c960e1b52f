"""Unposed two-image demo CLI.

TPU-native replacement for ``render_unposed_traj.py``: two arbitrary images
-> keypoint matching -> RANSAC essential-matrix pose -> 76-pose
interpolated trajectory -> mp4.

Matching frontend: SuperPoint+SuperGlue when converted weights are given
(the reference repo's .pth blobs are git-LFS-missing; convert upstream
MagicLeap checkpoints with ``pose.superpoint.convert_weights`` /
``pose.superglue.convert_weights``), otherwise the weights-free classical
frontend (``pose.classical``: Harris corners + NCC patches) — so the demo
runs out of the box, which the reference's cannot.
"""

from __future__ import annotations

import numpy as np

from cross_attention_renderer_tpu.cli.common import (FrameWriter,
    base_parser, build_model)


def main(argv=None):
    p = base_parser('Render a trajectory from an unposed image pair')
    p.add_argument('--im1', type=str, required=True)
    p.add_argument('--im2', type=str, required=True)
    p.add_argument('--superpoint_weights', type=str, default=None,
                   help='converted SuperPoint npz; omit (with '
                        '--superglue_weights) for the classical frontend')
    p.add_argument('--superglue_weights', type=str, default=None)
    p.add_argument('--out', type=str, default='unposed.mp4')
    p.add_argument('--ray_chunk', type=int, default=8192)
    p.add_argument('--sf', type=float, default=1.2,
                   help='translation scale (load_video_superglue.py:481)')
    p.add_argument('--n_frames', type=int, default=80,
                   help='trajectory poses (reference: 80, '
                        'load_video_superglue.py:491)')
    opt = p.parse_args(argv)

    import imageio.v2 as imageio
    import jax

    from cross_attention_renderer_tpu.pose import unposed_scene
    from cross_attention_renderer_tpu.train import (
        TrainConfig, create_train_state, restore_checkpoint)
    from cross_attention_renderer_tpu.train.evaluation import (
        make_image_renderer)

    sp_params = sg_params = None
    if opt.superpoint_weights and opt.superglue_weights:
        sp_params = dict(np.load(opt.superpoint_weights))
        sg_params = dict(np.load(opt.superglue_weights))
    elif opt.superpoint_weights or opt.superglue_weights:
        # The learned frontend is a SuperPoint -> SuperGlue pipeline; one
        # half alone cannot run, and silently dropping the provided file
        # would look like the weights were used. Fail loudly instead.
        raise SystemExit(
            'error: --superpoint_weights and --superglue_weights must be '
            'given together (the learned frontend is a pipeline); omit '
            'both for the classical Harris+NCC frontend')
    else:
        print('no SuperPoint/SuperGlue weights given -> classical '
              'Harris+NCC frontend (pose/classical.py)', flush=True)

    im0 = np.asarray(imageio.imread(opt.im1), np.float32) / 255.0
    im1 = np.asarray(imageio.imread(opt.im2), np.float32) / 255.0
    traj = unposed_scene(sp_params, sg_params, im0, im1,
                         n_poses=opt.n_frames, sf=opt.sf)

    model = build_model(opt)
    n_frames = traj['query']['cam2world'].shape[1]
    H = W = traj['context']['rgb'].shape[-3]

    def frame_scene(i):
        return {
            'context': traj['context'],
            'query': {k: traj['query'][k][:, i:i + 1]
                      for k in ('cam2world', 'intrinsics', 'uv')},
        }

    scene0 = jax.tree.map(np.asarray, frame_scene(0))
    init_scene = dict(scene0)
    init_scene['query'] = dict(scene0['query'])
    init_scene['query']['uv'] = scene0['query']['uv'][:, :, :128]
    state = create_train_state(model, init_scene, TrainConfig())
    if opt.checkpoint_path:
        state = restore_checkpoint(opt.checkpoint_path, state)
    n_chunks = max(1, (H * W) // opt.ray_chunk)
    encode, render_image = make_image_renderer(model, state.params, n_chunks)
    z = encode(scene0)

    writer = FrameWriter(opt.out, fps=10)
    for i in range(n_frames):
        scene = jax.tree.map(np.asarray, frame_scene(i))
        rgb, _ = render_image(scene, z)
        img = np.asarray((rgb.reshape(H, W, 3) + 1) * 0.5)
        writer.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
        print(f'frame {i + 1}/{n_frames}', flush=True)
    writer.close()
    print(f'wrote {writer.path}')


if __name__ == '__main__':
    main()
