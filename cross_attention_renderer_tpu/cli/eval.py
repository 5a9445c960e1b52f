"""Evaluation CLI: full-image PSNR / SSIM (/ LPIPS when weights present).

TPU-native replacement for ``experiment_scripts/eval_realestate10k.py`` /
``eval_acid.py``: deterministic Vis sampling (context {0, 128}), encoder
latent cached per scene, chunked jitted rendering, running-mean metrics.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import numpy as np

from cross_attention_renderer_tpu.cli.common import (
    base_parser, build_model, fast_eval_kwargs)
from cross_attention_renderer_tpu.data.realestate import RealEstate10kVis
from cross_attention_renderer_tpu.train import (
    TrainConfig, create_train_state, restore_checkpoint)
from cross_attention_renderer_tpu.train.evaluation import (
    evaluate_scene, make_image_renderer)


def main(argv=None):
    p = base_parser('Evaluate on the RealEstate10K/ACID test split')
    p.add_argument('--max_scenes', type=int, default=0)
    p.add_argument('--n_chunks', type=int, default=8)
    p.add_argument('--save_images', action='store_true')
    opt = p.parse_args(argv)

    if opt.co3d_root:
        # 3-view CO3D protocol: deterministic fewview_dev sampling, full
        # query frames (ref eval protocol via dataset/co3d.yaml).
        from cross_attention_renderer_tpu.data.co3d import CO3Dv2Dataset
        dataset = CO3Dv2Dataset(opt.co3d_root, category=opt.co3d_category,
                                subset='fewview_dev',
                                num_input_views=opt.views,
                                query_sparsity=None)
    else:
        dataset = RealEstate10kVis(opt.img_root, opt.pose_root,
                                   num_ctxt_views=opt.views)
    model = build_model(opt)

    def load_scene(i):
        item = dataset[i]
        item.pop('sequence', None)  # non-numeric metadata (CO3D)
        return jax.tree.map(lambda x: np.asarray(x)[None], item)

    first = load_scene(0)
    # init on a small ray slice — parameters don't depend on the ray count,
    # and tracing init at 65k rays wastes minutes of compile time
    init_scene = dict(first)
    init_scene['query'] = dict(first['query'])
    init_scene['query']['uv'] = first['query']['uv'][:, :, :128]
    init_scene['query']['rgb'] = first['query']['rgb'][:, :, :128]
    state = create_train_state(model, init_scene, TrainConfig())
    if opt.checkpoint_path:
        state = restore_checkpoint(opt.checkpoint_path, state)
        print(f'loaded {opt.checkpoint_path}')
    params = state.params

    lpips_fn = None
    try:
        from cross_attention_renderer_tpu.losses.lpips import load_lpips
        lpips_fn = load_lpips()
        print('LPIPS enabled')
    except Exception as e:
        print(f'LPIPS disabled ({e})')

    renderer = make_image_renderer(model, params, opt.n_chunks,
                                   **fast_eval_kwargs(opt))
    out_dir = Path(opt.logging_root) / opt.experiment_name
    out_dir.mkdir(parents=True, exist_ok=True)

    n = len(dataset) if not opt.max_scenes else min(opt.max_scenes,
                                                    len(dataset))
    sums: dict = {}
    for i in range(n):
        scene = load_scene(i)
        t0 = time.time()
        m = evaluate_scene(model, params, scene, n_chunks=opt.n_chunks,
                           lpips_fn=lpips_fn, renderer=renderer)
        elapsed = time.time() - t0
        if opt.save_images:
            import imageio.v2 as imageio
            imageio.imwrite(out_dir / f'{i:04d}_pred.png',
                            (np.clip(m['pred'], 0, 1) * 255).astype(np.uint8))
        for k in ('mse', 'psnr', 'ssim', 'lpips'):
            if k in m:
                sums.setdefault(k, []).append(float(np.asarray(m[k])))
        means = {k: np.mean(v) for k, v in sums.items()}
        line = ' '.join(f'{k}={v:.4f}' for k, v in means.items())
        print(f'[{i + 1}/{n}] elapsed={elapsed:.2f}s running means: {line}',
              flush=True)


if __name__ == '__main__':
    main()
