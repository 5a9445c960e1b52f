"""Training CLI.

TPU-native replacement for ``experiment_scripts/train_realestate10k.py`` /
``train_acid.py``: one process, mesh data-parallelism instead of mp.spawn +
NCCL. Usage:

  python -m cross_attention_renderer_tpu.cli.train \
      --experiment_name stage1 --img_root ... --pose_root ... \
      --batch_size 12 --max_steps 200000
  # stage 2 fine-tune (README.md:56-58):
  ... --checkpoint_path logs/stage1/checkpoints --lpips --depth --batch_size 4
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from cross_attention_renderer_tpu.cli.common import base_parser, build_model
from cross_attention_renderer_tpu.data.realestate import (
    RealEstate10k, batch_iterator)
from cross_attention_renderer_tpu.parallel import make_mesh
from cross_attention_renderer_tpu.train import (
    TrainConfig, create_train_state, fit, restore_checkpoint)


def main(argv=None):
    p = base_parser('Train the cross-attention renderer on TPU')
    p.add_argument('--batch_size', type=int, default=12)
    p.add_argument('--num_workers', type=int, default=8,
                   help='prefetch worker threads (reference: 8 torch '
                        'DataLoader workers, train_realestate10k.py:81)')
    p.add_argument('--lr', type=float, default=5e-5)
    p.add_argument('--max_steps', type=int, default=200000)
    p.add_argument('--query_sparsity', type=int, default=192)
    p.add_argument('--lpips', action='store_true')
    p.add_argument('--depth', action='store_true')
    p.add_argument('--l2_coeff', type=float, default=1e-3)
    p.add_argument('--steps_til_summary', type=int, default=1000)
    p.add_argument('--iters_til_ckpt', type=int, default=10000)
    p.add_argument('--data_parallel', type=int, default=0,
                   help='DP ways (0 = all devices)')
    p.add_argument('--tensor_parallel', type=int, default=1)
    # multi-host: one process per host joins via jax.distributed
    # (replaces the reference's NCCL TCP rendezvous,
    # train_realestate10k.py:71). On real TPU pods all three can be
    # omitted (the TPU metadata provides them).
    p.add_argument('--coordinator_address', type=str, default=None,
                   help='host:port of process 0 (multi-host runs)')
    p.add_argument('--num_processes', type=int, default=None)
    p.add_argument('--process_id', type=int, default=None)
    p.add_argument('--val_img_root', type=str, default=None)
    p.add_argument('--val_pose_root', type=str, default=None)
    opt = p.parse_args(argv)

    from cross_attention_renderer_tpu.parallel.distributed import (
        initialize, is_primary, make_global_mesh, process_batch_slice)
    initialize(opt.coordinator_address, opt.num_processes, opt.process_id)

    log_dir = Path(opt.logging_root) / opt.experiment_name
    ckpt_dir = log_dir / 'checkpoints'
    ckpt_dir.mkdir(parents=True, exist_ok=True)

    if opt.co3d_root:
        from cross_attention_renderer_tpu.data.co3d import CO3Dv2Dataset
        dataset = CO3Dv2Dataset(opt.co3d_root, category=opt.co3d_category,
                                subset='fewview_train',
                                num_input_views=opt.views,
                                query_sparsity=opt.query_sparsity)
    else:
        dataset = RealEstate10k(
            opt.img_root, opt.pose_root, num_ctxt_views=opt.views,
            query_sparsity=opt.query_sparsity, lpips=opt.lpips, augment=True)
    data = batch_iterator(dataset, opt.batch_size,
                          num_workers=opt.num_workers,
                          shard=(jax.process_index(), jax.process_count()))

    model = build_model(opt)
    cfg = TrainConfig(lr=opt.lr, depth=opt.depth, lpips=opt.lpips,
                      l2_weight=opt.l2_coeff,
                      steps_til_summary=opt.steps_til_summary,
                      iters_til_checkpoint=opt.iters_til_ckpt)

    lpips_fn = None
    if opt.lpips:
        # Stage-2 fine-tune (reference README.md:56-58): the LPIPS term is
        # the point of the stage, so missing weights are a hard error, not
        # a silent fallback (load_lpips raises with conversion directions).
        from cross_attention_renderer_tpu.losses.lpips import load_lpips
        lpips_fn = load_lpips()

    mesh = None
    if jax.device_count() > 1 or opt.tensor_parallel > 1:
        mesh = make_global_mesh(data=opt.data_parallel,
                                model=opt.tensor_parallel)
        if is_primary():
            print(f'mesh: {dict(mesh.shape)} over '
                  f'{jax.process_count()} process(es)')

    state = None
    if opt.checkpoint_path:
        first = next(data)
        state = create_train_state(model, first, cfg)
        state = restore_checkpoint(opt.checkpoint_path, state)
        print(f'warm-started from {opt.checkpoint_path}')

    try:
        from tensorboardX import SummaryWriter
        # reference rank-0-only logging (training.py:60,82,105)
        writer = (SummaryWriter(str(log_dir / 'summaries'), flush_secs=10)
                  if is_primary() else None)
    except Exception:
        writer = None

    def log_fn(step, metrics):
        if step % 50 == 0 and is_primary():
            vals = {k: float(v) for k, v in metrics.items()}
            line = ' '.join(f'{k}={v:.4f}' for k, v in vals.items())
            print(f'step {step}: {line}', flush=True)
            if writer is not None:
                for k, v in vals.items():
                    writer.add_scalar(k, v, step)

    val_fn = None
    if opt.val_img_root and writer is not None:
        from cross_attention_renderer_tpu.data.realestate import (
            RealEstate10kVis)
        from cross_attention_renderer_tpu.train.summaries import (
            write_summaries)
        val_ds = RealEstate10kVis(opt.val_img_root,
                                  opt.val_pose_root or opt.pose_root,
                                  num_ctxt_views=opt.views)

        from cross_attention_renderer_tpu.train.evaluation import (
            make_summary_renderer)
        encode_jit = jax.jit(lambda p, s: model.apply(p, s, method='encode'))
        summary_render = make_summary_renderer(model, n_chunks=4)

        def val_fn(state, step):
            import numpy as _np
            # Full-frame val render (in-jit scan over ray blocks) — a whole
            # image, not a ray strip, is the training-time visual check. A
            # strided low-res grid keeps the render's gather temps small
            # enough to coexist with the f32 train state + Adam moments in
            # HBM (a full 256² flagship render OOMed a v5e mid-soak), and a
            # failed diagnostic must never kill a multi-day run.
            try:
                # Scene load + uv slicing live INSIDE the try: a defective
                # val scene or a query uv that is not one full H*W grid must
                # log-and-continue like any other failed diagnostic.
                scene = jax.tree.map(lambda x: _np.asarray(x)[None],
                                     val_ds[0])
                H, W = scene['context']['rgb'].shape[2:4]
                side, stride = 128, max(1, H // 128)
                uv = scene['query']['uv'].reshape(1, 1, H, W, 2)
                uv = _np.ascontiguousarray(
                    uv[:, :, ::stride, ::stride][:, :, :side, :side]
                ).reshape(1, 1, -1, 2)
                z = encode_jit(state.params, scene)
                out = summary_render(state.params, scene, z, uv)
                s = dict(scene)
                s['query'] = dict(scene['query'])
                s['query']['uv'] = uv
                # Held-out PSNR scalar: the strided full-frame render vs the
                # matching gt pixels — the PSNR-vs-steps curve of the run.
                gt = scene['query']['rgb'].reshape(1, 1, H, W, 3)
                gt = _np.ascontiguousarray(
                    gt[:, :, ::stride, ::stride][:, :, :side, :side]
                ).reshape(-1, 3)
                pred = _np.asarray(out['rgb'], dtype=_np.float32
                                   ).reshape(-1, 3)
                mse = float(_np.mean((pred - gt.astype(_np.float32)) ** 2))
                psnr = 10.0 * _np.log10(4.0 / max(mse, 1e-12))  # [-1,1] range
                writer.add_scalar('val_psnr', psnr, step)
                print(f'step {step}: val_psnr={psnr:.2f}', flush=True)
                write_summaries(writer, step, s,
                                jax.tree.map(_np.asarray, out), prefix='val_')
            except Exception as e:  # diagnostics are best-effort
                print(f'WARNING: val summary failed at step {step}: {e!r}',
                      flush=True)

    fit(model, cfg, data, opt.max_steps, ckpt_dir=str(ckpt_dir), mesh=mesh,
        state=state, log_fn=log_fn, val_fn=val_fn, lpips_fn=lpips_fn)


if __name__ == '__main__':
    main()
