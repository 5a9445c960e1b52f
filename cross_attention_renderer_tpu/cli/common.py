"""Shared CLI plumbing: one flag system for all entry points.

Replaces the reference's per-script configargparse blocks + edit-the-source
site config (experiment_scripts/config.py) with a single argparse builder;
all paths are flags, no machine constants in code.
"""

from __future__ import annotations

import argparse


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument('--experiment_name', type=str, default='exp')
    p.add_argument('--logging_root', type=str, default='logs')
    p.add_argument('--dataset', type=str, default='realestate10k',
                   choices=['realestate10k', 'acid'])
    p.add_argument('--img_root', type=str, required=False)
    p.add_argument('--pose_root', type=str, required=False)
    p.add_argument('--checkpoint_path', type=str, default=None)
    p.add_argument('--co3d_root', type=str, default=None,
                   help='use CO3D-v2 instead of npz scenes')
    p.add_argument('--co3d_category', type=str, default='all_nerformer')
    p.add_argument('--views', type=int, default=2)
    p.add_argument('--model', type=str, default='midas_vit',
                   choices=['midas_vit', 'resnet', 'unet'])
    # ablations (train_realestate10k.py:51-55)
    p.add_argument('--no_sample', action='store_true')
    p.add_argument('--no_latent_concat', action='store_true')
    p.add_argument('--no_multiview', action='store_true')
    p.add_argument('--no_high_freq', action='store_true')
    # tri-state: unset -> model auto (Pallas kernel on TPU, jnp elsewhere)
    p.add_argument('--fused_attention', action='store_true', default=None,
                   help='force the Pallas fused epipolar attention on')
    p.add_argument('--no_fused_attention', dest='fused_attention',
                   action='store_false', help='force the jnp attention path')
    # encoder size knobs (defaults = reference config; smaller for smoke runs)
    p.add_argument('--fusion_features', type=int, default=256)
    p.add_argument('--vit_width', type=int, default=768)
    p.add_argument('--vit_depth', type=int, default=12)
    p.add_argument('--vit_heads', type=int, default=12)
    p.add_argument('--resnet_layers', type=int, nargs=3, default=(3, 4, 9))
    p.add_argument('--npoints', type=int, default=0)
    p.add_argument('--dtype', type=str, default='float32',
                   choices=['float32', 'bfloat16'],
                   help='compute dtype; bfloat16 trains stably (attention '
                        'logits/softmax are always f32 — BENCH_NOTES.md '
                        '"bf16 training: root cause") and is ~2.8x faster '
                        'on TPU')
    # fast-eval levers (eval/traj only; outputs differ from the reference
    # protocol — see BENCH_NOTES.md roofline and train/evaluation.py)
    p.add_argument('--pruned', type=str, default=None, metavar='C,F',
                   help='coarse-to-fine fast-eval sampling: C coarse + F '
                        'attention-guided fine samples instead of the '
                        'uniform npoints grid')
    p.add_argument('--narrow', type=str, default=None, metavar='K1,K2,K3',
                   help='per-scene PCA narrowing of the gathered feature '
                        'pyramid to these per-level widths')
    p.add_argument('--q8', action='store_true',
                   help='int8 gather tables (per-channel scales folded '
                        'into the fuse kernel)')
    p.add_argument('--fast', action='store_true',
                   help='preset composing all three fast-eval levers at '
                        'their documented defaults (docs/FAST_EVAL.md): '
                        '--pruned 8,16 --narrow 128,128,64 --q8; '
                        'explicit flags override their part of the preset')
    return p


def parse_pruned(opt):
    """'C,F' -> (int, int) or None (shared by eval / render_traj)."""
    if not getattr(opt, 'pruned', None):
        return None
    c, f = (int(x) for x in opt.pruned.split(','))
    return (c, f)


def fast_eval_kwargs(opt) -> dict:
    """--pruned/--narrow/--q8/--fast -> make_image_renderer kwargs."""
    narrow = (tuple(int(x) for x in opt.narrow.split(','))
              if getattr(opt, 'narrow', None) else None)
    pruned = parse_pruned(opt)
    q8 = bool(getattr(opt, 'q8', False))
    # Preset priced on held-out flagship quality (BENCH_NOTES.md round-4
    # held-out table): pruned 8,16 costs 0.78 dB vs dense at 1.86x dense
    # throughput; the conservative 16,24 point costs 0.67 dB but is
    # SLOWER than dense full-image (its coarse pass outweighs the saved
    # fine samples), so 8,16 dominates it.
    if getattr(opt, 'fast', False):
        pruned = pruned or (8, 16)
        narrow = narrow or (128, 128, 64)
        q8 = True
    return dict(pruned=pruned, narrow=narrow, q8=q8)


class FrameWriter:
    """mp4 writer with a PNG-sequence fallback (no ffmpeg in some envs)."""

    def __init__(self, out_path: str, fps: int = 10):
        import imageio.v2 as imageio
        self._imageio = imageio
        self.frames_dir = None
        self.writer = None
        self.count = 0
        try:
            self.writer = imageio.get_writer(out_path, fps=fps)
            self.path = out_path
        except Exception:
            from pathlib import Path
            self.frames_dir = Path(str(out_path) + '.frames')
            self.frames_dir.mkdir(parents=True, exist_ok=True)
            self.path = str(self.frames_dir)
            print(f'no mp4 backend (ffmpeg missing); writing PNG frames '
                  f'to {self.frames_dir}', flush=True)

    def append(self, frame):
        if self.writer is not None:
            self.writer.append_data(frame)
        else:
            self._imageio.imwrite(
                self.frames_dir / f'{self.count:04d}.png', frame)
        self.count += 1

    def close(self):
        if self.writer is not None:
            self.writer.close()


def build_model(opt):
    import jax.numpy as jnp
    from cross_attention_renderer_tpu.models import CrossAttentionRenderer
    dtype = jnp.dtype(getattr(opt, 'dtype', 'float32'))
    return CrossAttentionRenderer(
        dtype=dtype,
        n_view=opt.views, model=opt.model, no_sample=opt.no_sample,
        no_latent_concat=opt.no_latent_concat, no_multiview=opt.no_multiview,
        no_high_freq=opt.no_high_freq, npoints=opt.npoints,
        fused_attention=opt.fused_attention,
        fusion_features=opt.fusion_features, vit_width=opt.vit_width,
        vit_depth=opt.vit_depth, vit_heads=opt.vit_heads,
        resnet_layers=tuple(opt.resnet_layers))
