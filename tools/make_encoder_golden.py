"""Composed-encoder golden oracle: run the REFERENCE DPT-hybrid encoder.

Unlike tools/make_renderer_golden.py (which stubs the encoder and injects a
synthetic ``z``), this tool installs WORKING torch implementations of the
timm pieces (tools/timm_shim.py) so that the reference's actual encoder
code executes end to end with random weights:

  * ``vit_models.py:10-204`` — VisionTransformerMultiView construction
  * ``midas/vit.py:124-202`` — ``forward_flex`` (pos-embed resize, pose
    embedding, joint V*257-token attention)
  * ``midas/vit.py:56-104,393-541`` — hook taps + reassembly
  * ``midas/dpt_depth.py:67-94`` — DPT fusion cascade -> [path_2, path_1]
  * ``models.py:83-188`` — stem swap, conv_map branch, ``get_z``

Captured per stage: R50 stage activations (hooks "1"/"2" + stage2), joint
ViT tap activations (hooks "3"/"4"), reassembled layer3/layer4, the four
fusion paths, z_conv and the final z list — plus the full state dict, so
tests/test_encoder_parity.py can convert and assert the Flax
DPTHybridEncoder stage by stage.

Usage (CPU): python tools/make_encoder_golden.py [--size 256] [--out f.npz]
Default run is in-memory (the fixture is ~100 MB and the oracle can run
live in tests, so nothing needs committing).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import torch

REFERENCE = '/root/reference'


def build_reference_renderer(n_view: int = 2, seed: int = 20260817):
    """Reference CrossAttentionRenderer with the REAL midas_vit encoder."""
    sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent))
    import timm_shim
    timm_shim.install()
    torch.Tensor.cuda = lambda self, *a, **k: self   # geometry.py:320 etc.
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import models as ref_models

    torch.manual_seed(seed)
    model = ref_models.CrossAttentionRenderer(
        n_view=n_view, npoints=16, model='midas_vit')
    model.eval()
    return model


def run_reference_encoder(model, scene: dict) -> dict:
    """Run get_z, capturing every composed stage. Returns numpy arrays."""
    stages = {}

    def cap(name):
        def hook(mod, inp, out):
            stages.setdefault(name, []).append(
                out.detach().numpy().astype(np.float32))
        return hook

    enc = model.encoder
    backbone = enc.pretrained.model.patch_embed.backbone
    hooks = [backbone.stages[2].register_forward_hook(cap('stage2'))]
    for i in (1, 2, 3, 4):
        hooks.append(getattr(model.encoder.scratch, f'layer{i}_rn')
                     .register_forward_hook(cap(f'layer{i}_rn')))
    for i in (1, 2, 3, 4):
        hooks.append(getattr(model.encoder.scratch, f'refinenet{i}')
                     .register_forward_hook(cap(f'path{i}')))

    tin = {
        'context': {k: torch.from_numpy(np.asarray(v).copy())
                    for k, v in scene['context'].items()},
        'query': {k: torch.from_numpy(np.asarray(v).copy())
                  for k, v in scene['query'].items()},
    }
    with torch.no_grad():
        z = model.get_z(tin)
    for h in hooks:
        h.remove()

    out = {f'z_{i}': a.detach().numpy().astype(np.float32)
           for i, a in enumerate(z)}
    # forward_vit's raw hook taps (joint sequences for 3/4)
    for k, v in enc.pretrained.activations.items():
        out[f'tap_{k}'] = v.detach().numpy().astype(np.float32)
    for name, vals in stages.items():
        out[name] = vals[0]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--size', type=int, default=256)
    ap.add_argument('--views', type=int, default=2)
    ap.add_argument('--out', default=None)
    args = ap.parse_args()

    from make_renderer_golden import make_scene
    model = build_reference_renderer(args.views)
    scene = make_scene(7, args.views, args.size, args.size, 8)
    out = run_reference_encoder(model, scene)
    for k, v in sorted(out.items()):
        print(f'{k}: {v.shape}')
    if args.out:
        sd = {f'sd_{k}': v.numpy() for k, v in model.state_dict().items()}
        np.savez_compressed(args.out, **out, **sd)
        print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
