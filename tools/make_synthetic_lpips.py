"""Produce SYNTHETIC LPIPS weights through the real conversion path.

The genuine blobs (torchvision VGG16 + the lpips package's lin layers,
reference ``loss_functions.py:102-118``) cannot be fetched in this
environment (zero egress, packages absent) — and the reference repo's own
copies are LFS-missing upstream (DEVIATIONS.md). This tool builds a
torch-layout state dict with He-scaled random filters and positive lin
weights, runs it through ``losses.lpips.convert_weights`` (the exact code
a user with the real blobs runs), and writes the npz that
``load_lpips``/$LPIPS_WEIGHTS consumes.

A synthetic-VGG LPIPS is still a smooth multi-scale perceptual distance
(random-filter VGG features are a known non-trivial perceptual metric —
random filters + normalization retain edge/texture sensitivity), so a
stage-2 fine-tune against it exercises every line of the real curriculum:
patch sampling, the lpips_loss term, its gradients, the loss mix. Only
the metric's human-alignment differs from the reference. Marked synthetic
in the filename by default to prevent confusion with converted weights.

Usage:
  python tools/make_synthetic_lpips.py [--out /tmp/lpips_synthetic.npz]
  LPIPS_WEIGHTS=/tmp/lpips_synthetic.npz python -m \
      cross_attention_renderer_tpu.cli.train --lpips ...
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# torchvision vgg16().features conv layer indices and (out, in) channels
VGG16_CONVS = [
    (0, 64, 3), (2, 64, 64),
    (5, 128, 64), (7, 128, 128),
    (10, 256, 128), (12, 256, 256), (14, 256, 256),
    (17, 512, 256), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
]
LIN_CHANNELS = [64, 128, 256, 512, 512]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='/tmp/lpips_synthetic.npz')
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    vgg_state = {}
    for layer, out_c, in_c in VGG16_CONVS:
        # He init (same layout torch uses: (out, in, kh, kw))
        std = np.sqrt(2.0 / (in_c * 9))
        vgg_state[f'{layer}.weight'] = rng.normal(
            0, std, (out_c, in_c, 3, 3)).astype(np.float32)
        vgg_state[f'{layer}.bias'] = np.zeros(out_c, np.float32)
    lpips_state = {
        f'lin{i}.model.1.weight':
            rng.uniform(0.01, 0.1, (1, c, 1, 1)).astype(np.float32)
        for i, c in enumerate(LIN_CHANNELS)
    }

    from cross_attention_renderer_tpu.losses.lpips import convert_weights
    path = convert_weights(vgg_state, lpips_state, args.out)
    print(f'synthetic LPIPS weights at {path} '
          f'(export LPIPS_WEIGHTS={path})')


if __name__ == '__main__':
    main()
