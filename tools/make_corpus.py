"""Generate a multi-GB on-disk RealEstate10K-format corpus for throughput
runs (reference layout: per-scene dir with one npz of raw uint8 frames
keyed '<timestamp>.png', plus one .mat pose table; realestate10k_dataio.py).

Includes the defect classes real scrapes contain (the reason the
reference's loader resamples, realestate10k_dataio.py:259-278): a scene
with no npz, a truncated npz, a scene absent from the pose table, a
<=10-frame scene, plus 360p frames mixed in (the pre-resize path).

Usage: python tools/make_corpus.py --root /tmp/re10k_corpus [--scenes 50]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
from scipy.io import savemat

H, W = 256, 455          # reference video frames (256p letterboxed)
N_FRAMES = 140


def pose_rows(rng, n):
    rows = []
    base = np.eye(4)
    for t in range(n):
        ts = 1000 * t
        w2c = base.copy()
        w2c[:3, 3] += rng.normal(0, 0.02, 3) + [0, 0, 0.01 * t]
        rows.append([ts, 0.9, 1.6, 0.5, 0.5, 0, 0,
                     *w2c[:3, :].reshape(-1)])
    return np.asarray(rows)


def textured(rng, h, w):
    """Cheap structured frames (pure noise defeats any decode caching but
    compresses to nothing visually; gradients + noise is closer to video)."""
    yy, xx = np.mgrid[0:h, 0:w]
    f1, f2 = rng.uniform(0.02, 0.2, 2)
    base = (np.sin(xx * f1) * np.cos(yy * f2) * 80 + 128)
    img = base[..., None] + rng.normal(0, 30, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', required=True)
    ap.add_argument('--scenes', type=int, default=50)
    ap.add_argument('--frames', type=int, default=N_FRAMES)
    args = ap.parse_args()

    root = Path(args.root)
    img_root = root / 'frames'
    img_root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    poses = {}
    total = 0
    for s in range(args.scenes):
        name = f'scene{s:04d}'
        sdir = img_root / name
        sdir.mkdir(exist_ok=True)
        frames = {}
        for t in range(args.frames):
            hw = (360, 640) if (s % 7 == 0 and t % 5 == 0) else (H, W)
            frames[f'{1000 * t}.png'] = textured(rng, *hw)
        np.savez(sdir / 'data.npz', **frames)
        total += sum(a.nbytes for a in frames.values())
        poses[name] = pose_rows(rng, args.frames)

    # defect classes
    (img_root / 'scene_no_npz').mkdir(exist_ok=True)
    poses['scene_no_npz'] = pose_rows(rng, 20)

    sdir = img_root / 'scene_truncated'
    sdir.mkdir(exist_ok=True)
    good = {f'{1000 * t}.png': textured(rng, H, W) for t in range(20)}
    np.savez(sdir / 'data.npz', **good)
    raw = (sdir / 'data.npz').read_bytes()
    (sdir / 'data.npz').write_bytes(raw[:len(raw) // 3])
    poses['scene_truncated'] = pose_rows(rng, 20)

    sdir = img_root / 'scene_unposed'     # npz fine, absent from .mat
    sdir.mkdir(exist_ok=True)
    np.savez(sdir / 'data.npz',
             **{f'{1000 * t}.png': textured(rng, H, W) for t in range(20)})

    sdir = img_root / 'scene_short'       # <= 10 frames -> rejected
    sdir.mkdir(exist_ok=True)
    np.savez(sdir / 'data.npz',
             **{f'{1000 * t}.png': textured(rng, H, W) for t in range(8)})
    poses['scene_short'] = pose_rows(rng, 8)

    # pose table covers only every other frame timestamp (ffmpeg extraction
    # and the pose scrape drift apart in real data); picks that land on an
    # uncovered frame raise in _pose_at and get resampled
    sdir = img_root / 'scene_ts_mismatch'
    sdir.mkdir(exist_ok=True)
    np.savez(sdir / 'data.npz',
             **{f'{1000 * t}.png': textured(rng, H, W) for t in range(40)})
    poses['scene_ts_mismatch'] = pose_rows(rng, 40)[::2]

    # odd-resolution scrape: neither 360p nor the expected 256x455 —
    # must be rejected (frame-size check), not silently mis-shaped
    sdir = img_root / 'scene_odd_res'
    sdir.mkdir(exist_ok=True)
    np.savez(sdir / 'data.npz',
             **{f'{1000 * t}.png': textured(rng, 144, 256)
                for t in range(20)})
    poses['scene_odd_res'] = pose_rows(rng, 20)

    savemat(root / 'poses.mat', poses)
    print(f'{args.scenes} scenes + 6 defects, {total / 1e9:.2f} GB frames '
          f'at {root}')


if __name__ == '__main__':
    main()
