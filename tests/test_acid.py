"""ACID loader tests: ACID-shaped on-disk fixture through the full pipeline,
covering the two behavioral deltas vs RealEstate10K (interpolation-only
query sampling, unconditional frame resize). Ref: acid_dataio.py:366-374,387.
"""

import numpy as np
import pytest
from scipy.io import savemat

from cross_attention_renderer_tpu.data import acid as acid_data
from cross_attention_renderer_tpu.data.realestate import IMG_H, IMG_W


@pytest.fixture(scope='module')
def acid_dir(tmp_path_factory):
    """ACID-format scene store: per-scene data.npz keyed by microsecond-style
    timestamps + .mat pose table. Frames are 300x533 (NOT 360p — ACID's
    aerial footage varies; the loader must resize unconditionally)."""
    root = tmp_path_factory.mktemp('acid')
    img_root = root / 'frames'
    img_root.mkdir()
    rng = np.random.default_rng(7)
    poses = {}
    n_frames = 230
    for s in range(2):
        name = f'aerial{s:03d}'
        sdir = img_root / name
        sdir.mkdir()
        frames = {}
        rows = []
        for t in range(n_frames):
            # ACID timestamps are large non-uniform microsecond counts
            ts = 33_366 * t + (t % 3)
            frames[f'{ts}.png'] = rng.integers(
                0, 255, (300, 533, 3), dtype=np.uint8)
            w2c = np.eye(4)
            w2c[:3, 3] = rng.normal(0, 0.05, 3) + [0.02 * t, 0, 0]
            rows.append([ts, 0.8, 1.4, 0.5, 0.5, 0, 0,
                         *w2c[:3, :].reshape(-1)])
        np.savez(sdir / 'data.npz', **frames)
        poses[name] = np.asarray(rows)
    savemat(root / 'poses.mat', poses)
    return img_root, root / 'poses.mat'


def test_acid_item_layout(acid_dir):
    img_root, pose_root = acid_dir
    ds = acid_data.ACID(img_root, pose_root, num_ctxt_views=2,
                        query_sparsity=192, augment=True, seed=1)
    item = ds[0]
    ctx, qry = item['context'], item['query']
    # non-360p source frames were resized + square-cropped to 256^2
    assert ctx['rgb'].shape == (2, 256, 256, 3)
    assert qry['rgb'].shape == (1, 192, 3)
    assert np.abs(ctx['rgb']).max() <= 1.0
    assert np.isfinite(ctx['cam2world']).all()


def test_acid_query_interpolation_only(acid_dir):
    """ACID queries must lie strictly inside the context span with a
    16-frame margin (acid_dataio.py:366-374) — never extrapolated."""
    img_root, pose_root = acid_dir
    ds = acid_data.ACID(img_root, pose_root, num_ctxt_views=2,
                        query_sparsity=8, augment=False, seed=3)
    n_frames = 230
    for _ in range(50):
        sampled = ds._sample_ids(n_frames)
        if sampled is None:
            continue
        id_feat, id_render = sampled
        lo, hi = id_feat.min(), id_feat.max()
        assert (id_render >= lo + 16).all(), (id_feat, id_render)
        assert (id_render < hi - 16).all(), (id_feat, id_render)
        assert hi - lo > 92  # context separation rule still holds


def test_acid_vis_resizes(acid_dir):
    img_root, pose_root = acid_dir
    ds = acid_data.ACIDVis(img_root, pose_root, num_ctxt_views=2, seed=5)
    item = ds[0]
    assert item['context']['rgb'].shape == (2, 256, 256, 3)
    assert item['query']['rgb'].shape[-1] == 3


def test_realestate_query_can_extrapolate():
    """Contrast rule: RealEstate10K's window extends past the context span
    (realestate10k_dataio.py:317-327), so extrapolated queries must occur."""
    from cross_attention_renderer_tpu.data.realestate import RealEstate10k
    ds = RealEstate10k.__new__(RealEstate10k)
    ds.num_ctxt_views = 2
    ds.num_query_views = 1
    ds.rng = np.random.default_rng(0)
    outside = 0
    for _ in range(200):
        sampled = ds._sample_ids(230)
        if sampled is None:
            continue
        id_feat, id_render = sampled
        if (id_render < id_feat.min()).any() or \
                (id_render > id_feat.max()).any():
            outside += 1
    assert outside > 0
