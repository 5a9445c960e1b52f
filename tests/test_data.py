"""Data-layer tests: synthetic on-disk RealEstate10K-format scenes
(npz frame archives + .mat pose table) through the full loading pipeline."""

import numpy as np
import pytest
from scipy.io import savemat

from cross_attention_renderer_tpu.data import realestate as re_data


@pytest.fixture(scope='module')
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp('re10k')
    img_root = root / 'frames'
    img_root.mkdir()
    rng = np.random.default_rng(0)
    poses = {}
    n_frames = 140
    for s in range(3):
        name = f'scene{s:03d}'
        sdir = img_root / name
        sdir.mkdir()
        frames = {}
        rows = []
        for t in range(n_frames):
            ts = 1000 * t
            frames[f'{ts}.png'] = rng.integers(
                0, 255, (re_data.IMG_H, re_data.IMG_W, 3), dtype=np.uint8)
            # row: [ts, fx, fy, cx, cy, 0, 0, w2c(3x4 flat)] normalized K
            w2c = np.eye(4)
            w2c[:3, 3] = rng.normal(0, 0.1, 3) + [0, 0, 0.01 * t]
            rows.append([ts, 0.9, 1.6, 0.5, 0.5, 0, 0,
                         *w2c[:3, :].reshape(-1)])
        np.savez(sdir / 'data.npz', **frames)
        poses[name] = np.asarray(rows)
    # one defective scene: empty dir (no npz)
    (img_root / 'scene_bad').mkdir()
    savemat(root / 'poses.mat', poses)
    return img_root, root / 'poses.mat'


def test_train_dataset_layout(dataset_dir):
    img_root, pose_root = dataset_dir
    ds = re_data.RealEstate10k(img_root, pose_root, num_ctxt_views=2,
                               query_sparsity=192, augment=True, seed=1)
    item = ds[0]
    ctx, qry = item['context'], item['query']
    assert ctx['rgb'].shape == (2, 256, 256, 3)
    assert ctx['cam2world'].shape == (2, 4, 4)
    assert qry['uv'].shape == (1, 192, 2)
    assert qry['rgb'].shape == (1, 192, 3)
    assert np.abs(ctx['rgb']).max() <= 1.0
    # intrinsics in pixel units for the 256-crop
    assert 100 < ctx['intrinsics'][0, 0, 0] < 600
    assert abs(ctx['intrinsics'][0, 0, 2] - 128) < 40


def test_defective_scene_resampled(dataset_dir):
    img_root, pose_root = dataset_dir
    ds = re_data.RealEstate10k(img_root, pose_root, num_ctxt_views=2,
                               query_sparsity=64, augment=False, seed=2)
    # 'scene_bad' sorts last; it must be silently replaced by a valid scene
    item = ds[len(ds) - 1]
    assert item['context']['rgb'].shape[0] == 2


def test_lpips_patch_sampling(dataset_dir):
    img_root, pose_root = dataset_dir
    ds = re_data.RealEstate10k(img_root, pose_root, num_ctxt_views=2,
                               query_sparsity=192, lpips=True, augment=False,
                               seed=3)
    saw = set()
    for i in range(8):
        item = ds[i % 3]
        n = item['query']['uv'].shape[1]
        mask = float(item['query']['mask'])
        saw.add((n, mask))
        if mask == 1.0:
            # contiguous 32x32 patch
            uv = item['query']['uv'][0].reshape(32, 32, 2)
            assert (np.diff(uv[0, :, 0]) == 1).all()
            assert (np.diff(uv[:, 0, 1]) == 1).all()
        assert n == 1024
    assert len(saw) >= 2  # both branches of the coin flip occurred


def test_vis_dataset_deterministic_contexts(dataset_dir):
    img_root, pose_root = dataset_dir
    ds = re_data.RealEstate10kVis(img_root, pose_root, num_ctxt_views=2,
                                  seed=4)
    item = ds[0]
    # full-image query
    assert item['query']['uv'].shape == (1, 256 * 256, 2)
    # context = frames 0 and 128 -> distinct translations
    assert not np.allclose(item['context']['cam2world'][0],
                           item['context']['cam2world'][1])


def test_trajectory_scene(dataset_dir):
    img_root, pose_root = dataset_dir
    # trajectory loader reads per-scene txt pose files
    scene = sorted(img_root.glob('scene*/'))[0]
    pose_dir = img_root.parent / 'txt_poses'
    pose_dir.mkdir(exist_ok=True)
    from scipy.io import loadmat
    table = loadmat(str(pose_root))[scene.name]
    with open(pose_dir / f'{scene.name}.txt', 'w') as f:
        f.write('header\n')
        for row in table:
            f.write(' '.join(str(x) for x in row) + '\n')
    traj = re_data.trajectory_scene(scene, pose_dir, views=2)
    assert traj['query']['cam2world'].shape[1] == 127
    assert traj['context']['rgb'].shape[1] == 2

    # poses.mat scene-table path (the scraped-corpus layout): identical
    # trajectory, letterboxed 256x455 frames center square-cropped
    traj2 = re_data.trajectory_scene(scene, pose_root, views=2)
    np.testing.assert_allclose(traj2['query']['cam2world'],
                               traj['query']['cam2world'])
    np.testing.assert_allclose(traj2['query']['intrinsics'],
                               traj['query']['intrinsics'])
    assert traj2['context']['rgb'].shape[-3:-1] == (256, 256)


def test_batch_iterator(dataset_dir):
    img_root, pose_root = dataset_dir
    ds = re_data.RealEstate10k(img_root, pose_root, num_ctxt_views=2,
                               query_sparsity=32, augment=False, seed=5)
    it = re_data.batch_iterator(ds, batch_size=2, to_device=False)
    batch = next(it)
    assert batch['context']['rgb'].shape == (2, 2, 256, 256, 3)
    assert batch['query']['uv'].shape == (2, 1, 32, 2)
    assert batch['query']['mask'].shape == (2,)


def test_batch_iterator_threaded(dataset_dir):
    """Threaded prefetch (num_workers>0) yields the same batch structure,
    keeps producing, and shuts down cleanly."""
    img_root, pose_root = dataset_dir
    ds = re_data.RealEstate10k(img_root, pose_root, num_ctxt_views=2,
                               query_sparsity=32, augment=True, seed=5)
    it = re_data.batch_iterator(ds, batch_size=2, to_device=False,
                                num_workers=4, prefetch=2)
    for _ in range(4):
        batch = next(it)
        assert batch['context']['rgb'].shape == (2, 2, 256, 256, 3)
        assert np.isfinite(batch['context']['rgb']).all()
        assert batch['query']['uv'].shape == (2, 1, 32, 2)
    it.close()


def test_native_path_feeds_augmented_training(dataset_dir):
    """With the native loader available, the augment=True path consumes the
    C++-decoded frames (rgb_pre) and still produces valid augmented scenes."""
    img_root, pose_root = dataset_dir
    from cross_attention_renderer_tpu.data import native_loader
    if not native_loader.available():
        pytest.skip('native loader unavailable (no compiler)')
    ds = re_data.RealEstate10k(img_root, pose_root, num_ctxt_views=2,
                               query_sparsity=64, augment=True, seed=3)
    assert ds.store.use_native
    item = ds[0]
    rgb = item['context']['rgb']
    assert rgb.shape == (2, 256, 256, 3)
    assert np.abs(rgb).max() <= 1.0
    assert np.isfinite(rgb).all()


def test_augment_on_prenormalized_floats_matches_uint8():
    """augment() on [-1,1] float frames (native path) equals augmenting the
    uint8 frame then normalizing, for the same RNG draw."""
    rng_img = np.random.default_rng(0)
    u8 = rng_img.integers(0, 255, (256, 256, 3), dtype=np.uint8)
    intr = np.diag([250.0, 250.0, 1.0, 1.0])
    intr[0, 2] = intr[1, 2] = 128.0
    c2w = np.eye(4)
    f = u8.astype(np.float32) / 127.5 - 1.0
    a_f, intr_f, c2w_f = re_data.augment(np.random.default_rng(9), f,
                                         intr, c2w)
    a_u, intr_u, c2w_u = re_data.augment(np.random.default_rng(9), u8,
                                         intr, c2w)
    a_u = a_u.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(a_f, a_u, atol=2.0 / 127.5)
    np.testing.assert_allclose(intr_f, intr_u)
    np.testing.assert_allclose(c2w_f, c2w_u)


@pytest.mark.slow
def test_iterator_sustains_training_rate(dataset_dir):
    """The prefetched on-disk pipeline must outpace the training step.

    The flagship bf16 train step consumes 12 scenes / ~300 ms ≈ 40
    scenes/s; the measured pipeline rate on a 2.5 GB corpus is ~140
    scenes/s on one core (BENCH_NOTES round 3). This regression gate uses
    a conservative floor that still catches an order-of-magnitude
    pipeline regression on the tiny test corpus."""
    import time
    img_root, pose_root = dataset_dir
    ds = re_data.RealEstate10k(img_root, pose_root, num_ctxt_views=2,
                               query_sparsity=192, augment=True, seed=0)
    it = re_data.batch_iterator(ds, 2, seed=0, num_workers=2)
    next(it)                                  # warm the prefetch pipeline
    n_batches = 40
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    rate = n_batches * 2 / (time.perf_counter() - t0)
    assert rate > 25.0, f'iterator only {rate:.1f} scenes/s'


def test_odd_resolution_scene_resampled(tmp_path):
    """A frame size that is neither 360p nor (IMG_H, IMG_W) must route into
    the defect-resample path — NOT produce a scene whose full-image rgb
    disagrees with the uv grid (the silent-corruption case this guards)."""
    img_root = tmp_path / 'frames'
    img_root.mkdir()
    rng = np.random.default_rng(3)
    poses = {}
    for name, hw in (('scene_good', (re_data.IMG_H, re_data.IMG_W)),
                     ('scene_odd', (144, 256))):
        sdir = img_root / name
        sdir.mkdir()
        frames, rows = {}, []
        for t in range(140):
            ts = 1000 * t
            frames[f'{ts}.png'] = rng.integers(0, 255, (*hw, 3),
                                               dtype=np.uint8)
            w2c = np.eye(4)
            w2c[:3, 3] = rng.normal(0, 0.1, 3) + [0, 0, 0.02 * t]
            rows.append([ts, 0.9, 1.6, 0.5, 0.5, 0, 0,
                         *w2c[:3, :].reshape(-1)])
        np.savez(sdir / 'data.npz', **frames)
        poses[name] = np.asarray(rows)
    savemat(tmp_path / 'poses.mat', poses)
    ds = re_data.RealEstate10k(img_root, tmp_path / 'poses.mat',
                               num_ctxt_views=2, query_sparsity=None,
                               augment=False, seed=4)
    odd_idx = [i for i, s in enumerate(ds.store.scenes)
               if s.name == 'scene_odd'][0]
    for _ in range(4):
        item = ds[odd_idx]
        # resampled onto the good scene: rgb row count matches the uv grid
        assert item['query']['rgb'].shape[1] == item['query']['uv'].shape[1]
        assert item['query']['rgb'].shape[-2:] == (
            re_data.CROP * re_data.CROP, 3)[-2:] or \
            item['query']['rgb'].shape[1] == re_data.CROP ** 2


def test_pose_timestamp_mismatch_resampled(tmp_path):
    """Pose tables that cover only part of the extracted frames (real
    scrapes drift) must yield valid items via resampling, never KeyError/
    IndexError out of __getitem__."""
    img_root = tmp_path / 'frames'
    img_root.mkdir()
    rng = np.random.default_rng(5)
    poses = {}
    for name, stride in (('scene_full', 1), ('scene_gappy', 2)):
        sdir = img_root / name
        sdir.mkdir()
        frames, rows = {}, []
        for t in range(140):
            ts = 1000 * t
            frames[f'{ts}.png'] = rng.integers(
                0, 255, (re_data.IMG_H, re_data.IMG_W, 3), dtype=np.uint8)
            w2c = np.eye(4)
            w2c[:3, 3] = rng.normal(0, 0.1, 3) + [0, 0, 0.02 * t]
            rows.append([ts, 0.9, 1.6, 0.5, 0.5, 0, 0,
                         *w2c[:3, :].reshape(-1)])
        np.savez(sdir / 'data.npz', **frames)
        poses[name] = np.asarray(rows)[::stride]
    savemat(tmp_path / 'poses.mat', poses)
    ds = re_data.RealEstate10k(img_root, tmp_path / 'poses.mat',
                               num_ctxt_views=2, query_sparsity=32,
                               augment=False, seed=6)
    gappy = [i for i, s in enumerate(ds.store.scenes)
             if s.name == 'scene_gappy'][0]
    for k in range(6):
        item = ds.getitem_seeded(gappy, k)
        assert item['query']['rgb'].shape == (1, 32, 3)
