"""CO3D loader tests against a synthetic on-disk CO3D-v2-format category."""

import gzip
import json

import numpy as np
import pytest

from cross_attention_renderer_tpu.data import co3d


@pytest.fixture(scope='module')
def co3d_root(tmp_path_factory):
    imageio = pytest.importorskip('imageio')
    root = tmp_path_factory.mktemp('co3d')
    cat = root / 'hydrant'
    (cat / 'set_lists').mkdir(parents=True)
    rng = np.random.default_rng(0)
    annots, set_list = [], {'train': [], 'val': [], 'test': []}
    H, W = 120, 160
    for seq in ['seq_a', 'seq_b']:
        for f in range(14):
            ipath = f'hydrant/{seq}/images/frame{f:03d}.jpg'
            mpath = f'hydrant/{seq}/masks/frame{f:03d}.png'
            (root / ipath).parent.mkdir(parents=True, exist_ok=True)
            (root / mpath).parent.mkdir(parents=True, exist_ok=True)
            img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            imageio.imwrite(root / ipath, img)
            mask = np.zeros((H, W), np.uint8)
            mask[30:90, 50:120] = 255
            imageio.imwrite(root / mpath, mask)
            annots.append({
                'sequence_name': seq, 'frame_number': f,
                'frame_timestamp': float(f),
                'image': {'path': ipath, 'size': [H, W]},
                'mask': {'path': mpath, 'mass': 1.0},
                'viewpoint': {
                    'R': np.eye(3).tolist(),
                    'T': [0.0, 0.0, 2.0 + 0.1 * f],
                    'focal_length': [2.0, 2.0],
                    'principal_point': [0.0, 0.0],
                    'intrinsics_format': 'ndc_norm_image_bounds',
                },
            })
            set_list['train'].append([seq, f, ipath])
    with gzip.open(cat / 'frame_annotations.jgz', 'wt') as f:
        json.dump(annots, f)
    (cat / 'set_lists' / 'set_lists_fewview_train.json').write_text(
        json.dumps(set_list))
    return root


def test_co3d_scene_layout(co3d_root):
    ds = co3d.CO3Dv2Dataset(co3d_root, category='hydrant',
                            subset='fewview_train', num_input_views=3,
                            query_sparsity=64)
    assert len(ds) == 2
    item = ds[0]
    assert item['context']['rgb'].shape == (3, 256, 256, 3)
    assert item['context']['cam2world'].shape == (3, 4, 4)
    assert item['query']['uv'].shape == (1, 64, 2)
    assert item['category'].sum() == 1.0
    # crop mask marks the valid (non-padded) region
    assert 0.5 < item['context']['crop_mask'].mean() <= 1.0


def test_co3d_camera_conversion_identity():
    """R=I, T=(0,0,z), centered principal point -> c2w with flipped x/y axes
    (the pytorch3d +X-left +Y-up to OpenCV conversion) and camera at
    (0, 0, -z)."""
    c2w, K = co3d.cameras_from_annotation(
        {'R': np.eye(3).tolist(), 'T': [0.0, 0.0, 2.0],
         'focal_length': [2.0, 2.0], 'principal_point': [0.0, 0.0],
         'intrinsics_format': 'ndc_norm_image_bounds'},
        (120, 160), (0, 0), 1.0)
    np.testing.assert_allclose(c2w[:3, :3], np.diag([-1.0, -1.0, 1.0]),
                               atol=1e-6)
    np.testing.assert_allclose(c2w[:3, 3], [0, 0, -2.0], atol=1e-6)
    # f_ndc=2 with half-width 80 -> fx = 160 px
    assert K[0, 0] == 160.0 and K[1, 1] == 120.0
    np.testing.assert_allclose([K[0, 2], K[1, 2]], [80, 60], atol=1e-6)


def test_co3d_bbox_math():
    mask = np.zeros((100, 100), np.float32)
    mask[20:60, 30:80] = 1.0
    bbox = co3d.bbox_from_mask(mask)
    np.testing.assert_array_equal(bbox, [30, 20, 50, 40])
    box = co3d.clamp_bbox(bbox, 0.3, (100, 100))
    x0, y0, x1, y1 = box
    assert x0 < 30 and y0 < 20 and x1 > 80 and y1 > 60


def test_deterministic_eval_sampling(co3d_root):
    (co3d_root / 'hydrant' / 'set_lists' /
     'set_lists_fewview_dev.json').write_text(
        (co3d_root / 'hydrant' / 'set_lists' /
         'set_lists_fewview_train.json').read_text().replace(
             '"train"', '"tmp"').replace('"val"', '"train"').replace(
                 '"tmp"', '"val"'))
    ds1 = co3d.CO3Dv2Dataset(co3d_root, category='hydrant',
                             subset='fewview_dev', num_input_views=2,
                             query_sparsity=None)
    ds2 = co3d.CO3Dv2Dataset(co3d_root, category='hydrant',
                             subset='fewview_dev', num_input_views=2,
                             query_sparsity=None)
    if len(ds1):
        a, b = ds1[0], ds2[0]
        np.testing.assert_array_equal(a['context']['cam2world'],
                                      b['context']['cam2world'])


def test_make_co3d_corpus_camera_roundtrip():
    """tools/make_co3d_corpus writes viewpoints whose loader conversion
    recovers the generating OpenCV camera exactly."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / 'tools'))
    import make_co3d_corpus as mk

    rng = np.random.default_rng(3)
    H, W = 256, 256
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 1.2 * W
    K[0, 2], K[1, 2] = W / 2 + 3.0, H / 2 - 5.0   # off-center pp too
    for c2w in mk.orbit_c2w(rng, 4):
        R, T = mk.opencv_to_p3d(np.linalg.inv(c2w))
        f_ndc, p_ndc = mk.pixel_K_to_ndc(K, H, W)
        c2w_rt, K_rt = co3d.cameras_from_annotation(
            {'R': R.tolist(), 'T': T.tolist(),
             'focal_length': f_ndc.tolist(),
             'principal_point': p_ndc.tolist(),
             'intrinsics_format': 'ndc_norm_image_bounds'},
            (H, W), (0, 0), 1.0)
        np.testing.assert_allclose(c2w_rt, c2w, atol=1e-6)
        np.testing.assert_allclose(K_rt, K, atol=1e-6)


def test_custom_category_gets_zero_onehot(co3d_root):
    """A category outside the official CO3D-51 list (e.g. a generated
    corpus) must load with a zero one-hot, not KeyError."""
    import shutil
    root2 = co3d_root.parent / 'co3d_custom'
    if not root2.exists():
        shutil.copytree(co3d_root, root2)
        (root2 / 'boxworld').symlink_to(root2 / 'hydrant')
        # rewrite paths? simpler: rename the category dir
        (root2 / 'boxworld').unlink()
        (root2 / 'hydrant').rename(root2 / 'boxworld')
        import gzip as _g, json as _j
        p = root2 / 'boxworld' / 'frame_annotations.jgz'
        annots = _j.load(_g.open(p, 'rt'))
        for a in annots:
            a['image']['path'] = a['image']['path'].replace(
                'hydrant/', 'boxworld/')
            a['mask']['path'] = a['mask']['path'].replace(
                'hydrant/', 'boxworld/')
        with _g.open(p, 'wt') as f:
            _j.dump(annots, f)
        sl = root2 / 'boxworld' / 'set_lists' / 'set_lists_fewview_train.json'
        sl.write_text(sl.read_text().replace('hydrant/', 'boxworld/'))
    ds = co3d.CO3Dv2Dataset(root2, category='boxworld',
                            subset='fewview_train', num_input_views=2,
                            query_sparsity=32)
    assert len(ds) == 2
    item = ds[0]          # must not raise
    assert item['context']['rgb'].shape[0] == 2
