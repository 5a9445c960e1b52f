"""Summary/observability tests: entropy, depth colormap, epipolar painting,
and the full TensorBoard write path."""

import numpy as np
import pytest

from cross_attention_renderer_tpu.train import summaries as S


def test_attention_entropy_bounds():
    B, V, R, P = 2, 2, 8, 16
    uniform = np.full((B, V, R, P), 1.0 / (V * P))
    ent = S.attention_entropy(uniform)
    np.testing.assert_allclose(ent, np.log(V * P), atol=1e-5)
    peaked = np.zeros((B, V, R, P))
    peaked[:, 0, :, 0] = 1.0
    assert S.attention_entropy(peaked) < 1e-6


def test_colorize_depth():
    d = np.linspace(0, 1, 64).reshape(8, 8)
    img = S.colorize_depth(d)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8


def test_paint_epipolar_points():
    V, H, W, R, P = 2, 32, 32, 4, 8
    rng = np.random.default_rng(0)
    ctx = rng.uniform(0, 1, (V, H, W, 3))
    pix = rng.uniform(-1, 1, (V, R, P, 2))
    wt = rng.dirichlet(np.ones(P), (V, R))
    out = S.paint_epipolar_points(ctx, pix, wt, ray_idx=2)
    assert out.shape == (V, H, W, 3) and out.dtype == np.uint8
    # red sample markers and a green argmax box must be present
    assert (out == [255, 0, 0]).all(-1).any()
    assert (out == [0, 255, 0]).all(-1).any()


def test_write_summaries_tensorboard(tmp_path):
    tbx = pytest.importorskip('tensorboardX')
    writer = tbx.SummaryWriter(str(tmp_path))
    B, V, R, P = 1, 2, 64, 8
    rng = np.random.default_rng(1)
    scene = {'context': {'rgb': rng.uniform(-1, 1, (B, V, 16, 16, 3))}}
    out = {
        'at_wt': rng.dirichlet(np.ones(V * P), (B, R)).reshape(
            B, R, V, P).transpose(0, 2, 1, 3),
        'rgb': rng.uniform(-1, 1, (B, 1, R, 3)),
        'depth_ray': rng.uniform(0, 5, (B, R, 1)),
        'pixel_val': rng.uniform(-1, 1, (B, V, R, P, 2)),
    }
    S.write_summaries(writer, 3, scene, out, prefix='val_')
    writer.close()
    assert any(tmp_path.iterdir())  # an events file was written


def test_write_summaries_nonsquare_rays(tmp_path):
    """Train-time sparse ray sets (query_sparsity=192) must still produce
    prediction/depth images (scattered at uv), not silently skip them."""
    tbx = pytest.importorskip('tensorboardX')
    written = []
    writer = tbx.SummaryWriter(str(tmp_path))
    orig = writer.add_image
    writer.add_image = lambda tag, *a, **k: (written.append(tag),
                                             orig(tag, *a, **k))
    B, V, R, P, H = 1, 2, 192, 8, 16
    rng = np.random.default_rng(2)
    scene = {
        'context': {'rgb': rng.uniform(-1, 1, (B, V, H, H, 3))},
        'query': {'uv': rng.uniform(0, H, (B, 1, R, 2))},
    }
    out = {
        'at_wt': rng.dirichlet(np.ones(V * P), (B, R)).reshape(
            B, R, V, P).transpose(0, 2, 1, 3),
        'rgb': rng.uniform(-1, 1, (B, 1, R, 3)),
        'depth_ray': rng.uniform(0, 5, (B, R, 1)),
        'pixel_val': rng.uniform(-1, 1, (B, V, R, P, 2)),
    }
    S.write_summaries(writer, 7, scene, out, prefix='train_')
    writer.close()
    assert 'train_prediction' in written and 'train_depth' in written


def test_epipolar_panel():
    """The reference's combined epi_summary panel (summaries.py:72-141):
    query tile with the inspected pixel blacked out + painted contexts,
    concatenated into one (H, (1+V)*W) row."""
    V, H, W, R, P = 2, 64, 64, 16, 8
    rng = np.random.default_rng(3)
    qry = rng.uniform(0.5, 1, (H, W, 3))
    ctx = rng.uniform(0.5, 1, (V, H, W, 3))
    uv = rng.uniform(0, H, (R, 2))
    pix = rng.uniform(-1, 1, (V, R, P, 2))
    wt = rng.dirichlet(np.ones(P), (V, R))
    panel = S.epipolar_panel(qry, ctx, uv, pix, wt, ray_idx=5)
    assert panel.shape == (H, (1 + V) * W, 3) and panel.dtype == np.uint8
    # the query pixel marker is black in the first tile
    assert (panel[:, :W] == 0).all(-1).any()
    # sample markers (grey 64) and argmax (black) appear in a context tile
    assert (panel[:, W:] == 64).all(-1).any()
    assert (panel[:, W:] == 0).all(-1).any()
