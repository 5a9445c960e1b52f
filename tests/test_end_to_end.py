"""End-to-end integration: fit() curriculum -> checkpoint -> evaluate_scene,
all with the tiny encoder on the CPU mesh."""

import itertools

import pytest
import jax
import numpy as np

from cross_attention_renderer_tpu.data import make_scene
from cross_attention_renderer_tpu.models import CrossAttentionRenderer
from cross_attention_renderer_tpu.train import (
    TrainConfig, create_train_state, fit, restore_checkpoint)
from cross_attention_renderer_tpu.train.evaluation import evaluate_scene

TINY = dict(fusion_features=32, vit_width=64, vit_depth=2, vit_heads=2,
            resnet_layers=(1, 1, 1))


def stream():
    for seed in itertools.count():
        yield make_scene(seed % 4, batch=1, n_view=2, H=64, W=64, n_rays=16)


@pytest.mark.slow
def test_fit_checkpoint_eval(tmp_path):
    model = CrossAttentionRenderer(n_view=2, npoints=8, **TINY)
    cfg = TrainConfig(lr=1e-4, steps_til_summary=4, iters_til_checkpoint=4)
    state = fit(model, cfg, stream(), max_steps=5, ckpt_dir=str(tmp_path))
    assert int(state.step) == 5
    assert (tmp_path / 'final').exists()
    assert (tmp_path / 'step_000004').exists()
    assert (tmp_path / 'current').exists()

    # curriculum stage 2: warm-start from stage 1 (reference README.md:53-58)
    scene = next(stream())
    fresh = create_train_state(model, scene, cfg,
                               rng=jax.random.PRNGKey(9))
    warm = restore_checkpoint(tmp_path, fresh, 'final')
    a = state.params['params']['phi']['lin_out']['kernel']
    b = warm.params['params']['phi']['lin_out']['kernel']
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    stage2 = fit(model, TrainConfig(lr=1e-5, depth=True), stream(),
                 max_steps=2, state=warm)
    # warm start deliberately resets step + optimizer state
    # (train_realestate10k.py:100-101)
    assert int(stage2.step) == 2

    # eval protocol on a full-image synthetic scene
    eval_scene = make_scene(7, batch=1, n_view=2, H=64, W=64,
                            full_image=True)
    m = evaluate_scene(model, stage2.params, eval_scene, H=64, W=64,
                       n_chunks=4)
    assert np.isfinite(m['psnr'])
    assert -1.0 <= float(m['ssim']) <= 1.0
    assert m['pred'].shape == (64, 64, 3)


@pytest.mark.slow
def test_depth_loss_active_with_patch_mask():
    """The depth term must contribute only for patch-sampled rays
    (mask=1, 32x32)."""
    model = CrossAttentionRenderer(n_view=2, npoints=8, **TINY)
    scene = make_scene(0, batch=1, n_view=2, H=64, W=64, n_rays=32 * 32)
    scene['query']['mask'] = np.ones((1,), np.float32)
    from cross_attention_renderer_tpu.train import make_loss_fn
    cfg = TrainConfig(depth=True)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), scene)
    _, losses = make_loss_fn(model, cfg)(params, scene)
    assert 'depth_loss' in losses
    assert float(losses['depth_loss']) >= 0.0
    scene['query']['mask'] = np.zeros((1,), np.float32)
    _, losses0 = make_loss_fn(model, cfg)(params, scene)
    assert float(losses0['depth_loss']) == 0.0
