"""CLI smoke tests: train a few steps and evaluate one scene end-to-end via
the argparse entry points (tiny encoder, CPU, synthetic on-disk dataset)."""

import sys

import numpy as np
import pytest
from scipy.io import savemat

TINY_FLAGS = ['--fusion_features', '32', '--vit_width', '64',
              '--vit_depth', '2', '--vit_heads', '2',
              '--resnet_layers', '1', '1', '1', '--npoints', '8']


@pytest.fixture(scope='module')
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp('cli_ds')
    img_root = root / 'frames'
    img_root.mkdir()
    rng = np.random.default_rng(0)
    poses = {}
    for s in range(2):
        name = f'scene{s:03d}'
        (img_root / name).mkdir()
        frames, rows = {}, []
        for t in range(140):
            ts = 1000 * t
            frames[f'{ts}.png'] = rng.integers(
                0, 255, (64, 114, 3), dtype=np.uint8)
            w2c = np.eye(4)
            w2c[:3, 3] = rng.normal(0, 0.05, 3) + [0, 0, 0.01 * t]
            rows.append([ts, 0.9, 1.6, 0.5, 0.5, 0, 0,
                         *w2c[:3, :].reshape(-1)])
        np.savez(img_root / name / 'data.npz', **frames)
        poses[name] = np.asarray(rows)
    savemat(root / 'poses.mat', poses)
    return img_root, root / 'poses.mat'


@pytest.mark.slow
def test_train_cli_smoke(dataset, tmp_path, monkeypatch):
    # 64-pixel frames break the 256-crop assumptions of the real loader;
    # patch the constants for the smoke run.
    from cross_attention_renderer_tpu.data import realestate as re_data
    monkeypatch.setattr(re_data, 'IMG_H', 64)
    monkeypatch.setattr(re_data, 'IMG_W', 114)
    monkeypatch.setattr(re_data, 'CROP', 64)
    img_root, pose_root = dataset
    from cross_attention_renderer_tpu.cli import train as train_cli
    train_cli.main([
        '--img_root', str(img_root), '--pose_root', str(pose_root),
        '--logging_root', str(tmp_path), '--experiment_name', 'smoke',
        '--batch_size', '1', '--max_steps', '2', '--query_sparsity', '16',
        '--lr', '1e-4', '--steps_til_summary', '100',
        *TINY_FLAGS])
    assert (tmp_path / 'smoke' / 'checkpoints' / 'final').exists()


def test_dtype_flag_threads_to_model():
    import jax.numpy as jnp
    from cross_attention_renderer_tpu.cli.common import (base_parser,
                                                         build_model)
    opt = base_parser('t').parse_args(['--dtype', 'bfloat16', *TINY_FLAGS])
    assert build_model(opt).dtype == jnp.bfloat16
    opt = base_parser('t').parse_args(TINY_FLAGS)
    assert build_model(opt).dtype == jnp.float32


@pytest.mark.slow
def test_train_cli_bf16_smoke(dataset, tmp_path, monkeypatch):
    # bf16 compute via the CLI flag: params/optimizer stay f32 (the
    # checkpoint is dtype-portable), the train step runs in bfloat16.
    from cross_attention_renderer_tpu.data import realestate as re_data
    monkeypatch.setattr(re_data, 'IMG_H', 64)
    monkeypatch.setattr(re_data, 'IMG_W', 114)
    monkeypatch.setattr(re_data, 'CROP', 64)
    img_root, pose_root = dataset
    from cross_attention_renderer_tpu.cli import train as train_cli
    train_cli.main([
        '--img_root', str(img_root), '--pose_root', str(pose_root),
        '--logging_root', str(tmp_path), '--experiment_name', 'bf16',
        '--batch_size', '1', '--max_steps', '2', '--query_sparsity', '16',
        '--dtype', 'bfloat16', *TINY_FLAGS])
    assert (tmp_path / 'bf16' / 'checkpoints' / 'final').exists()


@pytest.mark.slow
def test_train_cli_lpips_smoke(dataset, tmp_path, monkeypatch, lpips_npz):
    """Stage-2 command (--lpips --depth) end-to-end through the CLI: the
    LPIPS weights load via $LPIPS_WEIGHTS and the term reaches the step."""
    from cross_attention_renderer_tpu.data import realestate as re_data
    monkeypatch.setattr(re_data, 'IMG_H', 64)
    monkeypatch.setattr(re_data, 'IMG_W', 114)
    monkeypatch.setattr(re_data, 'CROP', 64)
    monkeypatch.setenv('LPIPS_WEIGHTS', str(lpips_npz))
    img_root, pose_root = dataset
    from cross_attention_renderer_tpu.cli import train as train_cli
    train_cli.main([
        '--img_root', str(img_root), '--pose_root', str(pose_root),
        '--logging_root', str(tmp_path), '--experiment_name', 'smoke_lpips',
        '--batch_size', '1', '--max_steps', '2', '--lpips', '--depth',
        '--lr', '1e-4', '--steps_til_summary', '100',
        *TINY_FLAGS])
    assert (tmp_path / 'smoke_lpips' / 'checkpoints' / 'final').exists()


@pytest.mark.slow
def test_train_cli_val_summary_smoke(dataset, tmp_path, monkeypatch):
    """--val_img_root drives the full-frame val summary (strided low-res
    grid; cli/train.py val_fn) and writes TB events without touching the
    training loop's outcome."""
    pytest.importorskip('tensorboardX')
    from cross_attention_renderer_tpu.data import realestate as re_data
    monkeypatch.setattr(re_data, 'IMG_H', 64)
    monkeypatch.setattr(re_data, 'IMG_W', 114)
    monkeypatch.setattr(re_data, 'CROP', 64)
    img_root, pose_root = dataset
    from cross_attention_renderer_tpu.cli import train as train_cli
    train_cli.main([
        '--img_root', str(img_root), '--pose_root', str(pose_root),
        '--val_img_root', str(img_root), '--val_pose_root', str(pose_root),
        '--logging_root', str(tmp_path), '--experiment_name', 'val_smoke',
        '--batch_size', '1', '--max_steps', '2', '--query_sparsity', '16',
        '--steps_til_summary', '2', *TINY_FLAGS])
    ev = list((tmp_path / 'val_smoke' / 'summaries').glob('events*'))
    assert ev, 'val summary wrote no tensorboard events'
    # the event file must be non-trivial (images written, not just header)
    assert ev[0].stat().st_size > 1000


def test_train_cli_lpips_requires_weights(dataset, tmp_path, monkeypatch):
    """--lpips with no convertible weights anywhere is a hard error."""
    from cross_attention_renderer_tpu.data import realestate as re_data
    monkeypatch.setattr(re_data, 'IMG_H', 64)
    monkeypatch.setattr(re_data, 'IMG_W', 114)
    monkeypatch.setattr(re_data, 'CROP', 64)
    monkeypatch.setenv('LPIPS_WEIGHTS', str(tmp_path / 'missing.npz'))
    img_root, pose_root = dataset
    from cross_attention_renderer_tpu.cli import train as train_cli
    with pytest.raises(FileNotFoundError, match='LPIPS weights not found'):
        train_cli.main([
            '--img_root', str(img_root), '--pose_root', str(pose_root),
            '--logging_root', str(tmp_path), '--experiment_name', 'x',
            '--batch_size', '1', '--max_steps', '1', '--lpips',
            *TINY_FLAGS])


def test_eval_cli_smoke(dataset, tmp_path, monkeypatch, capsys, lpips_npz):
    from cross_attention_renderer_tpu.data import realestate as re_data
    monkeypatch.setattr(re_data, 'IMG_H', 64)
    monkeypatch.setattr(re_data, 'IMG_W', 114)
    monkeypatch.setattr(re_data, 'CROP', 64)
    # real (random-weight) LPIPS through the eval path — the batched-NHWC
    # contract of evaluate_scene's lpips call regressed once on chip
    monkeypatch.setenv('LPIPS_WEIGHTS', str(lpips_npz))
    # full_uv_grid is captured at dataset init; rebuild for the 64 crop
    img_root, pose_root = dataset
    from cross_attention_renderer_tpu.cli import eval as eval_cli
    from cross_attention_renderer_tpu.train import evaluation as ev
    orig = ev.evaluate_scene

    def eval64(model, params, scene, **kw):
        kw.update(H=64, W=64)
        return orig(model, params, scene, **kw)

    monkeypatch.setattr(ev, 'evaluate_scene', eval64)
    monkeypatch.setattr(eval_cli, 'evaluate_scene', eval64)
    eval_cli.main([
        '--img_root', str(img_root), '--pose_root', str(pose_root),
        '--logging_root', str(tmp_path), '--experiment_name', 'smoke_eval',
        '--max_scenes', '1', '--n_chunks', '4', *TINY_FLAGS])
    out = capsys.readouterr().out
    assert 'psnr=' in out and 'ssim=' in out
    assert 'lpips=' in out, f'LPIPS missing from eval output: {out}'


def test_fast_eval_flags_parse():
    from cross_attention_renderer_tpu.cli.common import (base_parser,
                                                         fast_eval_kwargs)
    p = base_parser('x')
    opt = p.parse_args(['--pruned', '16,24', '--narrow', '128,128,64',
                        '--q8'])
    assert fast_eval_kwargs(opt) == {'pruned': (16, 24),
                                     'narrow': (128, 128, 64), 'q8': True}
    opt = p.parse_args([])
    assert fast_eval_kwargs(opt) == {'pruned': None, 'narrow': None,
                                     'q8': False}


def test_fast_preset_kwargs():
    """--fast composes the documented defaults; explicit flags override
    their part of the preset (docs/FAST_EVAL.md)."""
    from cross_attention_renderer_tpu.cli.common import (base_parser,
                                                         fast_eval_kwargs)
    p = base_parser('t')
    kw = fast_eval_kwargs(p.parse_args(['--fast']))
    assert kw == dict(pruned=(8, 16), narrow=(128, 128, 64), q8=True)
    kw = fast_eval_kwargs(p.parse_args(['--fast', '--pruned', '8,8']))
    assert kw['pruned'] == (8, 8) and kw['narrow'] == (128, 128, 64)
    kw = fast_eval_kwargs(p.parse_args([]))
    assert kw == dict(pruned=None, narrow=None, q8=False)


@pytest.mark.slow
def test_eval_cli_fast_smoke(dataset, tmp_path, monkeypatch, capsys):
    """The --fast preset drives the composed fast renderer through the real
    eval CLI (pruned + narrow + q8 at smoke-sized settings)."""
    from cross_attention_renderer_tpu.data import realestate as re_data
    monkeypatch.setattr(re_data, 'IMG_H', 64)
    monkeypatch.setattr(re_data, 'IMG_W', 114)
    monkeypatch.setattr(re_data, 'CROP', 64)
    img_root, pose_root = dataset
    from cross_attention_renderer_tpu.cli import eval as eval_cli
    from cross_attention_renderer_tpu.train import evaluation as ev
    orig = ev.evaluate_scene

    def eval64(model, params, scene, **kw):
        kw.update(H=64, W=64)
        return orig(model, params, scene, **kw)

    monkeypatch.setattr(ev, 'evaluate_scene', eval64)
    monkeypatch.setattr(eval_cli, 'evaluate_scene', eval64)
    eval_cli.main([
        '--img_root', str(img_root), '--pose_root', str(pose_root),
        '--logging_root', str(tmp_path), '--experiment_name', 'fast_eval',
        '--max_scenes', '1', '--n_chunks', '4',
        '--fast', '--pruned', '4,6', '--narrow', '16,16,32', *TINY_FLAGS])
    out = capsys.readouterr().out
    assert 'psnr=' in out and 'ssim=' in out
