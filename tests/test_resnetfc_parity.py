"""Decoder weight-parity: reference ResnetFC weights mapped into the Flax
ResnetFC reproduce the reference outputs exactly (f32 tolerance)."""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cross_attention_renderer_tpu.models import ResnetFC

FIX = pathlib.Path(__file__).parent / 'fixtures' / 'resnetfc_golden.npz'


def torch_linear(fix, name):
    """torch Linear state -> flax Dense param dict (kernel transposed)."""
    k = jnp.asarray(fix[f'w_{name}_weight'].T, jnp.float32)
    out = {'kernel': k}
    if f'w_{name}_bias' in fix:
        out['bias'] = jnp.asarray(fix[f'w_{name}_bias'], jnp.float32)
    return out


def test_resnetfc_weight_parity():
    fix = dict(np.load(FIX))
    model = ResnetFC(d_in=18, d_latent=576, d_out=3, n_blocks=3,
                     d_hidden=128)
    params = {'params': {
        'lin_in': torch_linear(fix, 'lin_in'),
        'lin_out': torch_linear(fix, 'lin_out'),
    }}
    for i in range(3):
        params['params'][f'lin_z{i}'] = torch_linear(fix, f'lin_z_{i}')
        params['params'][f'block{i}'] = {
            'fc_0': torch_linear(fix, f'blocks_{i}_fc_0'),
            'fc_1': torch_linear(fix, f'blocks_{i}_fc_1'),
        }
    # structural check: the mapped tree matches the model's own init tree
    ref_tree = jax.tree.structure(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 576 + 18))))
    assert jax.tree.structure(params) == ref_tree

    out = model.apply(params, jnp.asarray(fix['zx'], jnp.float32))
    np.testing.assert_allclose(np.asarray(out), fix['out'], atol=2e-4)
