"""Direct TPU parity check: windowed_gather vs the XLA take path."""

import numpy as np
import jax
import jax.numpy as jnp

from cross_attention_renderer_tpu.ops.sorted_gather import (
    _corners_flat, _take_gather, windowed_gather, sort_stream,
    grid_sample_sorted)


def check(name, H, W, C, B, M, coherent=True, padding='border', seed=0):
    rng = np.random.default_rng(seed)
    fm = rng.normal(0, 1, (B, H, W, C)).astype(np.float32)
    coords = rng.uniform(-1.1, 1.1, (B, M // B, 2)).astype(np.float32)
    stream = sort_stream(jnp.asarray(coords), (H, W))
    idx, w = _corners_flat(H, W, jnp.float32, stream.coords,
                           stream.image_id, padding)
    fm_flat = jnp.asarray(fm.reshape(B * H * W, C))
    ref = np.asarray(_take_gather(fm_flat.astype(jnp.bfloat16), idx, w))
    out = np.asarray(windowed_gather(fm_flat, idx, w))
    d = np.abs(out - ref)
    print(f'{name}: max={d.max():.3e} mean={d.mean():.3e} '
          f'ref_scale={np.abs(ref).mean():.3f}')
    return d.max()


def main():
    print('backend:', jax.default_backend())
    check('64x64x256   sorted', 64, 64, 256, 2, 1 << 20)
    check('128x128x256 sorted', 128, 128, 256, 2, 1 << 20)
    check('256x256x64  sorted', 256, 256, 64, 2, 1 << 20)
    check('256x256x64  zeros ', 256, 256, 64, 2, 1 << 20, padding='zeros')
    check('small       sorted', 16, 16, 32, 2, 4096)


if __name__ == '__main__':
    main()
