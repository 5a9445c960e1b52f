"""Standalone timing of the fused exchange epilogue kernel at flagship
shapes (M = 1M samples, channels (256, 256, 64)).

Usage: python -m tools.bench_epilogue [block_m ...]
"""

import sys
import time

import jax
import jax.numpy as jnp

from cross_attention_renderer_tpu.ops import gather_epilogue as GE

CHANNELS = (256, 256, 64)
F = sum(CHANNELS)
RP = 8192 * 64
M = 2 * RP
LD = F // 2
HID = 128


def main():
    blocks = [int(a) for a in sys.argv[1:]] or [256, 512, 1024]
    dt = jnp.bfloat16
    keys = iter(jax.random.split(jax.random.PRNGKey(0), 32))

    def arr(*s):
        return jax.random.normal(next(keys), s, dt)

    vals_both = tuple(arr(2 * M, 4 * c) for c in CHANNELS)
    aux_self = jax.random.uniform(next(keys), (M, 16), jnp.float32)
    aux_cross = jax.random.uniform(next(keys), (M, 16), jnp.float32)
    params = (arr(F + 3, F), arr(F), arr(F, LD), arr(LD),
              arr(2 * LD, LD), arr(LD), arr(2 * LD, HID), arr(HID),
              arr(HID, HID), arr(HID))
    jax.block_until_ready(vals_both)
    for bm in blocks:
        GE.BLOCK_M = bm
        try:
            f = jax.jit(lambda vb, as_, ac, p:
                        GE._pallas_forward(vb, as_, ac, p, RP))
            jl, kv = f(vals_both, aux_self, aux_cross, params)
            float(jl.sum())
            t0 = time.perf_counter()
            n = 20
            for _ in range(n):
                jl, kv = f(vals_both, aux_self, aux_cross, params)
            float(jl.sum()) + float(kv.sum())
            dt_ms = (time.perf_counter() - t0) / n * 1e3
            print(f'BLOCK_M={bm:5d}: {dt_ms:.2f} ms '
                  f'({dt_ms / (M // bm) * 1e3:.2f} us/step)')
        except Exception as e:
            print(f'BLOCK_M={bm:5d}: FAILED {type(e).__name__}: '
                  f'{str(e)[:200]}')


if __name__ == '__main__':
    main()
