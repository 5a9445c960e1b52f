"""cross_attention_renderer_tpu — a TPU-native wide-baseline novel-view
synthesis framework (JAX / XLA / Pallas / pjit).

Re-implements the full capability surface of yilundu/cross_attention_renderer
("Learning to Render Novel Views from Wide-Baseline Stereo Pairs", CVPR 2023)
as a from-scratch TPU-first framework: functional model core, Pallas kernels
for the epipolar gather/attention hot path, mesh-parallel training via
jax.sharding, and orbax checkpointing.
"""

__version__ = '0.1.0'


def _enable_persistent_compile_cache():
    """On-disk XLA compilation cache for every entry point.

    The flagship programs are expensive to build (the V=3 scan renderer
    measured 435 s of compile on a one-core host — BENCH_NOTES.md), and the
    CLI surface is many short-lived processes (train, eval, render_traj,
    bench, a kill/resume relaunch) that would otherwise each pay it again.
    The reference has no analog (torch eager). Opt out with
    ``CAR_NO_COMPILE_CACHE=1``; relocate with ``CAR_COMPILE_CACHE=<dir>``.
    """
    import os
    if os.environ.get('CAR_NO_COMPILE_CACHE'):
        return
    try:
        import jax
        path = os.environ.get('CAR_COMPILE_CACHE',
                              os.path.expanduser('~/.cache/car_jax'))
        os.makedirs(path, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    except Exception:  # never make importing the package fatal
        pass


_enable_persistent_compile_cache()
