"""cross_attention_renderer_tpu — a TPU-native wide-baseline novel-view
synthesis framework (JAX / XLA / Pallas / pjit).

Re-implements the full capability surface of yilundu/cross_attention_renderer
("Learning to Render Novel Views from Wide-Baseline Stereo Pairs", CVPR 2023)
as a from-scratch TPU-first framework: functional model core, Pallas kernels
for the epipolar gather/attention hot path, mesh-parallel training via
jax.sharding, and orbax checkpointing.
"""

__version__ = '0.1.0'
