"""L6 pose estimation: SuperPoint + SuperGlue (JAX) + RANSAC pose (host).

Submodules keep their names (``pose.superpoint.superpoint(...)``); only the
host-pipeline helpers are re-exported here.
"""

from cross_attention_renderer_tpu.pose import (classical, superglue,
                                               superpoint, unposed)
from cross_attention_renderer_tpu.pose.classical import match_pair_classical
from cross_attention_renderer_tpu.pose.unposed import (
    estimate_pose,
    match_pair,
    rotate_interpolate,
    unposed_scene,
)

__all__ = ['classical', 'estimate_pose', 'match_pair',
           'match_pair_classical', 'rotate_interpolate', 'superglue',
           'superpoint', 'unposed', 'unposed_scene']
