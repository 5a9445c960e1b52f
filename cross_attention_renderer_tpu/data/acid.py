"""ACID (aerial coastline) dataset.

The reference's ``acid_dataio.py`` is structurally identical to
``realestate10k_dataio.py`` (same npz+mat format, same constants —
SURVEY.md §2.1), so the ACID loaders are thin aliases of the RealEstate10K
implementation with the same sampling rules.
"""

from cross_attention_renderer_tpu.data.realestate import (
    RealEstate10k as ACID,
    RealEstate10kVis as ACIDVis,
    batch_iterator,
    trajectory_scene,
)

__all__ = ['ACID', 'ACIDVis', 'batch_iterator', 'trajectory_scene']
