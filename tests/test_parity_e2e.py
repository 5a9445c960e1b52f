"""Smoke test for the one-command pretrained-parity harness.

Runs tools/parity_e2e.py --smoke end to end: builds the full reference
torch model (REAL encoder via the timm shim) with random weights, saves a
checkpoint in the reference's on-disk format, converts it, renders with
the Flax model, and checks flax-vs-torch PSNR on the same rays. This is
the "day the blobs arrive" path with zero human steps (VERDICT round 2,
next-round task 6).
"""

import sys
import tempfile
from pathlib import Path

import pytest

TOOLS = Path(__file__).resolve().parents[1] / 'tools'
REFERENCE = Path('/root/reference')

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not REFERENCE.exists(),
                       reason='reference checkout not available'),
]


def test_parity_e2e_smoke():
    sys.path.insert(0, str(TOOLS))
    from parity_e2e import run_smoke
    with tempfile.TemporaryDirectory() as td:
        p = run_smoke(td)
    # f32 end-to-end with random weights: the two implementations should
    # agree to well beyond metric precision.
    assert p > 30.0, f'flax-vs-torch smoke parity only {p:.1f} dB'
