"""Hardware-only regression guards (skipped on the CPU test mesh).

The Mosaic f32-dot truncation defect (docs/PERF.md round-3
precision-fix section) was INVISIBLE to every CPU test — interpret mode
computes true f32.  When a TPU is attached (`pytest tests/ -m tpu` in a
TPU-backed session, or just running this file there), these pin the
hardware numerics the fix established.  On the CPU suite they skip.
"""

from __future__ import annotations

import jax
import pytest

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="hardware-only numerics guard"
)


@requires_tpu
def test_mosaic_precision_contract():
    from scripts.probe_mosaic_precision import run

    res = run(verbose=False)
    # encode-input movements are bit-exact (3-limb split)
    assert res["exact_from_rs_err"] == 0.0
    assert res["exact_expand_err"] == 0.0
    # generic movements round at bf16 by design — but never worse
    assert res["generic_to_rs_rel"] < 4e-3
    # the encode is at the cos-phase-trick floor, not O(1) noise: the
    # buggy kernel read 0.95-2.0 at octaves 6-9
    for octave, err in enumerate(res["encode_err_by_octave"]):
        assert err < 5e-4, (octave, err)
