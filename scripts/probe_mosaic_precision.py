"""Hardware probes for the Mosaic f32-dot precision contract.

Round 3 found Mosaic one-pass-bf16-truncating f32 dot_general operands
at DEFAULT precision — the in-kernel encode trained octaves >= 6 as
noise and selector-moved values rounded at bf16 (docs/PERF.md round-3
precision-fix section; docs/evidence/mosaic_precision_fix.json).  CPU
interpret mode computes true f32, so ONLY a hardware run can verify the
fix; this script is the standing regression probe (also run by
tests/test_tpu_hardware.py when a TPU is attached).

    python scripts/probe_mosaic_precision.py          # on the TPU

Expected healthy output: selector movements for encode inputs EXACT
(0.0), generic movements <= bf16 rounding (~2e-3, by design), encode
feature error at the cos-phase-trick floor (~1.2e-4 at octave 9,
NOT O(1)).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(verbose: bool = True) -> dict:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from nerf_keras_tpu.ops import encode_position
    from nerf_keras_tpu.ops.pallas.fused_render import (
        _encode_consts,
        _encode_tile,
        _expand_rows_x,
        _from_rs_x,
        _sel_consts,
        _to_rs,
    )

    R, S = 8, 16
    sel_a, sel_at, sel_b = _sel_consts(S)
    rng = np.random.default_rng(0)

    def kern(v_ref, t_ref, a_ref, at_ref, b_ref, rs_ref, texp_ref, vexp_ref):
        rs_ref[:] = _to_rs(v_ref[:], a_ref, b_ref)
        texp_ref[:] = _from_rs_x(t_ref[:], at_ref, b_ref)
        vexp_ref[:] = _expand_rows_x(t_ref[:, :3], at_ref)

    v = rng.uniform(0.5, 2.0, (R * S, 1)).astype(np.float32)
    t = rng.uniform(2.0, 6.0, (R, S)).astype(np.float32)
    rs, texp, vexp = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((R, S), jnp.float32),
            jax.ShapeDtypeStruct((R * S, 1), jnp.float32),
            jax.ShapeDtypeStruct((R * S, 3), jnp.float32),
        ],
    )(jnp.asarray(v), jnp.asarray(t), sel_a, sel_at, sel_b)
    res = {
        "generic_to_rs_rel": float(
            np.abs(np.asarray(rs) - v.reshape(R, S)).max() / np.abs(v).max()
        ),
        "exact_from_rs_err": float(
            np.abs(np.asarray(texp).reshape(R, S) - t).max()
        ),
        "exact_expand_err": float(
            np.abs(
                np.asarray(vexp) - np.repeat(t[:, :3], S, axis=0)
            ).max()
        ),
    }

    ex, dx = _encode_consts(3, 10)
    ex = jnp.asarray(ex)

    def kern_enc(p_ref, e_ref, o_ref):
        o_ref[:] = _encode_tile(p_ref[:], e_ref, dx)

    p = rng.uniform(-6, 6, (R * S, 3)).astype(np.float32)
    enc = np.asarray(
        pl.pallas_call(
            kern_enc,
            out_shape=jax.ShapeDtypeStruct((R * S, 3 + 60), jnp.float32),
        )(jnp.asarray(p), ex),
        np.float64,
    )
    ref = np.asarray(encode_position(jnp.asarray(p), 10), np.float64)
    err = np.abs(enc - ref)
    res["encode_err_by_octave"] = [
        float(err[:, 3 + 6 * l: 3 + 6 * (l + 1)].max()) for l in range(10)
    ]
    if verbose:
        import json

        print(f"backend={jax.default_backend()}")
        print(json.dumps(res, indent=1))
    return res


def gate(res: dict) -> tuple[bool, list[str]]:
    """Pass/fail the precision contract (round-4 regression gate).

    Healthy values on v5e (docs/evidence/mosaic_precision_fix.json):
    selector limb movements EXACT (0.0), generic movements at bf16
    rounding (~2e-3 by design), encode feature error at the
    cos-phase-trick floor (~1.2e-4 at octave 9).  The broken state this
    gate exists to catch is O(1) encode error at octaves >= 6 and ~4e-3
    relative error on selector-moved values — both invisible to the CPU
    suite (interpret mode computes true f32).
    """
    reasons = []
    if res["exact_from_rs_err"] != 0.0 or res["exact_expand_err"] != 0.0:
        reasons.append(
            f"selector limb movements not exact: from_rs="
            f"{res['exact_from_rs_err']} expand={res['exact_expand_err']} "
            "(three-limb bf16 decomposition regressed)"
        )
    if res["generic_to_rs_rel"] > 4e-3:
        reasons.append(
            f"generic selector movement rel err "
            f"{res['generic_to_rs_rel']} > 4e-3 (beyond bf16 rounding)"
        )
    high = max(res["encode_err_by_octave"][6:])
    if high > 1e-3:
        reasons.append(
            f"encode octaves >= 6 max err {high} > 1e-3 (encode dot no "
            "longer precision=HIGHEST — octaves would train as noise)"
        )
    return (not reasons), reasons


if __name__ == "__main__":
    res = run()
    ok, reasons = gate(res)
    print(f"gate: {'PASS' if ok else 'FAIL'}")
    for r in reasons:
        print("  " + r)
    sys.exit(0 if ok else 1)
