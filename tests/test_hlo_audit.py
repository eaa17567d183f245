"""HLO-level multi-chip structure audits (round-3 VERDICT #4a).

Compiles the real jitted programs on the virtual 8-device CPU mesh and
asserts the collective structure GSPMD must emit: exactly one fused
gradient all-reduce in the train step (element-count-exact against the
parameter tree) and a reduction-free render chunk whose only collectives
are the final output all-gathers.  GSPMD partitions identically on CPU
meshes and TPU pods; only the collective backend differs.
"""

from __future__ import annotations

import jax
import numpy as np
import pytest

from nerf_keras_tpu.config import NeRFConfig
from nerf_keras_tpu.engine.trainer import Trainer
from nerf_keras_tpu.parallel.audit import (
    audit_render_hlo,
    audit_train_step_hlo,
    collect_collectives,
)
from nerf_keras_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the virtual 8-device mesh"
)

_ARCH = dict(
    batch_size=64, ns_coarse=8, ns_fine=16, num_layers=4, hidden_dim=64,
    compute_dtype="float32",
)


def _batch(b=64, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.uniform(0, 1, (b, 3)).astype(np.float32)
    o = np.tile(np.array([0, 0, 4.0], np.float32), (b, 1))
    d = rng.normal(size=(b, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return imgs, o, d


def _trainer(**over):
    kw = dict(_ARCH)
    kw.update(over)
    cfg = NeRFConfig(**kw).validate()
    return Trainer(cfg, 2.0, 6.0, mesh=make_mesh(8, 1))


def test_official_proposal_step_one_allreduce():
    """The official (online-proposal, union, distortion+anneal) Pallas
    step: ONE fused gradient all-reduce, nothing else."""
    tr = _trainer(
        use_pallas=True, train_sampler="proposal",
        distortion_loss_mult=1e-4, prop_anneal_steps=100,
    )
    rec = audit_train_step_hlo(
        tr, tr.put_batch(_batch()), jax.random.PRNGKey(0)
    )
    assert rec["all_reduce_elements"] >= rec["param_elements"]


def test_parity_coarse_step_one_allreduce():
    """The reference-parity coarse+fine Pallas step audits the same."""
    tr = _trainer(use_pallas=True)
    audit_train_step_hlo(tr, tr.put_batch(_batch()), jax.random.PRNGKey(0))


def test_chain_step_one_allreduce():
    """The 2-level hierarchical chain adds a net but not a collective."""
    tr = _trainer(
        use_pallas=True, train_sampler="proposal", prop_union=False,
        prop_levels=2, prop_samples=8, prop_explore=0.1,
        prop_anneal_steps=100,
    )
    audit_train_step_hlo(tr, tr.put_batch(_batch()), jax.random.PRNGKey(0))


def test_render_chunk_reduction_free():
    """Render chunk: zero all-reduces; collectives == output all-gathers
    (element-exact), for both the parity and proposal renderers."""
    for over in (
        dict(use_pallas=True),
        dict(use_pallas=True, train_sampler="proposal", prop_union=False,
             prop_levels=2, prop_samples=8),
    ):
        tr = _trainer(**over)
        _, o, d = _batch()
        od = tr.put_global_batch((o, d))
        rec = audit_render_hlo(tr, *od)
        assert rec["all_reduce_count"] == 0
        assert rec["all_gather_elements"] == rec["output_elements"]


def test_collect_collectives_parses_async_forms():
    hlo = """
  %all-reduce-start.1 = f32[8]{0} all-reduce-start(%x), replica_groups={}
  %ag = f32[64,3]{1,0} all-gather(%y), channel_id=4
  %plain = f32[8]{0} add(%a, %b)
"""
    coll = collect_collectives(hlo)
    assert len(coll["all-reduce"]) == 1
    assert len(coll["all-gather"]) == 1
    assert not coll["all-to-all"]

def test_result_elements_async_forms():
    """Async-start lines parse the RESULT tuple only — operand shapes in
    the call args must not be double-counted (round-4 ADVICE)."""
    from nerf_keras_tpu.parallel.audit import _result_elements

    sync = "%ar = f32[8,4]{1,0} all-reduce(f32[8,4]{1,0} %x), to_apply=%sum"
    assert _result_elements(sync) == 32
    async_line = ("%ars = (f32[8,4]{1,0}, f32[8,4]{1,0}) "
                  "all-reduce-start(f32[8,4]{1,0} %x), to_apply=%sum")
    # result tuple = (operand alias, result) -> 64, NOT 96 (operand again)
    assert _result_elements(async_line) == 64
    ag = ("%ag = (f32[16,3]{1,0}, f32[64,3]{1,0}) "
          "all-gather-start(f32[16,3]{1,0} %y), channel_id=2")
    assert _result_elements(ag) == 48 + 192
