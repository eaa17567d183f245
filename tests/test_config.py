import glob
import json

import pytest

from nerf_keras_tpu.config import (
    NeRFConfig,
    config_from_dict,
    load_config,
    to_reference_json,
)


def test_all_shipped_configs_load():
    # 6 reference-mirroring configs + the round-4 quality recipe
    paths = sorted(glob.glob("config/*.json"))
    assert len(paths) == 7, f"expected 7 shipped configs, found {paths}"
    for p in paths:
        cfg = load_config(p)
        assert cfg.num_layers == 8
        assert cfg.hidden_dim == 256
        assert cfg.l_xyz == 10 and cfg.l_dir == 4
        assert cfg.learning_rate == pytest.approx(5e-4)


def test_reference_schema_roundtrip():
    cfg = NeRFConfig(batch_size=512, ns_coarse=16, ns_fine=32, batch_norm=True)
    raw = to_reference_json(cfg)
    assert raw["BATCH_SIZE"] == 512
    cfg2 = config_from_dict(raw)
    assert cfg2 == cfg


def test_unknown_key_rejected():
    with pytest.raises(ValueError, match="unknown config keys"):
        config_from_dict({"BATCH_SIZE": 4, "BOGUS": 1})


def test_validation():
    with pytest.raises(ValueError):
        NeRFConfig(batch_size=0).validate()
    with pytest.raises(ValueError):
        NeRFConfig(sampling_mode="nope").validate()


def test_derived_dims():
    cfg = NeRFConfig(l_xyz=10, l_dir=4)
    assert cfg.xyz_dim == 63
    assert cfg.dir_dim == 27
    assert cfg.ns_total == cfg.ns_coarse + cfg.ns_fine


def test_overrides(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"BATCH_SIZE": 64, "NS_COARSE": 8}))
    cfg = load_config(str(p), epochs=3)
    assert cfg.batch_size == 64 and cfg.epochs == 3


def test_eval_every_precedence():
    """Explicit EVAL_EVERY in the config must win over the entry point's
    default cadence — including EVAL_EVERY=1 (the round-1 wart: 1 was
    indistinguishable from unset and silently replaced by 50 on the TPU
    entry points)."""
    from nerf_keras_tpu.cli.train import resolve_eval_every

    unset = config_from_dict({"BATCH_SIZE": 64})
    assert unset.eval_every is None
    assert resolve_eval_every(None, unset, 50) == 50

    explicit_one = config_from_dict({"BATCH_SIZE": 64, "EVAL_EVERY": 1})
    assert resolve_eval_every(None, explicit_one, 50) == 1

    explicit = config_from_dict({"BATCH_SIZE": 64, "EVAL_EVERY": 7})
    assert resolve_eval_every(None, explicit, 50) == 7

    # 0 from the CLI is a usage error, not a ZeroDivisionError later
    with pytest.raises(SystemExit):
        resolve_eval_every(0, explicit, 50)

    # CLI flag beats everything
    assert resolve_eval_every(3, explicit, 50) == 3

    with pytest.raises(ValueError, match="eval_every"):
        config_from_dict({"BATCH_SIZE": 64, "EVAL_EVERY": 0})


def test_use_pallas_auto_resolution():
    """Default USE_PALLAS=None auto-resolves at Trainer build: off on CPU
    backends, forced values respected."""
    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.parallel.mesh import make_mesh
    import jax

    base = dict(batch_size=16, ns_coarse=4, ns_fine=4, num_layers=2, hidden_dim=16)
    cfg = NeRFConfig(**base).validate()
    assert cfg.use_pallas is None
    t = Trainer(cfg, 2.0, 6.0, mesh=make_mesh(1, 1, devices=jax.devices()[:1]))
    # test platform is CPU -> auto resolves to False
    assert t.cfg.use_pallas is False
    t2 = Trainer(
        NeRFConfig(use_pallas=True, **base).validate(), 2.0, 6.0,
        mesh=make_mesh(1, 1, devices=jax.devices()[:1]),
    )
    assert t2.cfg.use_pallas is True


def test_resolve_eval_batch():
    """Eval batch size must divide the data-mesh extent; odd val sizes
    round down instead of crashing; too-small val splits error early."""
    from nerf_keras_tpu.cli.train import resolve_eval_batch

    assert resolve_eval_batch(4096, 10000, 1) == 4096
    assert resolve_eval_batch(4096, 625, 2) == 624     # rounds down
    assert resolve_eval_batch(100, 625, 8) == 96
    assert resolve_eval_batch(4, 625, 8) == 8          # floor at divisor
    # model-parallel mesh (data axis 1) on 2 hosts: process count still
    # constrains the batch (put_global_batch slices rows over processes)
    assert resolve_eval_batch(4096, 625, 1, proc_count=2) == 624
    assert resolve_eval_batch(4096, 625, 3, proc_count=2) == 624  # lcm=6
    with pytest.raises(ValueError, match="val split"):
        resolve_eval_batch(4096, 5, 8)
    with pytest.raises(ValueError, match="val split"):
        resolve_eval_batch(4096, 7, 1, proc_count=8)


def test_lr_and_ema_validation():
    """LR_FINAL/LR_DECAY_STEPS/EMA_DECAY bounds (beyond-reference knobs)."""
    import dataclasses

    base = NeRFConfig(batch_size=32, ns_coarse=4, ns_fine=4)
    base.validate()
    # defaults are reference-parity: constant LR, no EMA
    assert base.lr_final is None and base.ema_decay == 0.0

    dataclasses.replace(
        base, lr_final=base.learning_rate / 10, lr_decay_steps=100
    ).validate()
    with pytest.raises(ValueError, match="LR_FINAL"):
        dataclasses.replace(base, lr_final=0.0).validate()
    with pytest.raises(ValueError, match="LR_FINAL"):
        dataclasses.replace(base, lr_final=base.learning_rate * 2).validate()
    with pytest.raises(ValueError, match="LR_DECAY_STEPS"):
        dataclasses.replace(base, lr_decay_steps=-1).validate()
    with pytest.raises(ValueError, match="EMA_DECAY"):
        dataclasses.replace(base, ema_decay=1.0).validate()
    with pytest.raises(ValueError, match="EMA_DECAY"):
        dataclasses.replace(base, ema_decay=-0.1).validate()


def test_epoch_unit_schedule_validation():
    """LR_DECAY_EPOCHS / PROP_ANNEAL_EPOCHS: epoch-unit horizons (the
    long-run pinned-schedule recipe) are mutually exclusive with their
    step-unit twins and bounded like them."""
    import dataclasses

    base = NeRFConfig(batch_size=32, ns_coarse=4, ns_fine=4)
    dataclasses.replace(
        base, lr_final=base.learning_rate / 10, lr_decay_epochs=80
    ).validate()
    dataclasses.replace(
        base, train_sampler="proposal", prop_anneal_epochs=80
    ).validate()
    with pytest.raises(ValueError, match="LR_DECAY_EPOCHS"):
        dataclasses.replace(base, lr_decay_epochs=-2).validate()
    with pytest.raises(ValueError, match="both set"):
        dataclasses.replace(
            base, lr_decay_epochs=80, lr_decay_steps=100
        ).validate()
    with pytest.raises(ValueError, match="PROP_ANNEAL_EPOCHS"):
        dataclasses.replace(
            base, train_sampler="proposal", prop_anneal_epochs=-2
        ).validate()
    with pytest.raises(ValueError, match="both set"):
        dataclasses.replace(
            base, train_sampler="proposal",
            prop_anneal_epochs=80, prop_anneal_steps=-1,
        ).validate()
    # anneal is a proposal-sampler knob in either unit
    with pytest.raises(ValueError, match="PROP_ANNEAL_EPOCHS"):
        dataclasses.replace(base, prop_anneal_epochs=80).validate()


def test_lr_ema_json_roundtrip(tmp_path):
    """The new keys load from reference-style JSON and survive the sidecar
    round-trip; LR_FINAL=None is omitted like the other nullable keys."""
    import json

    from nerf_keras_tpu.config import to_reference_json

    cfg = NeRFConfig(
        batch_size=32, ns_coarse=4, ns_fine=4, lr_final=5e-5,
        lr_decay_steps=1000, ema_decay=0.99,
    ).validate()
    d = to_reference_json(cfg)
    assert d["LR_FINAL"] == 5e-5
    assert d["LR_DECAY_STEPS"] == 1000
    assert d["EMA_DECAY"] == 0.99
    p = tmp_path / "c.json"
    p.write_text(json.dumps(d))
    cfg2 = load_config(str(p))
    assert cfg2 == cfg

    assert "LR_FINAL" not in to_reference_json(
        NeRFConfig(batch_size=32, ns_coarse=4, ns_fine=4)
    )


def test_shipped_quality_config_loads():
    """config/lego_quality_tpu.json — the round-4 chain quality recipe
    (docs/TRAINING.md short version) — must load and validate; the CLI
    auto-pins its schedule horizons at the 80-epoch count."""
    import os

    from nerf_keras_tpu.config import load_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(repo, "config", "lego_quality_tpu.json"))
    assert cfg.train_sampler == "proposal" and cfg.prop_levels == 2
    assert cfg.ns_fine == 64 and cfg.prop_union
    assert cfg.epochs == 200 and cfg.lr_final == 5e-5
    # round-5: the config ENCODES the validated pinned-schedule setup
    # (hier_prop_quality.json measured 200 epochs with both horizons
    # pinned at the 80-epoch step count) instead of relying on auto-pin
    assert cfg.lr_decay_epochs == 80 and cfg.prop_anneal_epochs == 80
    # and the long-horizon recipe never trips the chain-horizon warning
    from nerf_keras_tpu.cli.train import warn_chain_horizon

    assert not warn_chain_horizon(cfg)


def test_chain_horizon_warning(capsys):
    """PROP_LEVELS>=2 below the validated ~150-epoch crossover warns
    (round-4 VERDICT #5: chain-u6464 trails coarse at s7/80-epochs and
    only wins at every seed by 160-200 pinned epochs)."""
    from nerf_keras_tpu.cli.train import warn_chain_horizon

    chain = NeRFConfig(
        batch_size=32, ns_coarse=8, ns_fine=8, train_sampler="proposal",
        prop_levels=2, epochs=80,
    ).validate()
    assert warn_chain_horizon(chain)
    assert "hier_prop_quality" in capsys.readouterr().out
    # long runs and non-chain configs stay quiet
    import dataclasses

    assert not warn_chain_horizon(dataclasses.replace(chain, epochs=200))
    assert not warn_chain_horizon(
        dataclasses.replace(chain, prop_levels=1, prop_samples=0)
    )
    assert not warn_chain_horizon(NeRFConfig(epochs=80).validate())
