"""Real multi-process training: 2 CPU processes, localhost coordinator.

Verifies the capability that replaces the reference's TPUStrategy global
batch splitting (train_tpu_lego.py:72-82): per-host dataset shards are
assembled into one global array by ``Trainer.put_batch``
(``jax.make_array_from_process_local_data``), gradients allreduce across
processes, and the result is numerically identical to a single-process run
over the same global batches.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    USE_PALLAS = __USE_PALLAS__
    import json, os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from nerf_keras_tpu.parallel.distributed import (
        maybe_initialize, shard_dataset_for_process,
    )
    assert maybe_initialize(), "NERF_* env did not trigger initialization"
    assert jax.process_count() == 2

    import numpy as np
    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.data.pipeline import RayDataset, iterate_batches
    from nerf_keras_tpu.engine.trainer import Trainer

    # deterministic synthetic ray set, identical on both processes
    rng = np.random.default_rng(0)
    n = 128
    pixels = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.tile(np.array([0, 0, 4.0], np.float32), (n, 1))
    full = RayDataset(pixels, origins, dirs, 2.0, 6.0, 10.0, 8, 16)

    local = shard_dataset_for_process(full)
    assert len(local) == n // 2

    cfg = NeRFConfig(
        batch_size=32, ns_coarse=4, ns_fine=8, num_layers=2, hidden_dim=16,
        compute_dtype="float32", use_pallas=USE_PALLAS,
    ).validate()
    trainer = Trainer(cfg, 2.0, 6.0)
    assert trainer.mesh.shape["data"] == 2

    losses = []
    local_bs = cfg.batch_size // jax.process_count()
    for epoch in range(2):
        for batch in iterate_batches(local, local_bs, shuffle=True,
                                     seed=cfg.seed, epoch=epoch):
            m = trainer.train_step(trainer.put_batch(batch))
            losses.append(float(m["loss"]))

    # eval on a batch whose FULL content both processes hold
    val = (pixels[:32], origins[:32], dirs[:32])
    ev = trainer.eval_step(trainer.put_global_batch(val))
    print("RESULT " + json.dumps(
        {"losses": losses, "val_loss": float(ev["loss"])}
    ), flush=True)
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
@pytest.mark.parametrize("use_pallas", [False, True])
def test_two_process_training_matches_single_process(tmp_path, use_pallas):
    """use_pallas=True is the real pod configuration: the fused megakernel
    under shard_map over a mesh that SPANS PROCESSES (jax.distributed +
    gloo collectives) — round-3 VERDICT #4b; kernels run in Pallas
    interpret mode on CPU, the partitioning/collective layer is real."""
    script = tmp_path / "worker.py"
    script.write_text(WORKER.replace("__USE_PALLAS__", str(use_pallas)))
    port = _free_port()

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            PYTHONPATH=REPO,
            NERF_COORDINATOR=f"localhost:{port}",
            NERF_NUM_PROCESSES="2",
            NERF_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            )
        )
    results = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, (
            f"worker failed rc={p.returncode}\n{err.decode()[-2000:]}"
        )
        line = [l for l in out.decode().splitlines() if l.startswith("RESULT ")]
        assert line, f"no RESULT line:\n{out.decode()[-2000:]}"
        results.append(json.loads(line[-1][len("RESULT "):]))

    # both processes see identical (replicated) metrics
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"],
                               rtol=1e-6)
    np.testing.assert_allclose(results[0]["val_loss"], results[1]["val_loss"],
                               rtol=1e-6)

    # single-process reference over the SAME global batches: the global
    # batch is concat(shard0 slice, shard1 slice) in process order
    import jax

    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.data.pipeline import RayDataset, iterate_batches
    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    n = 128
    pixels = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.tile(np.array([0, 0, 4.0], np.float32), (n, 1))
    full = RayDataset(pixels, origins, dirs, 2.0, 6.0, 10.0, 8, 16)
    shards = [full.process_slice(i, 2) for i in range(2)]

    cfg = NeRFConfig(
        batch_size=32, ns_coarse=4, ns_fine=8, num_layers=2, hidden_dim=16,
        compute_dtype="float32", use_pallas=use_pallas,
    ).validate()
    trainer = Trainer(cfg, 2.0, 6.0,
                      mesh=make_mesh(1, 1, devices=jax.devices()[:1]))
    ref_losses = []
    for epoch in range(2):
        iters = [
            iterate_batches(s, 16, shuffle=True, seed=cfg.seed, epoch=epoch)
            for s in shards
        ]
        for halves in zip(*iters):
            batch = tuple(
                np.concatenate([h[j] for h in halves], axis=0)
                for j in range(3)
            )
            m = trainer.train_step(trainer.put_batch(batch))
            ref_losses.append(float(m["loss"]))

    np.testing.assert_allclose(results[0]["losses"], ref_losses, rtol=1e-5)

    # put_global_batch content correctness: the distributed eval over the
    # full-content val batch must equal the single-process eval
    val = (pixels[:32], origins[:32], dirs[:32])
    ev = trainer.eval_step(trainer.put_batch(val))
    np.testing.assert_allclose(
        results[0]["val_loss"], float(ev["loss"]), rtol=1e-5
    )


def test_partial_env_trio_raises(monkeypatch):
    """A partially-set NERF_* launch trio is a misconfiguration: silently
    proceeding single-host would have both processes train the full
    dataset and race on the run dir (round-3 review finding)."""
    import importlib

    import nerf_keras_tpu.parallel.distributed as dist

    monkeypatch.setenv("NERF_COORDINATOR", "127.0.0.1:9999")
    monkeypatch.setenv("NERF_NUM_PROCESSES", "2")
    monkeypatch.delenv("NERF_PROCESS_ID", raising=False)
    importlib.reload(dist)
    with pytest.raises(RuntimeError, match="NERF_PROCESS_ID"):
        dist.maybe_initialize()
