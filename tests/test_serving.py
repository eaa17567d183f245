"""Render server: endpoints over a real (tiny) trained checkpoint."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from nerf_keras_tpu.config import NeRFConfig
from nerf_keras_tpu.engine.trainer import Trainer
from nerf_keras_tpu.serving import RenderService, serve
from nerf_keras_tpu.utils.checkpoint import save_checkpoint


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    cfg = NeRFConfig(
        batch_size=64, ns_coarse=4, ns_fine=4, num_layers=2, hidden_dim=16,
        height=8, width=8, compute_dtype="float32",
    ).validate()
    tmp = tmp_path_factory.mktemp("srv")
    t = Trainer(cfg, 2.0, 6.0)
    ckpt = str(tmp / "model.ckpt.npz")
    save_checkpoint(ckpt, t.state, cfg)
    return RenderService(cfg, ckpt, 2.0, 6.0)


def test_render_service_direct(service):
    png = service.render_png(theta=30.0, phi=-30.0, radius=4.0,
                             height=8, width=8, chunk=64)
    assert png[:4] == b"\x89PNG"
    assert service.stats()["requests"] == 1


def test_render_depth_map(service):
    png = service.render_png(theta=30.0, phi=-30.0, radius=4.0,
                             height=8, width=8, chunk=64, map_name="depth")
    assert png[:4] == b"\x89PNG"
    with pytest.raises(ValueError, match="unknown map"):
        service.render_png(theta=0.0, phi=-30.0, radius=4.0,
                           height=8, width=8, chunk=64, map_name="acc")


def test_http_endpoints(service):
    server = serve(service, port=0)  # ephemeral port
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{port}"
        assert urllib.request.urlopen(f"{base}/healthz").read() == b"ok"
        png = urllib.request.urlopen(
            f"{base}/render?theta=10&height=8&width=8&chunk=64"
        ).read()
        assert png[:4] == b"\x89PNG"
        stats = json.loads(urllib.request.urlopen(f"{base}/stats").read())
        assert stats["requests"] >= 1
        # unknown path -> 404
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{base}/nope")
        assert e.value.code == 404
    finally:
        server.shutdown()


def test_render_service_quant(tmp_path):
    """--quant int8 serving: calibrates at startup, gates vs float, and
    serves PNG frames through the quantized path when the gate passes."""
    cfg = NeRFConfig(
        batch_size=64, ns_coarse=4, ns_fine=4, num_layers=2, hidden_dim=16,
        height=8, width=8, compute_dtype="float32",
    ).validate()
    t = Trainer(cfg, 2.0, 6.0)
    ckpt = str(tmp_path / "model.ckpt.npz")
    save_checkpoint(ckpt, t.state, cfg)
    svc = RenderService(cfg, ckpt, 2.0, 6.0, quant=True, quant_gate_db=0.0)
    assert svc.use_quant is True
    png = svc.render_png(theta=0.0, phi=-30.0, radius=4.0,
                         height=8, width=8, chunk=64)
    assert png[:4] == b"\x89PNG"
    assert svc.stats()["quant"] == "int8"

    svc_fb = RenderService(cfg, ckpt, 2.0, 6.0, quant=True,
                           quant_gate_db=200.0)
    assert svc_fb.use_quant is False
    assert svc_fb.stats()["quant"] == "none"


def test_render_service_proposal(tmp_path):
    """--sampler proposal serving: distills at startup, gates vs the
    coarse sampler, serves through the proposal path on pass and falls
    back on an impossible gate."""
    cfg = NeRFConfig(
        batch_size=64, ns_coarse=4, ns_fine=4, num_layers=2, hidden_dim=16,
        height=8, width=8, compute_dtype="float32",
    ).validate()
    t = Trainer(cfg, 2.0, 6.0)
    ckpt = str(tmp_path / "model.ckpt.npz")
    save_checkpoint(ckpt, t.state, cfg)
    svc = RenderService(cfg, ckpt, 2.0, 6.0, sampler="proposal",
                        sampler_gate_db=0.0, proposal_steps=40)
    assert svc.use_sampler == "proposal"
    png = svc.render_png(theta=0.0, phi=-30.0, radius=4.0,
                         height=8, width=8, chunk=64)
    assert png[:4] == b"\x89PNG"
    assert svc.stats()["sampler"] == "proposal"

    svc_fb = RenderService(cfg, ckpt, 2.0, 6.0, sampler="proposal",
                           sampler_gate_db=200.0, proposal_steps=40)
    assert svc_fb.use_sampler == "coarse"


def test_hot_reload_picks_up_newer_checkpoint(tmp_path):
    """POST /reload contract: a server pointed at a RUN DIR re-resolves
    the latest checkpoint, installs the new weights on the fast path
    (same wiring -> same compiled trainer), and re-renders with them."""
    cfg = NeRFConfig(
        batch_size=64, ns_coarse=4, ns_fine=4, num_layers=2, hidden_dim=16,
        height=8, width=8, compute_dtype="float32", learning_rate=0.01,
    ).validate()
    t = Trainer(cfg, 2.0, 6.0)
    save_checkpoint(str(tmp_path / "nerf_ep1.ckpt.npz"), t.state, cfg)
    svc = RenderService(cfg, str(tmp_path), 2.0, 6.0)
    assert svc.checkpoint.endswith("nerf_ep1.ckpt.npz")
    png_before = svc.render_png(theta=0.0, phi=-30.0, radius=4.0,
                                height=8, width=8, chunk=64)
    trainer_before = svc.trainer

    # "Training" writes a newer checkpoint with different weights.
    batch = (
        np.full((64, 3), 0.5, np.float32),
        np.tile(np.array([0, 0, 4.0], np.float32), (64, 1)),
        np.tile(np.array([0, 0, -1.0], np.float32), (64, 1)),
    )
    for _ in range(10):
        t.train_step(t.put_batch(batch))
    save_checkpoint(str(tmp_path / "nerf_ep2.ckpt.npz"), t.state, cfg)

    result = svc.reload()
    assert result["changed"] is True
    assert result["checkpoint"].endswith("nerf_ep2.ckpt.npz")
    assert svc.trainer is trainer_before  # fast path: compiled fns kept
    assert svc.stats()["reloads"] == 1
    png_after = svc.render_png(theta=0.0, phi=-30.0, radius=4.0,
                               height=8, width=8, chunk=64)
    assert png_after != png_before  # new weights actually serve

    # Reload with nothing new: idempotent, not an error.
    again = svc.reload()
    assert again["changed"] is False


def test_http_reload_endpoint(tmp_path):
    cfg = NeRFConfig(
        batch_size=64, ns_coarse=4, ns_fine=4, num_layers=2, hidden_dim=16,
        height=8, width=8, compute_dtype="float32",
    ).validate()
    t = Trainer(cfg, 2.0, 6.0)
    save_checkpoint(str(tmp_path / "nerf_ep1.ckpt.npz"), t.state, cfg)
    svc = RenderService(cfg, str(tmp_path), 2.0, 6.0)
    server = serve(svc, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        req = urllib.request.Request(f"{base}/reload", method="POST")
        out = json.loads(urllib.request.urlopen(req).read())
        assert out["changed"] is False
        assert out["sampler"] == "coarse"
        stats = json.loads(urllib.request.urlopen(f"{base}/stats").read())
        assert stats["reloads"] == 1
        # POST to an unknown path -> 404
        bad = urllib.request.Request(f"{base}/nope", method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad)
        assert e.value.code == 404
    finally:
        server.shutdown()
