import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Serve the headline chain checkpoint (round-4 chain-u6464 200-epoch
best retention copy) end-to-end on the real chip : val-view
PSNR through the render path, float vs int8-stacked frame times in the
serving configuration."""
import json, time
import numpy as np
from nerf_keras_tpu.config import load_config  # noqa
from nerf_keras_tpu.engine.trainer import Trainer
from nerf_keras_tpu.data.synthetic import prepare_synthetic_data
from nerf_keras_tpu.ops.rays import pose_spherical
from nerf_keras_tpu.utils.checkpoint import (
    load_checkpoint_config, load_checkpoint_scene, resolve_checkpoint,
    resolve_infer_config,
)

run = "/tmp/run_q_chainu6464_s42"
ckpt = resolve_checkpoint(run)
cfg = load_checkpoint_config(ckpt)
cfg, notes = resolve_infer_config(cfg, ckpt)
scene = load_checkpoint_scene(ckpt)
print("ckpt:", ckpt, "notes:", notes)
train, val, (near, far), focal = prepare_synthetic_data(cfg.height, cfg.width)
tr = Trainer(cfg, near, far).restore(ckpt)

n_px = cfg.height * cfg.width
v_img = val.pixels[:n_px].reshape(cfg.height, cfg.width, 3)
out = tr.render_rays(val.origins[:n_px], val.directions[:n_px], chunk=16384)
rgb = out["rgb_fine"].reshape(v_img.shape)
def psnr(a, b):
    m = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return -10.0 * np.log10(m)
p_float = psnr(rgb, v_img)
print("val-view PSNR (float render path):", round(p_float, 2))

pose = pose_spherical(30.0, -30.0, 4.0)
h = w = 800
fr_focal = focal * h / cfg.height
calib = [tr.pose_rays(pose_spherical(t, -30.0, 4.0), cfg.height, cfg.width, focal)
         for t in range(0, 360, 45)]
c_o = np.concatenate([c[0] for c in calib]); c_d = np.concatenate([c[1] for c in calib])
tr.quantize_for_inference(c_o, c_d)
outq = tr.render_rays(val.origins[:n_px], val.directions[:n_px], chunk=16384, quant=True)
p_q = psnr(outq["rgb_fine"].reshape(v_img.shape), v_img)
p_cross = psnr(outq["rgb_fine"].reshape(v_img.shape), rgb)
print("val-view PSNR int8:", round(p_q, 2), "cross:", round(p_cross, 2))

times = {"float_u8": [], "int8_u8": []}
kw = dict(chunk=16384, uint8_rgb=True, need_depth=False)
tr.render_image(pose, h, w, fr_focal, **kw)
tr.render_image(pose, h, w, fr_focal, quant=True, **kw)
for _ in range(3):
    t0 = time.perf_counter(); tr.render_image(pose, h, w, fr_focal, **kw)
    times["float_u8"].append(round(time.perf_counter() - t0, 3))
    t0 = time.perf_counter(); tr.render_image(pose, h, w, fr_focal, quant=True, **kw)
    times["int8_u8"].append(round(time.perf_counter() - t0, 3))
rec = {
    "checkpoint": ckpt, "notes": notes,
    "val_psnr_float": round(p_float, 2), "val_psnr_int8": round(p_q, 2),
    "int8_vs_float_db": round(p_cross, 2),
    "frame_s": {k: min(v) for k, v in times.items()}, "frame_times": times,
    "config": {"train_sampler": cfg.train_sampler, "prop_levels": cfg.prop_levels,
               "ns": f"{cfg.ns_coarse}+{cfg.ns_fine}", "prop_union": cfg.prop_union},
}
print(json.dumps(rec))
json.dump(rec, open("/tmp/chain_serving_check.json", "w"), indent=1)
