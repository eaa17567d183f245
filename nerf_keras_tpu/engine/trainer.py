"""Trainer: owns state, mesh, and the jitted step functions.

The orchestration layer that replaces ``keras.Model.fit`` +
``TPUStrategy.scope()`` (reference train_lego.py:279-284,
train_tpu_lego.py:127-163).  Single-device and multi-chip are the same code
path: a 1-chip mesh degenerates to no collectives.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from nerf_keras_tpu.config import NeRFConfig
from nerf_keras_tpu.engine.step import (
    TrainState,
    init_train_state,
    make_eval_step,
    make_render_fn,
    make_train_step,
)
from nerf_keras_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    nerf_param_shardings,
    replicated_sharding,
    specs_to_shardings,
)


def _realize_means(acc: dict[str, list]) -> dict[str, float]:
    """Mean the per-step metric scalars and fetch them in ONE transfer.

    ``float(x)`` per metric costs a sequential device->host round trip
    each; stacking the means into one (K,) vector realizes the whole
    epoch's metrics in a single fetch (probe_e2e_gap.py leg E)."""
    keys = list(acc)
    vec = np.asarray(
        jnp.stack([jnp.mean(jnp.stack(acc[k])) for k in keys])
    )
    return {k: float(v) for k, v in zip(keys, vec)}


class Trainer:
    """Owns TrainState + compiled steps for one (config, dataset-bounds) run."""

    def __init__(
        self,
        cfg: NeRFConfig,
        near: float,
        far: float,
        mesh=None,
        seed: int | None = None,
    ):
        if cfg.use_pallas is None:
            # Auto: the fused kernel wins training on TPU; it has no
            # BatchNorm variant and shards rays over 'data' only.
            auto = (
                jax.default_backend() == "tpu"
                and not cfg.batch_norm
                and cfg.mesh_model == 1
            )
            cfg = dataclasses.replace(cfg, use_pallas=auto)
        if cfg.use_pallas and cfg.batch_norm:
            raise ValueError("use_pallas does not support the BatchNorm variant")
        if cfg.use_pallas and cfg.mesh_model > 1:
            raise ValueError(
                "use_pallas shards rays over 'data' only; tensor parallelism "
                "(mesh_model > 1) requires the jnp MLP path"
            )
        self.cfg = cfg
        # Online proposal-sampler training (config docstring): the state
        # carries {'proposal', 'fine'} instead of {'coarse', 'fine'} and
        # every render places samples with the in-state proposal net.
        self._online_proposal = cfg.train_sampler == "proposal"
        self.near = float(near)
        self.far = float(far)
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh_data, cfg.mesh_model)
        if cfg.batch_size % self.mesh.shape["data"] != 0:
            raise ValueError(
                f"batch_size={cfg.batch_size} must be divisible by the data "
                f"mesh axis ({self.mesh.shape['data']})"
            )

        seed = cfg.seed if seed is None else seed
        self.init_key, self.train_key = jax.random.split(jax.random.PRNGKey(seed))
        state = init_train_state(self.init_key, cfg)

        # --- sharding layout ---
        param_specs = nerf_param_shardings(self.mesh, state.params)
        self._param_shardings = specs_to_shardings(self.mesh, param_specs)
        repl = replicated_sharding(self.mesh)
        self._state_shardings = TrainState(
            params=self._param_shardings,
            bn=jax.tree_util.tree_map(lambda _: repl, state.bn),
            opt_state=jax.tree_util.tree_map(
                lambda _: repl, state.opt_state
            ),
            step=repl,
            # The EMA shadow mirrors the params, so it shards like them.
            ema=self._param_shardings if state.ema is not None else None,
        )
        self._batch_sharding = batch_sharding(self.mesh)
        self._repl = repl

        self.state: TrainState = jax.device_put(state, self._state_shardings)

        # --- compiled steps ---
        # Eval/render follow the resolved kernel choice: the fused forward
        # kernel measures 34.9 ms vs 53.1 ms for the XLA-path MLP alone at
        # 3.15M points on v5e (scripts/exp_fwd_kernels.py) — the XLA path
        # is HBM-bound on its (N, 256) layer activations.  (Round 1
        # concluded XLA wins forward-only from whole-frame timings
        # polluted by per-chunk dispatch; re-measured in round 2.)
        fwd_cfg = cfg
        data_in = (self._batch_sharding,) * 3
        self._train_step = jax.jit(
            make_train_step(cfg, self.near, self.far, mesh=self.mesh),
            in_shardings=(self._state_shardings, data_in, repl),
            out_shardings=(self._state_shardings, repl),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(
            make_eval_step(fwd_cfg, self.near, self.far, mesh=self.mesh),
            in_shardings=(self._state_shardings, data_in),
            out_shardings=repl,
        )
        self._render = jax.jit(
            make_render_fn(fwd_cfg, self.near, self.far, mesh=self.mesh),
            in_shardings=(self._state_shardings, self._batch_sharding, self._batch_sharding),
            out_shardings=repl,
        )
        self._fwd_cfg = fwd_cfg
        self._render_full_cache = None
        self._render_prop_w_cache = None
        self._render_q = None
        self._qparams = None
        self._render_p = None
        self._render_pq = None
        self._pparams = None
        self._prop_l_xyz = None

    # ------------------------------------------------------------------
    def put_batch(self, batch) -> tuple:
        """Place (images, origins, dirs) onto the mesh's data axis.

        Multi-host: each process passes its OWN per-host slice of the
        global batch (``global_batch_size // process_count`` rows — the
        input pipeline is sharded per host), and
        ``jax.make_array_from_process_local_data`` assembles the global
        array across hosts.  This is the jax-native replacement for
        TPUStrategy's automatic per-replica batch splitting
        (reference train_tpu_lego.py:72-82).
        """
        if jax.process_count() > 1:
            return tuple(
                jax.make_array_from_process_local_data(
                    self._batch_sharding, np.asarray(x)
                )
                for x in batch
            )
        return tuple(
            jax.device_put(np.asarray(x), self._batch_sharding) for x in batch
        )

    def put_global_batch(self, batch) -> tuple:
        """Place arrays whose FULL content every process holds (val
        batches, render chunks): each process contributes its contiguous
        row range.  Relies on ``make_mesh`` laying devices out process-
        major, so global row order equals input row order."""
        if jax.process_count() <= 1:
            return tuple(
                jax.device_put(np.asarray(x), self._batch_sharding)
                for x in batch
            )
        p, pc = jax.process_index(), jax.process_count()

        def put(x):
            x = np.asarray(x)
            n = x.shape[0]
            if n % pc != 0:
                raise ValueError(
                    f"global batch of {n} rows not divisible by "
                    f"process_count={pc}"
                )
            local = x[p * (n // pc) : (p + 1) * (n // pc)]
            return jax.make_array_from_process_local_data(
                self._batch_sharding, local
            )

        return tuple(put(x) for x in batch)

    def _invalidate_derived(self) -> None:
        """Drop weight-DERIVED inference state when the weights change.

        int8 scales are calibrated against, and the proposal net is
        distilled from, specific weights — carrying them across a
        restore/replace would silently serve stale accelerations for the
        new model.  Callers re-run quantize_for_inference /
        build_proposal_sampler after installing weights."""
        self._qparams = None
        self._render_q = None
        self._pparams = None
        self._render_p = None
        self._render_pq = None
        self._prop_l_xyz = None

    def restore(self, path: str) -> "Trainer":
        """Load a checkpoint into this trainer with the correct shardings.

        The one place owning the restore invariant (device_get template ->
        load -> device_put with the state shardings); CLI resume, the
        inference loader and the serving layer all go through it.
        """
        from nerf_keras_tpu.utils.checkpoint import load_checkpoint

        self.state = jax.device_put(
            load_checkpoint(path, jax.device_get(self.state)),
            self._state_shardings,
        )
        self._invalidate_derived()
        return self

    def replace_params(self, params, bn=None) -> "Trainer":
        """Install externally-built params (e.g. imported reference
        weights) with the correct shardings.  With EMA enabled the shadow
        resets to the new params — averaging across unrelated weights
        would serve a nonsense model."""
        ema = self.state.ema
        if ema is not None:
            ema = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), params
            )
        self.state = jax.device_put(
            self.state._replace(params=params, bn=bn, ema=ema),
            self._state_shardings,
        )
        self._invalidate_derived()
        return self

    def _eval_state(self) -> TrainState:
        """The state every eval/render/serving path consumes: with
        EMA_DECAY set, the params slot carries the EMA shadow (same pytree
        structure, so the compiled steps and shardings are unchanged);
        otherwise the raw training state."""
        if self.state.ema is None:
            return self.state
        return self.state._replace(params=self.state.ema)

    @property
    def eval_params(self) -> dict:
        """Params used for eval/render/derived artifacts (EMA if enabled)."""
        return self._eval_state().params

    def _folded_eval_params(self) -> dict:
        """Eval params with the frequency-anneal window folded in
        (ops/freq_anneal.py) — what the compiled eval/render paths
        actually consume.  Derived inference artifacts (int8 tables,
        distilled proposal) must bake from THESE weights: mid-anneal,
        masked octave rows hold random init values the live paths never
        see.  Identity past the horizon (and when the knob is off)."""
        params = self.eval_params
        if self.cfg.freq_anneal_steps > 0:
            from nerf_keras_tpu.ops.freq_anneal import fold_train_params

            params = fold_train_params(self.cfg, params, self.state.step)
        return params

    def train_step(self, batch, key: jax.Array | None = None):
        """One optimization step; returns metrics dict of scalars (device)."""
        key = self.train_key if key is None else key
        self.state, metrics = self._train_step(self.state, batch, key)
        if self._qparams is not None or self._pparams is not None:
            # Weight-derived inference state (int8 scales, proposal net)
            # is a snapshot of the weights it was built from.
            self._invalidate_derived()
        return metrics

    def eval_step(self, batch):
        return self._eval_step(self._eval_state(), batch)

    def train_epoch(
        self,
        batches: Iterable,
        key: jax.Array | None = None,
        log_every: int = 0,
    ) -> dict:
        """Run all batches; returns epoch-mean metrics as python floats
        (the reference's keras.metrics.Mean trackers, models.py:84-86).

        ``log_every > 0`` prints per-step metrics every N steps — opt-in
        because each print forces a device sync (LOG_EVERY config key).
        """
        # Accumulate LAZILY and fetch ONCE: per-metric float() conversions
        # at epoch end each cost a sequential device->host round trip
        # through the tunnel (the whole E-vs-B gap in
        # scripts/probe_e2e_gap.py — the per-step async adds themselves
        # overlap with step compute for free).  Append the async scalars,
        # reduce to one (K,) vector, and realize it in a single fetch.
        acc: dict[str, list] = {}
        count = 0
        for batch in batches:
            metrics = self.train_step(self.put_batch(batch), key)
            for k, v in metrics.items():
                acc.setdefault(k, []).append(v)
            count += 1
            if log_every and count % log_every == 0:
                print(
                    f"  step {int(self.state.step)}: "
                    f"loss={float(metrics['loss']):.5f} "
                    f"loss_coarse={float(metrics['loss_coarse']):.5f} "
                    f"psnr={float(metrics['psnr']):.2f}"
                )
        return _realize_means(acc)

    def evaluate(self, batches: Iterable) -> dict:
        """Mean metrics over val batches.  Batches carry full (unsharded)
        content — the val pipeline is identical on every host."""
        acc: dict[str, list] = {}
        for batch in batches:
            metrics = self.eval_step(self.put_global_batch(batch))
            for k, v in metrics.items():
                acc.setdefault(k, []).append(v)
        return _realize_means(acc)

    # ------------------------------------------------------------------
    @staticmethod
    @jax.jit
    def _rgb_to_u8(rgb):
        """[0,1] f32 -> uint8 on device, matching the host-side
        utils/image.to_uint8 exactly (clip*255 then truncating cast —
        the reference's conversion, inference.py:260)."""
        return jnp.clip(255.0 * rgb, 0.0, 255.0).astype(jnp.uint8)

    def _render_full(self):
        """Lazily compile the full-output render (adds compositing weights
        and raw MLP predictions — the reference's 8-tensor return,
        models.py:216-223).  Separate compilation so the common rgb/depth
        path never materializes the (B, S[, 4]) extras."""
        if self._render_full_cache is None:
            self._render_full_cache = jax.jit(
                make_render_fn(
                    self._fwd_cfg, self.near, self.far, mesh=self.mesh,
                    full=True,
                ),
                in_shardings=(
                    self._state_shardings,
                    self._batch_sharding,
                    self._batch_sharding,
                ),
                out_shardings=self._repl,
            )
        return self._render_full_cache

    def _render_online_weights(self):
        """Lazily compile the online-proposal render that also emits the
        fine compositing weights + their sample positions
        (``weights_fine``/``t_fine``).  Separate compilation for the same
        reason as :meth:`_render_full`: the (B, S) maps are HBM writes +
        host fetches the common rgb/depth path shouldn't pay."""
        if self._render_prop_w_cache is None:
            from nerf_keras_tpu.engine.step import (
                _wrap_state_fold,
                make_proposal_render_fn,
            )

            cfg = self._fwd_cfg
            inner = make_proposal_render_fn(
                cfg, self.near, self.far, mesh=self.mesh,
                prop_l_xyz=cfg.prop_l_xyz, union=cfg.prop_union,
                want_weights=True, levels=cfg.prop_levels,
                prop_samples=cfg.prop_samples,
            )
            self._render_prop_w_cache = jax.jit(
                _wrap_state_fold(cfg, lambda state, o, d: inner(
                    state.params["proposal"], state.params["fine"], o, d
                )),
                in_shardings=(
                    self._state_shardings,
                    self._batch_sharding,
                    self._batch_sharding,
                ),
                out_shardings=self._repl,
            )
        return self._render_prop_w_cache

    def quantize_for_inference(
        self,
        origins: np.ndarray,
        directions: np.ndarray,
        calib_rays: int = 2048,
        seed: int = 0,
    ) -> "Trainer":
        """Calibrate + compile the int8 render path (beyond-reference:
        the reference's inference is f32 keras, inference.py:180-268).

        ``origins``/``directions``: representative rays (e.g. from a
        render pose via :meth:`pose_rays`) — activation scales are
        calibrated along them; a few thousand suffice.  Subsequent
        ``render_rays(..., quant=True)`` / ``render_image(...,
        quant=True)`` run both MLP passes int8 on the MXU (~2x bf16 peak
        rate on v5e).  Verify accuracy with a PSNR gate before serving —
        ``cli/infer.py --quant int8`` does this automatically.
        """
        from nerf_keras_tpu.ops.quant import (
            calibrate_render,
            calibrate_render_proposal,
            quantize_render_params,
        )

        if self.cfg.batch_norm:
            raise ValueError(
                "int8 inference has no BatchNorm variant; use the float "
                "path for BN configs"
            )
        origins = np.asarray(origins, np.float32).reshape(-1, 3)
        directions = np.asarray(directions, np.float32).reshape(-1, 3)
        if origins.shape[0] > calib_rays:
            idx = np.random.default_rng(seed).choice(
                origins.shape[0], calib_rays, replace=False
            )
            origins, directions = origins[idx], directions[idx]
        params = jax.device_get(self._folded_eval_params())
        if self._online_proposal:
            # No coarse MLP exists: calibrate the fine net at the t-unions
            # the float in-state proposal places (the proposal net itself
            # stays float — its matmuls are ~60x smaller than the fine's).
            stats = calibrate_render_proposal(
                params, self.cfg, self.near, self.far, origins, directions
            )
        else:
            stats = calibrate_render(
                params, self.cfg, self.near, self.far, origins, directions
            )
        qparams = quantize_render_params(params, stats, self.cfg.skip_layer)
        self._install_quant(qparams)
        return self

    def _install_quant(self, qparams) -> None:
        """Put quantized params on device and jit the int8 render."""
        from nerf_keras_tpu.engine.step import (
            make_proposal_render_fn,
            make_quant_render_fn,
        )

        self._qparams = jax.device_put(qparams, self._repl)
        if self._online_proposal:
            # int8 fine pass under the in-state (float) proposal sampler:
            # same compiled shape as the distilled proposal+quant path.
            inner = jax.jit(
                make_proposal_render_fn(
                    self._fwd_cfg, self.near, self.far, mesh=self.mesh,
                    quant=True, prop_l_xyz=self.cfg.prop_l_xyz,
                    union=self.cfg.prop_union, levels=self.cfg.prop_levels,
                    prop_samples=self.cfg.prop_samples,
                ),
                in_shardings=(
                    self._state_shardings.params["proposal"], self._repl,
                    self._batch_sharding, self._batch_sharding,
                ),
                out_shardings=self._repl,
            )

            cfg = self.cfg

            def render_q(state, o, d):
                pp = state.params["proposal"]
                if cfg.freq_anneal_steps > 0:
                    # The baked int8 fine tables already carry the fold
                    # (quantize_for_inference bakes folded weights); the
                    # LIVE float proposal net needs the current window.
                    from nerf_keras_tpu.ops.freq_anneal import (
                        anneal_alpha,
                        fold_proposal_params,
                        freq_window,
                    )

                    pp = fold_proposal_params(pp, freq_window(
                        cfg.prop_l_xyz,
                        anneal_alpha(state.step, cfg.freq_anneal_steps),
                    ))
                return inner(pp, self._qparams["fine"], o, d)

            self._render_q = render_q
            return
        self._render_q = jax.jit(
            make_quant_render_fn(
                self._fwd_cfg, self.near, self.far, mesh=self.mesh
            ),
            in_shardings=(
                self._repl, self._batch_sharding, self._batch_sharding
            ),
            out_shardings=self._repl,
        )

    def build_proposal_sampler(
        self,
        origins: np.ndarray,
        directions: np.ndarray,
        *,
        calib_rays: int = 65536,
        steps: int = 1500,
        batch: int = 16384,
        hidden: int = 64,
        depth: int = 3,
        l_xyz: int = 4,
        lr: float = 2e-3,
        under_weight: float = 4.0,
        seed: int = 0,
    ) -> "Trainer":
        """Distill the trained fine model's density into a tiny proposal
        net and compile the proposal-sampled render (beyond-reference;
        design rationale in ops/proposal.py: the coarse pass exists at
        inference only to place fine samples, and a ~60x-cheaper MXU
        matmul chain places them from the fine model's own field).

        ``origins``/``directions``: representative rays — pass rays from
        SEVERAL poses covering the render trajectory (e.g. a few orbit
        frames via :meth:`pose_rays`); a frustum the proposal never saw
        is a frustum it can only extrapolate into.  Subsequent
        ``render_rays(..., sampler="proposal")`` / ``render_image(...,
        sampler="proposal")`` skip the coarse MLP entirely; combine with
        ``quant=True`` (after :meth:`quantize_for_inference`) to stack
        the int8 fine kernel on top.  Verify with a PSNR gate before
        serving — ``cli/infer.py --sampler proposal`` does this
        automatically.
        """
        from nerf_keras_tpu.models.mlp import apply_nerf_sigma
        from nerf_keras_tpu.ops.encoding import encode_position
        from nerf_keras_tpu.ops.proposal import distill_proposal

        if self._online_proposal:
            raise ValueError(
                "TRAIN_SAMPLER='proposal' checkpoints already carry their "
                "proposal net in the train state — every render uses it; "
                "post-training distillation is only for coarse-trained "
                "models"
            )
        if self.cfg.batch_norm:
            raise ValueError(
                "the proposal sampler has no BatchNorm variant; use the "
                "coarse sampler for BN configs"
            )
        if self.cfg.ns_fine <= 0:
            raise ValueError(
                "the proposal sampler places fine samples; ns_fine must "
                "be positive"
            )
        origins = np.asarray(origins, np.float32).reshape(-1, 3)
        directions = np.asarray(directions, np.float32).reshape(-1, 3)
        if origins.shape[0] > calib_rays:
            idx = np.random.default_rng(seed).choice(
                origins.shape[0], calib_rays, replace=False
            )
            origins, directions = origins[idx], directions[idx]

        # Host copy of the fine params: the distillation jit must not
        # capture mesh-committed arrays (single-device scan).
        params = jax.device_get(self._folded_eval_params())
        cdt = (
            jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16"
            else jnp.float32
        )

        def sigma_fn(pts):
            x_enc = encode_position(pts, self.cfg.l_xyz).astype(cdt)
            return apply_nerf_sigma(
                params["fine"], x_enc, compute_dtype=cdt,
                skip_layer=self.cfg.skip_layer,
            )

        pparams, final_loss = distill_proposal(
            jax.random.PRNGKey(seed), sigma_fn, origins, directions,
            self.near, self.far, l_xyz=l_xyz, hidden=hidden, depth=depth,
            steps=steps, batch=batch, lr=lr, under_weight=under_weight,
        )
        self._distill_loss = final_loss
        self._install_proposal(pparams, l_xyz)
        return self

    def _install_proposal(self, pparams, l_xyz: int) -> None:
        """Put proposal params on device and jit the proposal render."""
        from nerf_keras_tpu.engine.step import make_proposal_render_fn

        self._pparams = jax.device_put(pparams, self._repl)
        self._prop_l_xyz = l_xyz
        self._render_pq = None  # quant variant re-jits lazily
        self._render_p = jax.jit(
            make_proposal_render_fn(
                self._fwd_cfg, self.near, self.far, mesh=self.mesh,
                quant=False, prop_l_xyz=l_xyz,
            ),
            in_shardings=(
                self._repl, self._state_shardings.params["fine"],
                self._batch_sharding, self._batch_sharding,
            ),
            out_shardings=self._repl,
        )

    @property
    def quant_ready(self) -> bool:
        """True if the int8 render path is calibrated for CURRENT weights."""
        return self._qparams is not None

    @property
    def online_proposal(self) -> bool:
        """True for TRAIN_SAMPLER='proposal' models: the proposal net
        lives in the train state and every render path uses it."""
        return self._online_proposal

    @property
    def proposal_ready(self) -> bool:
        """True if proposal-sampled rendering is available: always for
        proposal-TRAINED models (the net lives in the train state), else
        once a net is distilled from the CURRENT weights."""
        return self._online_proposal or self._pparams is not None

    def infer_digest(self) -> str:
        """Digest of the weights + the config fields the derived
        inference artifacts (int8 tables, proposal net) are functions of;
        keys the on-disk artifact cache (utils/infer_cache.py)."""
        from nerf_keras_tpu.utils.infer_cache import params_digest

        return params_digest(
            # Folded view: the artifacts are functions of the WINDOWED
            # weights, so a mid-anneal cache entry must not match the
            # same raw weights at a different step.
            jax.device_get(self._folded_eval_params()),
            extra={
                "skip_layer": self.cfg.skip_layer,
                "l_xyz": self.cfg.l_xyz,
                "l_dir": self.cfg.l_dir,
                "compute_dtype": self.cfg.compute_dtype,
            },
        )

    def save_inference_artifacts(self, path: str) -> "Trainer":
        """Persist whatever int8/proposal state is built, keyed to the
        current weights, so a later process (e.g. a restarted server)
        skips the ~20 s rebuild via :meth:`load_inference_artifacts`."""
        from nerf_keras_tpu.utils.infer_cache import save_artifacts

        if self._qparams is None and self._pparams is None:
            raise RuntimeError(
                "nothing to save: run quantize_for_inference and/or "
                "build_proposal_sampler first"
            )
        save_artifacts(
            path,
            self.infer_digest(),
            pparams=(
                jax.device_get(self._pparams)
                if self._pparams is not None else None
            ),
            prop_l_xyz=self._prop_l_xyz,
            distill_loss=getattr(self, "_distill_loss", None),
            qparams=(
                jax.device_get(self._qparams)
                if self._qparams is not None else None
            ),
        )
        return self

    def load_inference_artifacts(self, path: str) -> "Trainer":
        """Install artifacts written by :meth:`save_inference_artifacts`.

        Raises :class:`~nerf_keras_tpu.utils.infer_cache.StaleArtifactsError`
        if they were derived from different weights or config — a stale
        acceleration is never silently installed (the cross-process twin
        of :meth:`_invalidate_derived`)."""
        from nerf_keras_tpu.utils.infer_cache import load_artifacts

        if self.cfg.batch_norm:
            raise ValueError(
                "inference artifacts have no BatchNorm variant; use the "
                "float coarse path for BN configs"
            )
        art = load_artifacts(path, self.infer_digest())
        if "qparams" in art:
            self._install_quant(art["qparams"])
        if "pparams" in art:
            if self.cfg.ns_fine <= 0:
                raise ValueError(
                    "the proposal sampler places fine samples; ns_fine "
                    "must be positive"
                )
            self._distill_loss = art.get("distill_loss")
            self._install_proposal(art["pparams"], art["prop_l_xyz"])
        return self

    def _proposal_render_fn(self, quant: bool):
        """Resolve the compiled proposal render for render_rays."""
        from nerf_keras_tpu.engine.step import make_proposal_render_fn

        if self._pparams is None:
            raise RuntimeError(
                "call build_proposal_sampler(...) before rendering with "
                "sampler='proposal'"
            )
        pparams = self._pparams
        if not quant:
            fine = self._folded_eval_params()["fine"]
            return lambda state, o, d: self._render_p(pparams, fine, o, d)
        if self._qparams is None:
            raise RuntimeError(
                "call quantize_for_inference(...) before rendering with "
                "sampler='proposal' and quant=True"
            )
        if self._render_pq is None:
            self._render_pq = jax.jit(
                make_proposal_render_fn(
                    self._fwd_cfg, self.near, self.far, mesh=self.mesh,
                    quant=True, prop_l_xyz=self._prop_l_xyz,
                ),
                in_shardings=(
                    self._repl, self._repl,
                    self._batch_sharding, self._batch_sharding,
                ),
                out_shardings=self._repl,
            )
        qfine = self._qparams["fine"]
        return lambda state, o, d: self._render_pq(pparams, qfine, o, d)

    def render_rays(
        self,
        origins: np.ndarray,
        directions: np.ndarray,
        chunk: int = 16384,
        keys: tuple[str, ...] | None = None,
        full: bool = False,
        staged: bool = False,
        quant: bool = False,
        sampler: str = "coarse",
        uint8_rgb: bool = False,
    ) -> dict:
        """Render a flat ray batch, chunked to bound memory.

        TPU-native redo of ``forward_pass_with_minibatch`` (reference
        models.py:178-225): a host loop over fixed-size chunks hitting one
        compiled render function (single compilation, no tf.data, last
        chunk padded to keep shapes static).

        ``keys`` restricts which outputs are kept and fetched (e.g.
        ``("rgb_fine", "depth_fine")``) — on tunneled backends the final
        host fetch is a real cost, ~10 MB per million rays per map.
        ``full=True`` (or requesting a ``weights_*``/``preds_*`` key) also
        returns compositing weights and raw MLP predictions per ray.
        ``quant=True`` renders through the calibrated int8 path
        (:meth:`quantize_for_inference` must have run; rgb/depth only).
        ``sampler="proposal"`` places fine samples with the distilled
        proposal net instead of the coarse MLP
        (:meth:`build_proposal_sampler` must have run; fine outputs only,
        composable with ``quant=True``).
        ``uint8_rgb=True`` converts rgb maps to uint8 ON DEVICE (the
        reference's ``clip*255`` display conversion, inference.py:260)
        before the host copy — a 4x smaller fetch payload, which is the
        dominant residual term of the tunneled end-of-frame transfer
        (docs/PERF.md round-4).  Bit-identical to converting the f32
        fetch on the host; video/serving consumers want uint8 anyway.

        Online-proposal checkpoints (``TRAIN_SAMPLER='proposal'``) have no
        coarse pass: they render fine rgb/depth, plus the fine compositing
        weights and their sample positions via
        ``keys=("weights_fine", "t_fine", ...)`` (float path only); the
        reference 8-tensor ``full=True`` contract and coarse/``preds_*``
        maps don't exist for them.
        """
        requested = set(keys or ())
        extended = any(
            k.startswith(("weights_", "preds_")) or k == "t_fine"
            for k in requested
        )
        if sampler not in ("coarse", "proposal"):
            raise ValueError(
                f"sampler must be 'coarse' or 'proposal', got {sampler!r}"
            )
        if self._online_proposal:
            # Proposal-trained model: EVERY render places samples with the
            # in-state proposal net — the default path already is the
            # proposal render, so sampler='proposal' is a no-op alias and
            # coarse outputs don't exist.
            banned = [
                k for k in requested
                if k.endswith("_coarse") or k.startswith("preds_")
            ]
            if full or banned:
                raise ValueError(
                    "TRAIN_SAMPLER='proposal' checkpoints have no coarse "
                    "pass: fine rgb/depth (plus compositing weights via "
                    "keys=('weights_fine', 't_fine', ...)) are the only "
                    "outputs — the 8-tensor full=True contract and "
                    "coarse/preds maps don't exist"
                )
            want_weights = bool(requested & {"weights_fine", "t_fine"})
            if quant:
                if want_weights:
                    raise ValueError(
                        "weights_fine/t_fine are unavailable on the int8 "
                        "render path (request them without quant=True)"
                    )
                if self._render_q is None:
                    raise RuntimeError(
                        "call quantize_for_inference(...) before rendering "
                        "with quant=True"
                    )
                render_fn = self._render_q
            elif want_weights:
                render_fn = self._render_online_weights()
            else:
                render_fn = self._render
        elif sampler == "proposal":
            if full or extended:
                raise ValueError(
                    "sampler='proposal' renders rgb/depth fine only (no "
                    "coarse pass; weights/preds maps are not wired for the "
                    "distilled sampler)"
                )
            if any(k.endswith("_coarse") for k in requested):
                raise ValueError(
                    "sampler='proposal' has no coarse outputs (the coarse "
                    "MLP pass is replaced by the proposal net)"
                )
            render_fn = self._proposal_render_fn(quant)
        elif quant:
            if full or extended:
                raise ValueError(
                    "quant=True supports rgb/depth outputs only (the int8 "
                    "kernel does not emit weights/raw preds)"
                )
            if self._render_q is None:
                raise RuntimeError(
                    "call quantize_for_inference(...) before rendering "
                    "with quant=True"
                )
            qparams = self._qparams
            render_fn = lambda state, o, d: self._render_q(qparams, o, d)
        else:
            render_fn = (
                self._render_full() if (full or extended) else self._render
            )
        n = origins.shape[0]
        # put_global_batch needs the chunk divisible by process_count as
        # well as the data mesh axis (a multi-host model-parallel mesh can
        # have process_count not dividing the data axis) — same lcm rule
        # as resolve_eval_batch.
        ds = math.lcm(self.mesh.shape["data"], jax.process_count())
        chunk = min(chunk, max(n, 1))
        chunk = ((chunk + ds - 1) // ds) * ds
        num_chunks = (n + chunk - 1) // chunk
        total_pad = num_chunks * chunk - n
        if total_pad:
            # Padded rays: dummy forward-facing dirs so the math stays
            # finite; their outputs are sliced off per chunk below.
            origins = np.concatenate(
                [origins, np.zeros((total_pad, 3), origins.dtype)], axis=0
            )
            directions = np.concatenate([directions, np.concatenate(
                [np.zeros((total_pad, 2), directions.dtype),
                 -np.ones((total_pad, 1), directions.dtype)], axis=1
            )], axis=0)

        # ``staged=True`` uploads ALL rays in ONE host->device transfer as
        # (num_chunks, chunk, 3) with the chunk axis sharded over 'data'
        # and slices per chunk on device.  Measured SLOWER than per-chunk
        # puts in a same-process A/B (2.33-2.42 s vs 2.21 s per 800x800
        # frame, scripts/exp_frame_ab.py): the puts already overlap
        # compute via async dispatch, while the device-side slice adds a
        # gather to the critical path.  Kept off by default; the flag
        # remains for hosts where upload bandwidth dominates.
        staged_arrs = None
        if staged and jax.process_count() == 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(self.mesh, P(None, "data"))
            staged_arrs = tuple(
                jax.device_put(
                    np.ascontiguousarray(
                        a.reshape(num_chunks, chunk, 3)
                    ),
                    sharding,
                )
                for a in (origins, directions)
            )

        outs: dict[str, list] = {}
        for idx, start in enumerate(range(0, n, chunk)):
            pad = max(0, start + chunk - n)
            if staged_arrs is not None:
                o_dev, d_dev = staged_arrs[0][idx], staged_arrs[1][idx]
            else:
                o_dev, d_dev = self.put_global_batch(
                    (origins[start:start + chunk],
                     directions[start:start + chunk])
                )
            res = render_fn(self._eval_state(), o_dev, d_dev)
            # Keep chunk outputs on device and START their device->host
            # transfer asynchronously: the copies overlap the remaining
            # chunks' compute, so the end-of-frame fetch — ~0.3-0.5 s of
            # serial tunnel time for an 800x800 frame — mostly vanishes.
            # (A blocking per-chunk fetch would instead serialize a full
            # round-trip per chunk.)
            for k, v in res.items():
                if keys is not None and k not in keys:
                    continue
                part = v[: chunk - pad] if pad else v
                if uint8_rgb and k.startswith("rgb"):
                    # Tiny jitted elementwise kernel per chunk (dispatch
                    # overlaps the pipeline like the copies do); avoids
                    # recompiling any render program for the u8 variant.
                    part = self._rgb_to_u8(part)
                try:
                    part.copy_to_host_async()
                except (AttributeError, RuntimeError):
                    pass  # backend without async host copies
                outs.setdefault(k, []).append(part)
        return {
            k: np.concatenate(jax.device_get(v), axis=0) for k, v in outs.items()
        }

    def pose_rays(
        self, pose: np.ndarray, height: int, width: int, focal: float
    ) -> tuple[np.ndarray, np.ndarray]:
        """Flat ``(H*W, 3)`` rays for a camera pose, in the space the
        renderer expects (NDC when ``cfg.ndc``).  Shared by
        :meth:`render_image` and int8 calibration
        (:meth:`quantize_for_inference`)."""
        from nerf_keras_tpu.ops.rays import NDC_NEAR_PLANE, get_rays, ndc_rays

        origins, dirs = get_rays(height, width, focal, pose)
        if self.cfg.ndc:
            # NDC-trained models (NeRFConfig.ndc) expect NDC-space rays.
            # NDC is only defined for forward-facing rays (d_z < 0): a
            # sideways/backward pose (e.g. a Blender-style orbit sweep)
            # would divide by ~0 and render silent NaN frames — fail
            # loudly instead and point at the forward-facing path.
            dz = np.asarray(dirs)[..., 2]
            if not (dz < 0).all():
                raise ValueError(
                    "NDC rendering requires a forward-facing camera "
                    f"(all ray d_z < 0; got max d_z = {dz.max():.4f}). "
                    "Use the capture-implied path (inference.py --path "
                    "spiral) for NDC-trained checkpoints."
                )
            origins, dirs = ndc_rays(
                height, width, focal, NDC_NEAR_PLANE, origins, dirs
            )
        return (
            np.asarray(origins).reshape(-1, 3),
            np.asarray(dirs).reshape(-1, 3),
        )

    def render_image(
        self, pose: np.ndarray, height: int, width: int, focal: float,
        chunk: int = 16384, include_coarse: bool = False,
        quant: bool = False, sampler: str = "coarse",
        uint8_rgb: bool = False, need_depth: bool = True,
    ) -> dict:
        """Render one full frame from a camera pose; returns HxW maps.

        Strategy (measured, scripts/exp_frame.py on v5e): a host loop over
        the jitted chunk render with per-chunk outputs left ON DEVICE and
        one final fetch.  Dispatches pipeline on the tunnel, so the host
        round-trip per chunk is hidden; a single-dispatch
        ``lax.map``-over-chunks variant measured ~30% SLOWER (3.40 s vs
        2.58 s per 800x800 frame) and was removed.

        ``quant=True``: both MLP passes run the calibrated int8 kernel
        (requires :meth:`quantize_for_inference`).
        ``sampler="proposal"``: fine samples placed by the distilled
        proposal net (requires :meth:`build_proposal_sampler`; no coarse
        outputs — composes with ``quant``).
        ``uint8_rgb=True``: rgb maps come back uint8, converted on
        device before the fetch (4x smaller payload — see
        :meth:`render_rays`); ``need_depth=False`` skips the depth
        fetch entirely (video/serving frames that only consume rgb).
        """
        if include_coarse and (sampler == "proposal" or self._online_proposal):
            raise ValueError(
                "no coarse outputs: the proposal sampler replaces the "
                "coarse pass"
            )
        origins, dirs = self.pose_rays(pose, height, width, focal)

        if include_coarse:
            keys = None
        elif need_depth:
            keys = ("rgb_fine", "depth_fine")
        else:
            keys = ("rgb_fine",)
        out = self.render_rays(
            origins, dirs, chunk=chunk, keys=keys, quant=quant,
            sampler=sampler, uint8_rgb=uint8_rgb,
        )
        result = {"rgb": out["rgb_fine"].reshape(height, width, 3)}
        if "depth_fine" in out:
            result["depth"] = out["depth_fine"].reshape(height, width)
        if include_coarse:
            result["rgb_coarse"] = out["rgb_coarse"].reshape(height, width, 3)
            result["depth_coarse"] = out["depth_coarse"].reshape(height, width)
        return result
