"""Training Coach — the full E4S GAN training loop, TPU-native.

Parity target: src/training/coach.py (574 LoC). Structural translation:

- DDP/NCCL process-per-GPU -> one process driving a ``jax.sharding.Mesh``;
  the batch axis is sharded over the ``data`` axis and XLA inserts gradient
  all-reduces over ICI (ref: coach.py:37-85 becomes e4s_tpu.parallel.mesh).
- requires_grad juggling (ref: coach.py:325-338, networks.py:69-82) -> a
  static gradient mask (``trainable_mask``) applied to G-step grads.
- torch.optim.Adam / Ranger -> optax chains with the x0.1-at-100k schedule
  (ref: coach.py:390-392) folded into the schedule.
- EMA accumulate(0.9977...) (ref: coach.py:29, 394-398) -> a tree_map inside
  the jitted G step (no separate pass over the weights).
- D update every ``d_every`` steps + optional lazy R1 (ref: coach.py:290-321).
- torch.save checkpoints -> orbax (ref: coach.py:493-517).

Everything device-side is contained in two jitted steps (G and D), so a
training step is exactly two XLA executions regardless of loss count.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import time
from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from e4s_tpu.criteria import (
    FaceParsingLoss,
    IDLoss,
    StyleLoss,
    adv_d_loss,
    adv_g_loss,
    w_norm_loss,
)
from e4s_tpu.models.lpips_nets import LPIPS
from e4s_tpu.models.net3 import Net3
from e4s_tpu.models.stylegan2 import Discriminator
from e4s_tpu.ops.resize import adaptive_avg_pool2d
from e4s_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from e4s_tpu.training.ranger import ranger
from e4s_tpu.utils.img_utils import aggregate_loss_dict, label_map_to_onehot

ACCUM = 0.5 ** (32 / (100 * 1000))  # ref: coach.py:29


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    noises: Any
    opt_state: Any
    ema_params: Any
    latent_avg: jnp.ndarray
    params_d: Any = None
    opt_state_d: Any = None


def trainable_mask(params, *, train_G: bool, remaining_layer_idx: int):
    """True for trainable leaves; mirrors the reference freezing policy.

    - G's 8-layer style MLP is always frozen (ref: networks.py:73-75).
    - train_G=False freezes all of G (ref: networks.py:69-71).
    - layers with style index >= K are frozen (ref: networks.py:78-82):
      convs_j frozen iff j+1 >= K; to_rgbs_j frozen iff 2j+3 >= K.
    """
    K = remaining_layer_idx

    def decide(path) -> bool:
        keys = [p.key for p in path if hasattr(p, "key")]
        if not keys or keys[0] != "G":
            return True
        if not train_G:
            return False
        sub = keys[1] if len(keys) > 1 else ""
        if sub.startswith("style_"):
            return False
        if K != 17:
            if sub.startswith("convs_"):
                j = int(sub.rsplit("_", 1)[1])
                if j + 1 >= K:
                    return False
            if sub.startswith("to_rgbs_"):
                j = int(sub.rsplit("_", 1)[1])
                if 2 * j + 3 >= K:
                    return False
        return True

    return jax.tree_util.tree_map_with_path(lambda p, _: decide(p), params)


def apply_mask(grads, mask):
    return jax.tree_util.tree_map(
        lambda g, m: g if m else jnp.zeros_like(g), grads, mask
    )


class Coach:
    def __init__(self, opts, dataset_override=None, init_rng: int = 0):
        self.opts = opts
        self.global_step = 0
        self.mesh = make_mesh(getattr(opts, "n_devices", None) or None)
        self.n_data = self.mesh.devices.shape[0]
        self.global_batch = opts.batch_size * self.n_data
        # multi-host: this process loads 1/n_procs of every global batch
        # (DistributedSampler-equivalent, ref coach.py:171-177) and owns the
        # corresponding device shards; single-host: the full batch.
        self.n_procs = jax.process_count()
        self.proc_idx = jax.process_index()
        assert self.global_batch % self.n_procs == 0, (
            f"global batch {self.global_batch} must divide over "
            f"{self.n_procs} processes"
        )
        self.local_batch = self.global_batch // self.n_procs

        self.net = Net3(
            num_seg_cls=opts.num_seg_cls,
            out_size=opts.out_size,
            remaining_layer_idx=opts.remaining_layer_idx,
            n_styles=opts.n_styles,
            start_from_latent_avg=opts.start_from_latent_avg,
            learn_in_w=opts.learn_in_w,
            fast_masked=getattr(opts, "fast_masked", True),
            channels_last=getattr(opts, "channels_last", True),
            encoder_size=getattr(opts, "encoder_size", 256),
            encoder_slim=getattr(opts, "encoder_slim", False),
            ch_div=getattr(opts, "ch_div", 1),
        )
        self.D = (
            Discriminator(size=opts.out_size, ch_div=getattr(opts, "ch_div", 1))
            if opts.train_D else None
        )

        rng = jax.random.PRNGKey(init_rng)
        k_net, k_d, k_noise, k_aux = jax.random.split(rng, 4)
        S = opts.out_size
        img0 = jnp.zeros((1, 3, S, S), jnp.float32)
        mask0 = jnp.zeros((1, opts.num_seg_cls, S, S), jnp.float32)
        latent_avg0 = jnp.zeros((opts.n_styles, 512), jnp.float32)

        net_vars = jax.jit(
            partial(self.net.init, randomize_noise=False), static_argnames=()
        )({"params": k_net, "noise": k_noise}, img0, mask0, latent_avg=latent_avg0)
        params = net_vars["params"]
        noises = net_vars.get("noises", {})

        params_d = None
        if self.D is not None:
            params_d = jax.jit(self.D.init)(k_d, img0)["params"]

        # frozen loss nets
        self.id_loss = IDLoss(multiscale=opts.id_loss_multiscale)
        self.lpips = LPIPS(net_type="alex")
        self.parsing_loss = FaceParsingLoss()
        self.style_loss = StyleLoss(normalize=opts.style_loss_norm == 1)
        ks = jax.random.split(k_aux, 4)
        self.loss_vars = {}
        if opts.id_lambda > 0:
            self.loss_vars["id"] = jax.jit(self.id_loss.init)(ks[0], img0, img0)
        if opts.lpips_lambda > 0:
            self.loss_vars["lpips"] = jax.jit(self.lpips.init)(ks[1], img0, img0)
        if opts.face_parsing_lambda > 0:
            self.loss_vars["parsing"] = jax.jit(self.parsing_loss.init)(
                ks[2], img0, img0
            )
        if opts.style_lambda > 0:
            self.loss_vars["style"] = jax.jit(self.style_loss.init)(ks[3], img0, img0)

        # Mixed precision (TPU-native): bf16 compute inside the jitted G/D
        # steps with f32 master weights + f32 optimizer/EMA state. Frozen
        # criteria weights are cast once here; trainable params are cast
        # inside each loss_fn so gradients flow back to the f32 masters
        # through the cast. Demod/accumulation inside the modulated convs
        # stay f32 (see ops/modconv.py). The R1 step stays f32 (double
        # gradients; off by default, d_reg_every=-1, ref train_options.py:38).
        self.mixed_precision = bool(
            getattr(opts, "mixed_precision", getattr(opts, "bf16", False))
        )
        if self.mixed_precision:
            from e4s_tpu.pipelines.model_io import cast_pytree_bf16

            self.loss_vars = cast_pytree_bf16(self.loss_vars)

        # optimizers (x0.1 at step 100k; ref: coach.py:390-392)
        schedule = optax.piecewise_constant_schedule(
            opts.learning_rate, {100_000: 0.1}
        )
        d_reg_ratio = (
            opts.d_reg_every / (opts.d_reg_every + 1) if opts.d_reg_every > 0 else 1.0
        )
        d_schedule = optax.piecewise_constant_schedule(
            opts.learning_rate * d_reg_ratio, {100_000: 0.1}
        )
        if opts.optim_name == "adam":
            self.tx = optax.adam(schedule)
            self.tx_d = optax.adam(d_schedule)
        else:
            self.tx = ranger(schedule)
            self.tx_d = ranger(d_schedule)

        self.mask_tree = trainable_mask(
            params,
            train_G=opts.train_G and opts.train_D,
            remaining_layer_idx=opts.remaining_layer_idx,
        )

        # StyleGAN2 bootstrap (ref: coach.py:106-136): load g_ema/d/latent_avg
        # from the rosinality checkpoint when present and no resume ckpt given.
        latent_avg_boot = None
        sg_path = getattr(opts, "stylegan_weights", None)
        if not getattr(opts, "checkpoint_path", None) and sg_path and os.path.exists(sg_path):
            from e4s_tpu.utils.torch_convert import load_stylegan2_checkpoint

            g_params, g_noises, d_conv, la = load_stylegan2_checkpoint(sg_path)
            params = dict(params)
            params["G"] = jax.tree_util.tree_map(jnp.asarray, g_params)
            if g_noises:
                noises = dict(noises)
                noises["G"] = jax.tree_util.tree_map(jnp.asarray, g_noises)
            if params_d is not None and d_conv is not None and opts.out_size == 1024:
                params_d = jax.tree_util.tree_map(jnp.asarray, d_conv)
            if la is not None:
                latent_avg_boot = jnp.tile(
                    jnp.asarray(la).reshape(1, 512), (opts.n_styles, 1)
                )
            print(f"[coach] loaded StyleGAN2 bootstrap from {sg_path}")

        # Estimate latent_avg by dense sampling when unavailable
        # (ref: coach.py:139-144).
        if latent_avg_boot is None and opts.start_from_latent_avg and not getattr(opts, "checkpoint_path", None):
            from e4s_tpu.models.stylegan2 import Generator

            gen = Generator(
                size=opts.out_size,
                remaining_layer_idx=opts.remaining_layer_idx,
                ch_div=getattr(opts, "ch_div", 1),
            )
            n_sample = int(getattr(opts, "latent_avg_samples", 100_000))
            la = jax.jit(
                lambda p, n, k: gen.apply(
                    {"params": p, "noises": n}, k, n_sample,
                    method=Generator.mean_latent,
                )
            )(params["G"], noises.get("G", {}), jax.random.PRNGKey(0))
            latent_avg_boot = jnp.tile(la.reshape(1, 512), (opts.n_styles, 1))

        self.state = TrainState(
            step=jnp.zeros([], jnp.int32),
            params=params,
            noises=noises,
            opt_state=self.tx.init(params),
            # explicit copy: EMA must not alias the params buffers (donation)
            ema_params=jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params),
            latent_avg=(
                latent_avg_boot if latent_avg_boot is not None else latent_avg0
            ),
            params_d=params_d,
            opt_state_d=self.tx_d.init(params_d) if params_d is not None else None,
        )
        self.state = replicate(self.state, self.mesh)

        self.dataset_override = dataset_override
        # loss_vars is threaded through the jitted G/eval steps as an
        # ARGUMENT (not a closure): device-resident closures become MLIR
        # constants at trace time, forcing a host readback that the remote
        # TPU backend rejects (INVALID_ARGUMENT). The public call signature
        # (state, img, ...) is preserved by thin wrappers that also expose
        # the underlying jit's _cache_size for retrace accounting.
        self._jit_g = jax.jit(self._g_step, donate_argnums=(0,))
        self._jit_eval = jax.jit(self._eval_step_impl)

        def _compiled_g(state, img, mask, onehot, rng):
            return self._jit_g(state, self.loss_vars, img, mask, onehot, rng)

        _compiled_g._cache_size = self._jit_g._cache_size
        self._compiled_g = _compiled_g
        self._compiled_d = jax.jit(self._d_step, donate_argnums=(0,))
        self._compiled_r1 = jax.jit(self._d_r1_step, donate_argnums=(0,))
        self._compiled_recon = jax.jit(
            lambda state, img, onehot, rng: self._net_forward(
                state.params, state.noises, img, onehot, state.latent_avg, rng
            )[0]
        )

        self.checkpoint_dir = os.path.join(opts.exp_dir, "checkpoints")
        self.log_path = os.path.join(opts.exp_dir, "logs", "metrics.jsonl")
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        os.makedirs(os.path.dirname(self.log_path), exist_ok=True)
        self.best_val_loss = None
        # TensorBoard writer (ref: coach.py:192-196 TensorBoardX). OPT-IN:
        # torch.utils.tensorboard imports torch, whose OpenMP runtime clashes
        # with XLA:CPU in-process (observed native SIGABRTs); metrics always
        # go to logs/metrics.jsonl regardless.
        self.tb_writer = None
        if getattr(opts, "tensorboard", False):
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb_writer = SummaryWriter(
                    log_dir=os.path.join(opts.exp_dir, "logs")
                )
            except Exception:
                self.tb_writer = None

    # ------------------------------------------------------------------
    # loss calc (ref: coach.py:403-453)
    # ------------------------------------------------------------------

    def _calc_loss(self, loss_vars, img, recon, mask, latent, latent_avg):
        """loss_vars MUST be threaded in as a jit argument: the frozen
        criteria weights are device-resident, and closing over them embeds
        them as MLIR constants — a host readback that crashes trace-time on
        the remote TPU backend (same fix as parsers/Optimizer, commit
        8f48336)."""
        opts = self.opts
        loss = 0.0
        loss_dict = {}
        # Optional rematerialisation of the frozen loss nets: their forward
        # activations dominate the G-step's backward footprint (the B=8
        # 1024^2 step runs 1G over HBM without it). jax.checkpoint trades a
        # second forward pass of the (inference-only) criteria for dropping
        # those activations — the classic TPU FLOPs-for-HBM trade.
        remat = (
            jax.checkpoint if getattr(opts, "remat_losses", False)
            else (lambda f: f)
        )
        if opts.face_parsing_lambda > 0:
            lp, imp = remat(self.parsing_loss.apply)(
                loss_vars["parsing"], recon, img
            )
            loss_dict["loss_face_parsing"] = lp
            loss_dict["face_parsing_improve"] = imp
            loss = loss + lp * opts.face_parsing_lambda
        if opts.id_lambda > 0:
            lid, sim = remat(self.id_loss.apply)(loss_vars["id"], recon, img)
            loss_dict["loss_id"] = lid
            loss_dict["id_improve"] = sim
            loss = loss + lid * opts.id_lambda
        if opts.l2_lambda > 0:
            # accumulate the 1024^2 reduction in f32 (bf16 mean drifts)
            l2 = jnp.mean(jnp.square((recon - img).astype(jnp.float32)))
            loss_dict["loss_l2"] = l2
            loss = loss + l2 * opts.l2_lambda
        if opts.lpips_lambda > 0:
            def lpips_scale(lv, r, i, s):
                if s != r.shape[-1]:  # scale 0 is identity: skip the copy
                    r = adaptive_avg_pool2d(r, (s, s))
                    i = adaptive_avg_pool2d(i, (s, s))
                return self.lpips.apply(lv, r, i)

            llp = 0.0
            for i in range(3):
                # min 32: AlexNet's receptive schedule degenerates below
                # (only relevant for small test configs; 1024 path unchanged)
                s = max(opts.out_size // (2**i), 32)
                llp = llp + remat(partial(lpips_scale, s=s))(
                    loss_vars["lpips"], recon, img
                )
            loss_dict["loss_lpips"] = llp
            loss = loss + llp * opts.lpips_lambda
        if opts.w_norm_lambda > 0:
            lw = w_norm_loss(latent, latent_avg, opts.start_from_latent_avg)
            loss_dict["loss_w_norm"] = lw
            loss = loss + lw * opts.w_norm_lambda
        if opts.style_lambda > 0:
            hair = (mask == 3).astype(img.dtype)
            ls = self.style_loss.apply(
                loss_vars["style"], recon, img, mask_x=hair, mask_x_hat=hair
            )
            loss_dict["loss_style"] = ls
            loss = loss + ls * opts.style_lambda
        loss_dict["loss"] = loss
        return loss, loss_dict

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------

    def _mp(self, tree):
        """Compute-precision cast: f32 leaves -> bf16 when mixed_precision."""
        if not self.mixed_precision:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            tree,
        )

    def _net_forward(self, params, noises, img, onehot, latent_avg, rng):
        variables = {"params": params, "noises": noises}
        return self.net.apply(
            variables,
            img,
            onehot,
            latent_avg=latent_avg,
            randomize_noise=True,
            return_latents=True,
            rngs={"noise": rng},
        )

    def _g_step(self, state: TrainState, loss_vars, img, mask, onehot, rng):
        opts = self.opts

        def loss_fn(params):
            mp = self._mp
            img_c, onehot_c, la_c = mp(img), mp(onehot), mp(state.latent_avg)
            recon, _, latent = self._net_forward(
                mp(params), mp(state.noises), img_c, onehot_c, la_c, rng
            )
            loss, loss_dict = self._calc_loss(
                loss_vars, img_c, recon, mask, latent, la_c
            )
            g_loss = 0.0
            if self.D is not None:
                fake_pred = self.D.apply({"params": mp(state.params_d)}, recon)
                g_loss = adv_g_loss(fake_pred)
            loss_dict["g_loss"] = g_loss
            overall = (loss + opts.g_adv_lambda * g_loss).astype(jnp.float32)
            loss_dict["loss"] = overall
            return overall, loss_dict

        grads, loss_dict = jax.grad(loss_fn, has_aux=True)(state.params)
        grads = apply_mask(grads, self.mask_tree)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = jax.tree_util.tree_map(
            lambda e, p: ACCUM * e + (1 - ACCUM) * p, state.ema_params, new_params
        )
        new_state = dataclasses.replace(
            state,
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            ema_params=new_ema,
        )
        return new_state, loss_dict

    def _d_step(self, state: TrainState, img, onehot, rng):
        def loss_fn(params_d):
            mp = self._mp
            img_c = mp(img)
            recon, _, _ = self._net_forward(
                mp(state.params), mp(state.noises), img_c, mp(onehot),
                mp(state.latent_avg), rng,
            )
            recon = jax.lax.stop_gradient(recon)
            fake_pred = self.D.apply({"params": mp(params_d)}, recon)
            real_pred = self.D.apply({"params": mp(params_d)}, img_c)
            d_loss = adv_d_loss(real_pred, fake_pred).astype(jnp.float32)
            return d_loss, {
                "d_loss": d_loss,
                "real_score": jnp.mean(real_pred),
                "fake_score_1": jnp.mean(fake_pred),
            }

        grads, loss_dict = jax.grad(loss_fn, has_aux=True)(state.params_d)
        updates, new_opt = self.tx_d.update(grads, state.opt_state_d, state.params_d)
        new_params_d = optax.apply_updates(state.params_d, updates)
        new_state = dataclasses.replace(
            state, params_d=new_params_d, opt_state_d=new_opt
        )
        return new_state, loss_dict

    def _d_r1_step(self, state: TrainState, img):
        """Lazy R1 (ref: coach.py:311-321)."""
        opts = self.opts

        def loss_fn(params_d):
            def score(x):
                return jnp.sum(self.D.apply({"params": params_d}, x))

            grad_real = jax.grad(score)(img)
            r1 = jnp.mean(
                jnp.sum(grad_real.reshape(grad_real.shape[0], -1) ** 2, axis=1)
            )
            return opts.r1_lambda / 2 * r1 * opts.d_reg_every, {"r1_loss": r1}

        grads, loss_dict = jax.grad(loss_fn, has_aux=True)(state.params_d)
        updates, new_opt = self.tx_d.update(grads, state.opt_state_d, state.params_d)
        new_params_d = optax.apply_updates(state.params_d, updates)
        return (
            dataclasses.replace(state, params_d=new_params_d, opt_state_d=new_opt),
            loss_dict,
        )

    # ------------------------------------------------------------------
    # datasets
    # ------------------------------------------------------------------

    def configure_datasets(self):
        from e4s_tpu.datasets.dataset import (
            CelebAHQDataset,
            DataLoader,
            FFHQDataset,
            SyntheticFaceDataset,
        )

        opts = self.opts
        if self.dataset_override is not None:
            train_ds = test_ds = self.dataset_override
        elif opts.dataset_name == "ffhq":
            train_ds = FFHQDataset(
                opts.ffhq_dataset_root, fraction=opts.ds_frac, flip_p=opts.flip_p
            )
            test_ds = CelebAHQDataset(
                opts.celeba_dataset_root, mode="test", fraction=opts.ds_frac
            )
        elif opts.dataset_name == "synthetic":
            train_ds = test_ds = SyntheticFaceDataset(
                size=opts.out_size, num_seg_cls=opts.num_seg_cls
            )
        else:
            train_ds = CelebAHQDataset(
                opts.celeba_dataset_root,
                mode="train",
                fraction=opts.ds_frac,
                flip_p=opts.flip_p,
            )
            test_ds = CelebAHQDataset(
                opts.celeba_dataset_root, mode="test", fraction=opts.ds_frac
            )
        train_loader = DataLoader(
            train_ds,
            self.local_batch,
            shuffle=True,
            drop_last=True,
            seed=opts.seed,
            num_seg_cls=opts.num_seg_cls,
            num_shards=self.n_procs,
            shard_index=self.proc_idx,
        )
        test_loader = DataLoader(
            test_ds,
            self.local_batch,
            shuffle=False,
            drop_last=True,
            num_seg_cls=opts.num_seg_cls,
            num_shards=self.n_procs,
            shard_index=self.proc_idx,
        )
        return train_loader, test_loader

    # ------------------------------------------------------------------
    # the loop (ref: coach.py:275-401)
    # ------------------------------------------------------------------

    def train(self, max_steps: Optional[int] = None):
        opts = self.opts
        max_steps = max_steps if max_steps is not None else opts.max_steps
        train_loader, test_loader = self.configure_datasets()
        rng = jax.random.PRNGKey(opts.seed + 17)

        from e4s_tpu.utils.profiling import StepTimer

        timer = StepTimer(
            log_path=os.path.join(opts.exp_dir, "logs", "step_times.jsonl")
        )

        while self.global_step <= max_steps:
            for batch in train_loader:
                if self.global_step > max_steps:
                    break
                img, label, onehot = batch
                img, label, onehot = shard_batch(
                    (
                        img.astype(np.float32),
                        label.astype(np.int32),
                        onehot.astype(np.float32),
                    ),
                    self.mesh,
                )
                rng, k_d, k_g = jax.random.split(rng, 3)
                timer.start()

                d_loss_dict = {}
                if self.D is not None and self.global_step % opts.d_every == 0:
                    self.state, d_losses = self._compiled_d(
                        self.state, img, onehot, k_d
                    )
                    d_loss_dict = {k: float(v) for k, v in d_losses.items()}
                    if (
                        opts.d_reg_every != -1
                        and self.global_step % opts.d_reg_every == 0
                    ):
                        self.state, r1_losses = self._compiled_r1(self.state, img)
                        d_loss_dict.update(
                            {k: float(v) for k, v in r1_losses.items()}
                        )

                self.state, losses = self._compiled_g(
                    self.state, img, label, onehot, k_g
                )

                if self.global_step % opts.board_interval == 0:
                    loss_dict = {k: float(v) for k, v in losses.items()}
                    # float() above forces the host readback the timer needs
                    loss_dict["step_time_s"] = timer.stop(self.global_step)
                    loss_dict.update(d_loss_dict)
                    self._log_metrics(loss_dict, prefix="train")

                # image grids (ref: coach.py:360-363)
                if opts.image_interval and (
                    self.global_step % opts.image_interval == 0
                    or (self.global_step < 1000 and self.global_step % 25 == 0)
                ):
                    try:
                        rng, k_img = jax.random.split(rng)
                        recon = self._compiled_recon(self.state, img, onehot, k_img)
                        self.log_images("images/train/faces", onehot, img, recon)
                    except Exception as e:
                        print(f"[coach] image logging failed: {e}")

                if (
                    self.global_step % opts.val_interval == 0
                    and self.global_step > 0
                ) or self.global_step == max_steps:
                    val_loss_dict = self.validate(test_loader, rng)
                    if val_loss_dict and (
                        self.best_val_loss is None
                        or val_loss_dict["loss"] < self.best_val_loss
                    ):
                        self.best_val_loss = val_loss_dict["loss"]
                        self.checkpoint_me(val_loss_dict, is_best=True)

                if (
                    self.global_step % opts.save_interval == 0
                    and self.global_step > 0
                ) or self.global_step == max_steps:
                    self.checkpoint_me({}, is_best=False)

                self.global_step += 1

    def validate(self, test_loader, rng, max_batches: int = 16):
        agg = []
        for i, batch in enumerate(test_loader):
            if i >= max_batches:
                break
            img, label, onehot = shard_batch(
                (
                    batch[0].astype(np.float32),
                    batch[1].astype(np.int32),
                    batch[2].astype(np.float32),
                ),
                self.mesh,
            )
            rng, k = jax.random.split(rng)
            losses = self._eval_step(self.state, img, label, onehot, k)
            agg.append({k2: float(v) for k2, v in losses.items()})
        if not agg:
            return None
        loss_dict = aggregate_loss_dict(agg)
        self._log_metrics(loss_dict, prefix="test")
        return loss_dict

    def _eval_step(self, state, img, mask, onehot, rng):
        return self._jit_eval(state, self.loss_vars, img, mask, onehot, rng)

    def _eval_step_impl(self, state, loss_vars, img, mask, onehot, rng):
        recon, _, latent = self._net_forward(
            state.params, state.noises, img, onehot, state.latent_avg, rng
        )
        loss, loss_dict = self._calc_loss(
            loss_vars, img, recon, mask, latent, state.latent_avg
        )
        if self.D is not None:
            fake_pred = self.D.apply({"params": state.params_d}, recon)
            g_loss = adv_g_loss(fake_pred)
            loss_dict["g_loss"] = g_loss
            loss_dict["loss"] = loss + self.opts.g_adv_lambda * g_loss
        return loss_dict

    # ------------------------------------------------------------------
    # logging + checkpoints (ref: coach.py:455-517)
    # ------------------------------------------------------------------

    def _log_metrics(self, metrics: Dict[str, float], prefix: str):
        if self.proc_idx != 0:  # rank-0 logging (ref coach.py:360-387)
            return
        record = {"step": self.global_step, "prefix": prefix, **metrics}
        with open(self.log_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self.tb_writer is not None:
            for k, v in metrics.items():
                self.tb_writer.add_scalar(f"{prefix}/{k}", v, self.global_step)
        print(
            f"[{prefix} step {self.global_step}] "
            + " ".join(f"{k}={v:.4f}" for k, v in metrics.items())
        )

    def log_images(self, name: str, onehot, img, recon, display_count: int = 2):
        """Matplotlib face grids (ref: coach.py:465-491)."""
        if self.proc_idx != 0:
            return
        from e4s_tpu.utils.img_utils import tensor2im, tensor2map, vis_faces

        img, onehot, recon = map(np.asarray, (img, onehot, recon))
        rows = [
            {
                "input_face": tensor2im(img[i]),
                "input_mask": tensor2map(onehot[i]),
                "recon_styleCode": tensor2im(recon[i]),
            }
            for i in range(min(display_count, len(img)))
        ]
        fig = vis_faces(rows)
        path = os.path.join(
            self.opts.exp_dir, "logs", name, f"{self.global_step:06d}.jpg"
        )
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fig.savefig(path)
        import matplotlib.pyplot as plt

        plt.close(fig)

    def checkpoint_me(self, loss_dict, is_best: bool):
        if self.proc_idx != 0:
            # state is fully replicated (NamedSharding(P())): every shard is
            # host-addressable from process 0, so a rank-0 save is complete
            return
        import orbax.checkpoint as ocp

        name = "best_model" if is_best else f"iteration_{self.global_step}"
        path = os.path.abspath(os.path.join(self.checkpoint_dir, name))
        ckpter = ocp.PyTreeCheckpointer()
        payload = {
            "params": jax.device_get(self.state.params),
            "ema_params": jax.device_get(self.state.ema_params),
            "noises": jax.device_get(self.state.noises),
            "latent_avg": jax.device_get(self.state.latent_avg),
            "step": self.global_step,
            # optimizer moments + best-val tracking make resume truly
            # preemption-safe (the torch reference drops these,
            # ref coach.py:505-517 — "beat", not "match"). Stored as the
            # FLAT LEAF LIST: optax states are NamedTuples whose field order
            # need not be alphabetical, so a dict round-trip through orbax
            # could permute leaves; a list preserves order exactly.
            "opt_state": jax.device_get(
                jax.tree_util.tree_leaves(self.state.opt_state)
            ),
            "best_val_loss": (
                float(self.best_val_loss)
                if self.best_val_loss is not None
                else None
            ),
        }
        if self.state.params_d is not None:
            payload["params_d"] = jax.device_get(self.state.params_d)
            payload["opt_state_d"] = jax.device_get(
                jax.tree_util.tree_leaves(self.state.opt_state_d)
            )
        ckpter.save(path, payload, force=True)
        with open(os.path.join(self.checkpoint_dir, "timestamp.txt"), "a") as f:
            tag = "**Best**: " if is_best else ""
            f.write(f"{tag}Step - {self.global_step}\n{loss_dict}\n")

    def load_checkpoint(self, path: str):
        import orbax.checkpoint as ocp

        ckpter = ocp.PyTreeCheckpointer()
        payload = ckpter.restore(os.path.abspath(path))
        replace = dict(
            params=payload["params"],
            ema_params=payload["ema_params"],
            noises=payload.get("noises", self.state.noises),
            latent_avg=jnp.asarray(payload["latent_avg"]),
            params_d=payload.get("params_d", self.state.params_d),
        )
        # Optimizer moments (saved since r2; older checkpoints restart them).
        # orbax returns optax NamedTuple states as raw dict/list trees; graft
        # the leaves back onto the structure of a freshly-initialised state.
        if payload.get("opt_state") is not None:
            replace["opt_state"] = self._graft_opt_state(
                self.tx.init(payload["params"]), payload["opt_state"]
            )
        if (
            payload.get("opt_state_d") is not None
            and self.state.opt_state_d is not None
        ):
            replace["opt_state_d"] = self._graft_opt_state(
                self.tx_d.init(replace["params_d"]), payload["opt_state_d"]
            )
        if payload.get("best_val_loss") is not None:
            self.best_val_loss = float(payload["best_val_loss"])
        self.state = dataclasses.replace(self.state, **replace)
        self.state = replicate(self.state, self.mesh)
        self.global_step = int(payload.get("step", 0)) + 1

    @staticmethod
    def _graft_opt_state(template, raw):
        """Rebuild an optax state from its checkpointed flat leaf list."""
        leaves = jax.tree_util.tree_leaves(raw)
        tmpl_leaves, treedef = jax.tree_util.tree_flatten(template)
        if len(leaves) != len(tmpl_leaves) or any(
            np.shape(a) != np.shape(b) for a, b in zip(leaves, tmpl_leaves)
        ):
            raise ValueError(
                "checkpointed optimizer state does not match the configured "
                "optimizer; pass a matching --optim_name to resume moments"
            )
        return jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(x) for x in leaves]
        )
