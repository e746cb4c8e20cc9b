"""Iterative latent-refinement (inversion) pipeline — scanned on device.

Parity target: scripts/optimization.py (Optimizer.invertion). The reference
runs 200 Python-loop Adam steps with a backward per step; here the whole
refinement is ONE jitted ``lax.scan`` over an optax step on the [1,R,1280]
style-vector leaf — 200 steps execute on-device with no host round-trips
(BASELINE config #4).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from e4s_tpu.criteria import FaceParsingLoss, IDLoss
from e4s_tpu.models.lpips_nets import LPIPS
from e4s_tpu.models.net3 import Net3
from e4s_tpu.ops.resize import adaptive_avg_pool2d
from e4s_tpu.pipelines.model_io import load_net3
from e4s_tpu.utils.img_utils import tensor2im


def make_optimizer(name: str, lr: float):
    """ref: scripts/optimization.py:126-133 (sgd | adam | sgdm | adamax)."""
    if name == "sgd":
        return optax.sgd(lr)
    if name == "sgdm":
        return optax.sgd(lr, momentum=0.9)
    if name == "adamax":
        return optax.adamax(lr)
    return optax.adam(lr)


class Optimizer:
    """ref: scripts/optimization.py:52-255"""

    def __init__(self, opts, dataset=None):
        self.opts = opts
        if dataset is not None:
            self.test_ds = dataset
        else:
            import os as _os

            from e4s_tpu.datasets.dataset import (
                CelebAHQDataset,
                SyntheticFaceDataset,
            )

            if _os.path.isdir(_os.path.join(opts.dataset_root, "CelebA-HQ-img")):
                self.test_ds = CelebAHQDataset(
                    dataset_root=opts.dataset_root, mode="test",
                    fraction=opts.ds_frac,
                )
            else:
                print(
                    f"[e4s_tpu] WARNING: CelebAMask-HQ not found at "
                    f"{opts.dataset_root}; using the synthetic dataset"
                )
                self.test_ds = SyntheticFaceDataset(
                    size=opts.out_size, num_seg_cls=opts.num_seg_cls, length=256
                )
        self.net, self.variables, self.latent_avg = load_net3(opts)

        self.id_loss = IDLoss(multiscale=opts.id_loss_multiscale)
        self.lpips = LPIPS(net_type="alex")
        self.parsing_loss = FaceParsingLoss()
        S = opts.out_size
        img0 = jnp.zeros((1, 3, S, S), jnp.float32)
        k = jax.random.PRNGKey(0)
        self.loss_vars = {}
        if opts.id_lambda > 0:
            self.loss_vars["id"] = jax.jit(self.id_loss.init)(k, img0, img0)
        if opts.lpips_lambda > 0:
            self.loss_vars["lpips"] = jax.jit(self.lpips.init)(k, img0, img0)
        if opts.face_parsing_lambda > 0:
            self.loss_vars["parsing"] = jax.jit(self.parsing_loss.init)(k, img0, img0)

        # Mixed-precision inversion: frozen net + criteria weights bf16, the
        # optimised theta (style vector / noise leaves) and Adam moments stay
        # f32; theta is cast to bf16 inside the loss so gradients flow back
        # to the f32 leaves through the cast.
        self.bf16 = bool(getattr(opts, "bf16", False))
        if self.bf16:
            from e4s_tpu.pipelines.model_io import cast_pytree_bf16

            self.loss_vars = cast_pytree_bf16(self.loss_vars)

        self.tx = make_optimizer(opts.opt_name, opts.lr)
        self._scan_refine = jax.jit(
            self._refine, static_argnames=("n_steps", "save_every")
        )
        self._jit_step = jax.jit(self._one_step)

    def _mp(self, tree):
        """Compute-precision cast: f32 leaves -> bf16 when opts.bf16."""
        if not self.bf16:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            tree,
        )

    @staticmethod
    def _f32(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    # loss on the recon (ref: optimization.py:91-122)
    def _calc_loss(self, img, recon):
        return self._calc_loss_fn(self.loss_vars, img, recon)

    def _calc_loss_fn(self, loss_vars, img, recon):
        from e4s_tpu.ops.resize import pool_conv_scope

        with pool_conv_scope(False):
            return self._calc_loss_impl(loss_vars, img, recon)

    def _calc_loss_impl(self, loss_vars, img, recon):
        # traced under pool_conv_scope(False): every uniform avg-pool in
        # this loss (ID/LPIPS/parsing) lowers as reshape+mean — the
        # depthwise-conv form is 15% slower inside the refinement lax.scan
        # (round-5 A/B on v5e; the coach's unrolled step prefers conv)
        opts = self.opts
        loss = 0.0
        aux = {}
        if opts.id_lambda > 0:
            lid, _ = self.id_loss.apply(loss_vars["id"], recon, img)
            aux["loss_id"] = lid
            loss = loss + lid * opts.id_lambda
        if opts.l2_lambda > 0:
            # f32 accumulation (a bf16 mean over 1024^2 drifts)
            l2 = jnp.mean(jnp.square((recon - img).astype(jnp.float32)))
            aux["loss_l2"] = l2
            loss = loss + l2 * opts.l2_lambda
        if opts.lpips_lambda > 0:
            lp = 0.0
            for i in range(3):
                s = max(opts.out_size // (2**i), 32)
                lp = lp + self.lpips.apply(
                    loss_vars["lpips"],
                    adaptive_avg_pool2d(recon, (s, s)),
                    adaptive_avg_pool2d(img, (s, s)),
                )
            aux["loss_lpips"] = lp
            loss = loss + lp * opts.lpips_lambda
        if opts.face_parsing_lambda > 0:
            lpar, _ = self.parsing_loss.apply(loss_vars["parsing"], recon, img)
            aux["loss_face_parsing"] = lpar
            loss = loss + lpar * opts.face_parsing_lambda
        aux["loss"] = loss
        return loss, aux

    def _gen_from_sv_fn(self, variables, latent_avg, style_vectors, onehot,
                        noise=None):
        codes = self.net.apply(
            variables, style_vectors, latent_avg, method=Net3.cal_style_codes
        )
        struc = jnp.zeros(
            (style_vectors.shape[0], 512, 32, 32), style_vectors.dtype
        )
        img, _, _ = self.net.apply(
            variables, struc, codes, onehot,
            method=Net3.gen_img, randomize_noise=False,
            noise=list(noise) if noise is not None else None,
        )
        return img

    def _noise_init(self):
        """The generator's registered per-layer noise buffers, as optimisable
        leaves (ref: scripts/optimization.py:146-159 optionally extends the
        optimizer's param list with per-layer noise maps)."""
        g_noises = self.variables.get("noises", {}).get("G", {})
        keys = sorted(g_noises, key=lambda s: int(s.rsplit("_", 1)[1]))
        return tuple(jnp.asarray(g_noises[k]) for k in keys)

    def _gen_from_sv(self, style_vectors, onehot):
        return self._gen_from_sv_fn(
            self.variables, self.latent_avg, style_vectors, onehot
        )

    def _one_step(self, variables, latent_avg, loss_vars, theta, opt_state, img, onehot):
        img_c, onehot_c = self._mp(img), self._mp(onehot)

        def loss_fn(t):
            t = self._mp(t)
            recon = self._gen_from_sv_fn(
                variables, latent_avg, t["sv"], onehot_c, noise=t.get("noise")
            )
            loss, aux = self._calc_loss_fn(loss_vars, img_c, recon)
            return loss.astype(jnp.float32), aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(theta)
        updates, opt_state = self.tx.update(grads, opt_state, theta)
        theta = optax.apply_updates(theta, updates)
        return theta, opt_state, aux["loss"]

    def _refine_host_loop(self, sv_init, img, onehot, n_steps: int,
                          noise_init=None):
        """Fallback when the scanned program exceeds the remote compiler's
        size limit: same math, one jitted step dispatched per iteration."""
        with_noise = noise_init is not None
        theta = {"sv": self._f32(sv_init)}
        if with_noise:
            theta["noise"] = tuple(self._f32(n) for n in noise_init)
        opt_state = self.tx.init(theta)
        losses = []
        for _ in range(n_steps):
            theta, opt_state, loss = self._jit_step(
                self.variables, self.latent_avg, self.loss_vars,
                theta, opt_state, img, onehot,
            )
            losses.append(loss)
        sv = theta["sv"]
        recon = self._gen_from_sv_fn(
            self.variables, self.latent_avg, sv, onehot,
            noise=theta.get("noise"),
        ).astype(jnp.float32)
        trace = jnp.broadcast_to(sv[None], (n_steps,) + sv.shape)
        if with_noise:
            return sv, recon, jnp.stack(losses), trace, theta["noise"]
        return sv, recon, jnp.stack(losses), trace

    def _refine(self, variables, latent_avg, loss_vars, sv_init, img, onehot,
                n_steps: int, save_every: int, noise_init=None):
        """Scanned refinement of the style vector, optionally jointly with the
        per-layer noise maps (pytree leaves alongside sv, like the reference
        extending the torch param list)."""
        tx = self.tx
        with_noise = noise_init is not None
        # theta + Adam moments stay f32 even in bf16 mode
        theta0 = {"sv": self._f32(sv_init)}
        if with_noise:
            theta0["noise"] = tuple(self._f32(n) for n in noise_init)
        img_c, onehot_c = self._mp(img), self._mp(onehot)

        def loss_fn(theta):
            theta = self._mp(theta)
            recon = self._gen_from_sv_fn(
                variables, latent_avg, theta["sv"], onehot_c,
                noise=theta.get("noise"),
            )
            loss, aux = self._calc_loss_fn(loss_vars, img_c, recon)
            return loss.astype(jnp.float32), aux

        def step(carry, _):
            theta, opt_state = carry
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(theta)
            updates, opt_state = tx.update(grads, opt_state, theta)
            theta = optax.apply_updates(theta, updates)
            return (theta, opt_state), (aux["loss"], theta["sv"])

        opt_state = tx.init(theta0)
        (theta, _), (losses, sv_trace) = jax.lax.scan(
            step, (theta0, opt_state), None, length=n_steps
        )
        recon = self._gen_from_sv_fn(
            variables, latent_avg, theta["sv"], onehot,
            noise=theta.get("noise"),
        ).astype(jnp.float32)
        if with_noise:
            return theta["sv"], recon, losses, sv_trace, theta["noise"]
        return theta["sv"], recon, losses, sv_trace

    def invertion(self, sample_idx: int, save: bool = True):
        """ref: scripts/optimization.py:163-241"""
        from e4s_tpu.datasets.dataset import label_map_to_onehot

        opts = self.opts
        img_np, label_np, _ = self.test_ds[sample_idx]
        img = jnp.asarray(img_np[None])
        onehot = jnp.asarray(
            label_map_to_onehot(label_np[None], opts.num_seg_cls)
        )

        sv_init, _ = self.net.apply(
            self.variables, img, onehot, method=Net3.get_style_vectors
        )
        recon0 = self._gen_from_sv(sv_init, onehot)

        noise_init = (
            self._noise_init()
            if getattr(opts, "optimize_noise", False)
            else None
        )
        noise_opt = None
        try:
            out = self._scan_refine(
                self.variables, self.latent_avg, self.loss_vars,
                sv_init, img, onehot,
                n_steps=opts.W_steps, save_every=opts.save_interval,
                noise_init=noise_init,
            )
        except Exception as e:  # e.g. remote-compiler size limit
            print(f"[e4s_tpu] scanned refinement unavailable ({type(e).__name__}); "
                  "falling back to per-step dispatch")
            out = self._refine_host_loop(
                sv_init, img, onehot, opts.W_steps, noise_init=noise_init
            )
        if noise_init is not None:
            sv, recon, losses, sv_trace, noise_opt = out
        else:
            sv, recon, losses, sv_trace = out

        if save:
            name = f"sample_{sample_idx}"
            folder = os.path.join(opts.output_dir, name)
            os.makedirs(folder, exist_ok=True)
            tensor2im(np.asarray(img[0])).save(os.path.join(folder, f"{name}_gt.png"))
            tensor2im(np.asarray(recon0[0])).save(
                os.path.join(folder, f"{name}_recon.png")
            )
            # intermediate latents every save_interval steps
            # (ref: optimization.py:229-232, 243-256)
            if getattr(opts, "save_intermediate", False):
                for step in range(opts.save_interval, opts.W_steps, opts.save_interval):
                    inter_sv = np.asarray(sv_trace[step - 1])
                    np.save(
                        os.path.join(folder, f"{name}_{step:04d}.npy"), inter_sv
                    )
                    inter_recon = self._gen_from_sv(
                        jnp.asarray(inter_sv), onehot
                    )
                    tensor2im(np.asarray(inter_recon[0])).save(
                        os.path.join(folder, f"{name}_{step:04d}.png")
                    )
            tensor2im(np.asarray(recon[0])).save(
                os.path.join(folder, f"{name}_{opts.W_steps:04d}.png")
            )
            np.save(
                os.path.join(folder, f"{name}_{opts.W_steps:04d}.npy"),
                np.asarray(sv),
            )
            if noise_opt is not None:
                # optimized per-layer noise maps
                # (ref: optimization.py:249-252 save_stats["noise"])
                np.savez(
                    os.path.join(folder, f"{name}_{opts.W_steps:04d}_noise.npz"),
                    *[np.asarray(n) for n in noise_opt],
                )
        return sv, recon, np.asarray(losses)
