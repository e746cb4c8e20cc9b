"""Texture-interpolation editing pipeline.

Parity target: scripts/face_edit.py (Editor.interpolation). Per-region lerp of
RGI texture vectors between a source and a reference image, regenerated with
the source mask and fixed pre-sampled noise.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from e4s_tpu.datasets.dataset import label_map_to_onehot
from e4s_tpu.models.net3 import Net3
from e4s_tpu.models.stylegan2 import generator_channels
from e4s_tpu.pipelines.model_io import load_face_parser, load_net3
from e4s_tpu.utils.img_utils import tensor2im

# ref: scripts/face_edit.py:15-17
COMP2INDEX = {
    "background": 0, "lip": 1, "eyebrows": 2, "eyes": 3, "hair": 4,
    "nose": 5, "skin": 6, "ears": 7, "belowface": 8, "mouth": 9,
    "eye_glass": 10, "ear_rings": 11,
}


def sample_fixed_noise(out_size: int, seed: int = 0):
    """Pre-sampled full-channel per-layer noise (ref: face_edit.py:47-51)."""
    rng = np.random.RandomState(seed)
    channels = generator_channels()
    noise = [jnp.asarray(rng.randn(1, 512, 4, 4).astype(np.float32))]
    res = 8
    while res <= out_size:
        for _ in range(2):
            noise.append(
                jnp.asarray(
                    rng.randn(1, channels[res], res, res).astype(np.float32)
                )
            )
        res *= 2
    return noise


class Editor:
    """ref: scripts/face_edit.py:19-101"""

    def __init__(self, opts, parser=None):
        self.opts = opts
        for region in opts.regions:
            assert region in COMP2INDEX, (
                f"The input {region} is invalid, please choose one from "
                + ",".join(COMP2INDEX)
            )
        self.net, self.variables, self.latent_avg = load_net3(opts)
        self.parser = parser if parser is not None else load_face_parser(
            opts, getattr(opts, "faceParsing_ckpt", None)
        )
        self.noise = sample_fixed_noise(opts.out_size)

        net = self.net

        def edit_core(variables, src, src_onehot, ref, ref_onehot, alphas,
                      latent_avg, noise):
            src_sv, _ = net.apply(variables, src, src_onehot, method=Net3.get_style_vectors)
            ref_sv, _ = net.apply(variables, ref, ref_onehot, method=Net3.get_style_vectors)
            # mixed = (1-a) src + a ref, per-region alpha vector [R]
            a = alphas[None, :, None]
            mixed = (1.0 - a) * src_sv + a * ref_sv
            codes = net.apply(variables, mixed, latent_avg, method=Net3.cal_style_codes)
            struc = jnp.zeros((src.shape[0], 512, 32, 32), src.dtype)
            img, _, _ = net.apply(
                variables, struc, codes, src_onehot,
                method=Net3.gen_img, randomize_noise=False, noise=noise,
            )
            return img

        self._edit_core = jax.jit(edit_core)

        def edit_sweep_core(variables, parser_variables, src_u8, ref_u8,
                            alphas, latent_avg, noise):
            """Fused parse + A-way alpha-sweep edit: uint8 in, uint8 out.

            alphas: [A, R] per-region interpolation weights; the A edited
            images are synthesised as one batch (one upload of each image,
            one download of all results — the host<->device link is the
            bottleneck, see swap_core.make_swap_e2e).
            """
            from e4s_tpu.pipelines.swap_core import _img_to01, parse12_device

            img01 = jnp.concatenate(
                [_img_to01(src_u8), _img_to01(ref_u8)], axis=0
            )
            labels = parse12_device(
                parser_model, parser_variables, img01,
                parser_size=parser_size, taxonomy=parser_taxonomy,
            )
            dt = latent_avg.dtype
            cls = jnp.arange(net.num_seg_cls, dtype=jnp.int32)[
                None, :, None, None
            ]
            oh = (labels[:, None] == cls).astype(dt)
            imgs = (img01 * 2.0 - 1.0).astype(dt)
            sv, _ = net.apply(
                variables, imgs, oh, method=Net3.get_style_vectors
            )
            src_sv, ref_sv = sv[:1], sv[1:]
            a = alphas[:, :, None].astype(dt)  # [A, R, 1]
            mixed = (1.0 - a) * src_sv + a * ref_sv  # [A, R, 1280]
            codes = net.apply(
                variables, mixed, latent_avg, method=Net3.cal_style_codes
            )
            A = alphas.shape[0]
            src_oh = jnp.broadcast_to(oh[:1], (A,) + oh.shape[1:])
            struc = jnp.zeros((A, 512, 32, 32), dt)
            img, _, _ = net.apply(
                variables, struc, codes, src_oh,
                method=Net3.gen_img, randomize_noise=False, noise=noise,
            )
            out01 = jnp.clip((img.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)
            return (out01 * 255.0).astype(jnp.uint8)

        parser_model = getattr(self.parser, "model", None)
        parser_taxonomy = getattr(self.parser, "taxonomy", "ffhq19")
        parser_size = (
            getattr(self.parser, "size", 512)
            if parser_taxonomy == "celeba19" else 512
        )
        self._edit_sweep_core = (
            jax.jit(edit_sweep_core) if parser_model is not None else None
        )

    def interpolation_sweep(self, alpha_values: Sequence[float]):
        """Sweep opts.alpha over ``alpha_values`` for opts.regions in ONE
        fused device program (BASELINE bench config #2). Returns a list of
        PIL images, one per alpha."""
        from PIL import Image

        def load_u8(path):
            S = self.opts.out_size
            img = Image.open(path).convert("RGB").resize((S, S))
            return jnp.asarray(
                np.transpose(np.asarray(img, np.uint8), (2, 0, 1))[None]
            )

        A = len(alpha_values)
        alphas = np.zeros((A, self.opts.num_seg_cls), np.float32)
        for region in self.opts.regions:
            alphas[:, COMP2INDEX[region]] = np.asarray(alpha_values)
        out_u8 = self._edit_sweep_core(
            self.variables, self.parser.variables,
            load_u8(self.opts.source), load_u8(self.opts.reference),
            jnp.asarray(alphas), self.latent_avg, self.noise,
        )
        arr = np.asarray(out_u8)
        return [
            Image.fromarray(np.transpose(arr[i], (1, 2, 0))) for i in range(A)
        ]

    def _prep(self, path):
        from PIL import Image

        S = self.opts.out_size
        img = Image.open(path).convert("RGB").resize((S, S))
        arr01 = np.transpose(np.asarray(img, np.float32) / 255.0, (2, 0, 1))[None]
        label = self.parse(arr01)
        onehot = label_map_to_onehot(
            jnp.asarray(label[:, None]), self.opts.num_seg_cls
        )
        timg = jnp.asarray(arr01 * 2 - 1)
        return timg, onehot

    def parse(self, arr01):
        from e4s_tpu.pipelines.swap_core import parse12_host

        return parse12_host(self.parser, arr01)

    def interpolation(self):
        src, src_onehot = self._prep(self.opts.source)
        ref, ref_onehot = self._prep(self.opts.reference)
        alphas = np.zeros((self.opts.num_seg_cls,), np.float32)
        for region in self.opts.regions:
            alphas[COMP2INDEX[region]] = self.opts.alpha
        out = self._edit_core(
            self.variables, src, src_onehot, ref, ref_onehot,
            jnp.asarray(alphas), self.latent_avg, self.noise,
        )
        return tensor2im(np.asarray(out[0]))
