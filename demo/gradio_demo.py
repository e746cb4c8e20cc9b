"""Interactive shape/texture editing demo.

Parity target: demo/gradio_demo.py (DemoHelper + gradio UI). The helper —
cached per-image texture vectors, mask estimation, region-wise interpolation
and regeneration with fixed noise — is importable and testable headless; the
gradio UI launches only when gradio is installed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from demo.gradio_utils import (
    COMP,
    COMP2INDEX,
    colored_mask_to_label_map,
    label_map_to_colored_mask,
)


class DemoHelper:
    """ref: demo/gradio_demo.py:16-186"""

    def __init__(self, opts=None):
        import jax.numpy as jnp

        from e4s_tpu.models.net3 import Net3
        from e4s_tpu.options.edit_options import EditOptions
        from e4s_tpu.pipelines.face_edit import sample_fixed_noise
        from e4s_tpu.pipelines.model_io import load_face_parser, load_net3

        self.opts = opts or EditOptions().parse([])
        self.net, self.variables, self.latent_avg = load_net3(self.opts)
        self.parser = load_face_parser(
            self.opts, getattr(self.opts, "faceParsing_ckpt", None)
        )
        self.noise = sample_fixed_noise(self.opts.out_size)
        self._Net3 = Net3
        self._jnp = jnp

        self.src_img = None
        self.initial_label_map = None
        self.ref_img = None
        self.ref_label_map = None
        self.src_texture_vectors = None
        self.ref_texture_vectors = None

    # -------------------- helpers --------------------

    def estimate_mask(self, image_rgb_uint8: np.ndarray) -> np.ndarray:
        from e4s_tpu.models.bisenet import face_parsing_demo

        arr01 = np.transpose(image_rgb_uint8.astype(np.float32) / 255.0, (2, 0, 1))[None]
        return face_parsing_demo(self.parser, self._jnp.asarray(arr01), True)[0]

    def _texture_vectors(self, img_rgb_uint8, label_map):
        from e4s_tpu.datasets.dataset import label_map_to_onehot

        jnp = self._jnp
        img = jnp.asarray(
            np.transpose(img_rgb_uint8.astype(np.float32) / 255.0, (2, 0, 1))[None]
            * 2 - 1
        )
        onehot = jnp.asarray(
            label_map_to_onehot(label_map[None, None], self.opts.num_seg_cls)
        )
        sv, _ = self.net.apply(
            self.variables, img, onehot, method=self._Net3.get_style_vectors
        )
        return sv

    def set_source(self, image_rgb_uint8):
        self.src_img = image_rgb_uint8
        self.initial_label_map = self.estimate_mask(image_rgb_uint8)
        self.src_texture_vectors = self._texture_vectors(
            image_rgb_uint8, self.initial_label_map
        )
        return label_map_to_colored_mask(self.initial_label_map)

    def set_reference(self, image_rgb_uint8):
        self.ref_img = image_rgb_uint8
        self.ref_label_map = self.estimate_mask(image_rgb_uint8)
        self.ref_texture_vectors = self._texture_vectors(
            image_rgb_uint8, self.ref_label_map
        )
        return label_map_to_colored_mask(self.ref_label_map)

    def generate(self, edited_colored_mask=None, regions=(), alpha=1.0):
        """Regenerate with an (optionally sketch-edited) mask and per-region
        texture interpolation toward the reference."""
        from e4s_tpu.datasets.dataset import label_map_to_onehot
        from e4s_tpu.models.net3 import Net3
        from e4s_tpu.utils.img_utils import tensor2im

        jnp = self._jnp
        label_map = (
            colored_mask_to_label_map(edited_colored_mask)
            if edited_colored_mask is not None
            else self.initial_label_map
        )
        mixed = np.array(self.src_texture_vectors)
        if self.ref_texture_vectors is not None:
            ref = np.array(self.ref_texture_vectors)
            for region in regions:
                idx = COMP2INDEX[region]
                mixed[0, idx] = (1 - alpha) * mixed[0, idx] + alpha * ref[0, idx]
        codes = self.net.apply(
            self.variables, jnp.asarray(mixed), self.latent_avg,
            method=Net3.cal_style_codes,
        )
        onehot = jnp.asarray(
            label_map_to_onehot(label_map[None, None], self.opts.num_seg_cls)
        )
        struc = jnp.zeros((1, 512, 32, 32))
        img, _, _ = self.net.apply(
            self.variables, struc, codes, onehot,
            method=Net3.gen_img, randomize_noise=False, noise=self.noise,
        )
        return np.asarray(tensor2im(np.asarray(img[0])))


def launch():
    try:
        import gradio as gr
    except ImportError:
        raise SystemExit(
            "gradio is not installed in this environment; the DemoHelper API "
            "(demo.gradio_demo.DemoHelper) is fully functional headless."
        )

    helper = DemoHelper()
    with gr.Blocks(title="E4S-TPU face editing") as ui:
        gr.Markdown("## E4S-TPU — mask-guided face editing")
        with gr.Row():
            src = gr.Image(label="Source")
            ref = gr.Image(label="Reference")
            out = gr.Image(label="Result")
        mask_vis = gr.Image(label="Editable mask (colored)")
        regions = gr.CheckboxGroup(choices=COMP, label="Regions to transfer")
        alpha = gr.Slider(0.0, 1.0, value=1.0, label="alpha")
        btn = gr.Button("Generate")

        src.change(helper.set_source, inputs=src, outputs=mask_vis)
        ref.change(helper.set_reference, inputs=ref, outputs=mask_vis)
        btn.click(
            lambda m, r, a: helper.generate(m, r, a),
            inputs=[mask_vis, regions, alpha],
            outputs=out,
        )
    ui.launch()


if __name__ == "__main__":
    launch()
