"""Interactive shape/texture editing demo.

Parity target: demo/gradio_demo.py (DemoHelper + the two-tab gradio UI).
The helper — cached per-image texture vectors, mask estimation, sketch-based
mask repainting, region-wise texture interpolation and regeneration with
fixed noise — is importable and testable headless; the gradio UI launches
only when gradio is installed.

UI surface matched to the reference (ref demo/gradio_demo.py:189-256):
  - input image + sketchable colored mask side by side;
  - "Shape editing" tab: a facial-region radio, "Confirm mask editing"
    (paints the sketch strokes as the chosen region's label) and
    "Get edited face" (regenerate with the edited mask, source textures);
  - "Texture editing" tab: reference image, region checkbox group, an
    alpha slider, "Get edited face" (regenerate with the initial mask and
    per-region interpolated texture vectors);
  - operation-logging textboxes fed by every callback.
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


def paint_region(
    base_colored_mask: np.ndarray,
    stroke_mask: np.ndarray,
    region: str | None,
):
    """Paint sketch strokes onto a colored mask as `region`'s label.

    Headless core of the reference's "Confirm mask editing" callback
    (ref demo/gradio_demo.py:121-133): gradio's sketch tool returns an RGBA
    stroke overlay; every stroked pixel is relabeled to the chosen region.
    Returns (edited_colored_mask, ok_flag, message).
    """
    if region is None:
        return (
            base_colored_mask,
            False,
            "Please choose the region you want to edit on, and try again.",
        )
    strokes = np.asarray(stroke_mask)
    if strokes.ndim == 3:  # RGBA (or RGB) overlay from the sketch tool
        strokes = np.sum(strokes[:, :, :3], axis=-1) != 0
    label_map = colored_mask_to_label_map(base_colored_mask)
    label_map[strokes] = COMP2INDEX[region]
    return (
        label_map_to_colored_mask(label_map),
        True,
        "Edit %s region success!" % region,
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
        self.initial_colored_map = None
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

    def _generate(self, label_map, texture_vectors):
        """Regenerate from a label map + texture vectors with fixed noise
        (the shared tail of both edit paths, ref demo/gradio_demo.py:135-186)."""
        from e4s_tpu.datasets.dataset import label_map_to_onehot
        from e4s_tpu.utils.img_utils import tensor2im

        jnp = self._jnp
        codes = self.net.apply(
            self.variables, jnp.asarray(texture_vectors), self.latent_avg,
            method=self._Net3.cal_style_codes,
        )
        onehot = jnp.asarray(
            label_map_to_onehot(label_map[None, None], self.opts.num_seg_cls)
        )
        struc = jnp.zeros((1, 512, 32, 32))
        img, _, _ = self.net.apply(
            self.variables, struc, codes, onehot,
            method=self._Net3.gen_img, randomize_noise=False, noise=self.noise,
        )
        return np.asarray(tensor2im(np.asarray(img[0])))

    # -------------------- UI callbacks (headless-testable) --------------------

    def set_source(self, image_rgb_uint8):
        """ref esitimate_init_mask_fn (demo/gradio_demo.py:92-106)."""
        self.src_img = image_rgb_uint8
        self.initial_label_map = self.estimate_mask(image_rgb_uint8)
        self.initial_colored_map = label_map_to_colored_mask(self.initial_label_map)
        self.src_texture_vectors = self._texture_vectors(
            image_rgb_uint8, self.initial_label_map
        )
        return self.initial_colored_map, "Load input image success!"

    def set_reference(self, image_rgb_uint8):
        """ref esitimate_referece_mask_fn (demo/gradio_demo.py:108-118)."""
        self.ref_img = image_rgb_uint8
        self.ref_label_map = self.estimate_mask(image_rgb_uint8)
        self.ref_texture_vectors = self._texture_vectors(
            image_rgb_uint8, self.ref_label_map
        )
        return "Load reference image success!"

    def edit_mask(self, region, stroke_mask):
        """ref edit_mask_fn — strokes repaint the CURRENT initial colored map
        (the reference restarts from initial_colored_map on every confirm;
        we mirror that so repeated confirms behave identically)."""
        edited, ok, msg = paint_region(self.initial_colored_map, stroke_mask, region)
        return edited, msg

    def shape_edit(self, edited_colored_mask):
        """ref face_shape_edit_fn (demo/gradio_demo.py:136-156): edited mask +
        SOURCE texture vectors."""
        label_map = colored_mask_to_label_map(np.asarray(edited_colored_mask))
        img = self._generate(label_map, np.array(self.src_texture_vectors))
        return img, "Edit shape success!"

    def texture_edit(self, regions, alpha):
        """ref face_texture_edit_fn (demo/gradio_demo.py:158-186): initial mask
        + per-region lerp of texture vectors toward the reference."""
        if not regions:
            return self.src_img, (
                "Please choose the region you want to mix, and try again."
            )
        mixed = np.array(self.src_texture_vectors)
        ref = np.array(self.ref_texture_vectors)
        for region in regions:
            idx = COMP2INDEX[region]
            mixed[0, idx] = (1 - alpha) * mixed[0, idx] + alpha * ref[0, idx]
        img = self._generate(self.initial_label_map, mixed)
        return img, "Edit %s region(s) success!" % " ".join(regions)

    # kept for back-compat with earlier rounds' scripts
    def generate(self, edited_colored_mask=None, regions=(), alpha=1.0):
        label_map = (
            colored_mask_to_label_map(np.asarray(edited_colored_mask))
            if edited_colored_mask is not None
            else self.initial_label_map
        )
        mixed = np.array(self.src_texture_vectors)
        if self.ref_texture_vectors is not None and regions:
            ref = np.array(self.ref_texture_vectors)
            for region in regions:
                idx = COMP2INDEX[region]
                mixed[0, idx] = (1 - alpha) * mixed[0, idx] + alpha * ref[0, idx]
        return self._generate(label_map, mixed)


def launch():
    try:
        import gradio as gr
    except ImportError:
        raise SystemExit(
            "gradio is not installed in this environment; the DemoHelper API "
            "(demo.gradio_demo.DemoHelper) is fully functional headless."
        )

    helper = DemoHelper()

    def _sketch_strokes(mask_value):
        # gradio's sketch tool returns {"image":..., "mask": RGBA}; newer
        # versions may hand back a plain array — accept both.
        if isinstance(mask_value, dict):
            return np.asarray(mask_value.get("mask"))
        return np.asarray(mask_value)

    with gr.Blocks(title="E4S-TPU face editing") as ui:
        gr.Markdown(
            "## E4S-TPU — mask-guided face editing\n"
            "Upload a source face, sketch on its parsed mask to reshape "
            "regions, or blend texture from a reference face."
        )
        with gr.Row():
            input_img = gr.Image(label="input image")
            try:
                input_mask = gr.Image(label="mask", source="upload", tool="sketch")
            except TypeError:  # gradio >= 4 renamed the sketch tool
                input_mask = gr.Image(label="mask")
        with gr.Row():
            with gr.Tab("Shape editing"):
                region_radio = gr.Radio(
                    COMP, value="hair", label="Facial regions",
                    info="Which region(s) are you interested in?",
                )
                shape_log = gr.Textbox(
                    label="Operations logging:", value="Ready to edit shape...",
                    lines=2, interactive=False,
                )
                with gr.Row():
                    edit_mask_btn = gr.Button("Confirm mask editing")
                    face_shape_edit_btn = gr.Button("Get edited face")
            with gr.Tab("Texture editing"):
                region_groups = gr.CheckboxGroup(
                    choices=COMP, label="Facial regions",
                    info="Which region(s) are you interested in?",
                )
                with gr.Row():
                    reference_img = gr.Image(label="Reference image")
                    with gr.Column():
                        alpha = gr.Slider(
                            0, 1, value=1.0, label="Editing extent",
                            info="Choose between 0 and 1",
                        )
                        texture_log = gr.Textbox(
                            label="Operations logging:",
                            value="Ready to edit texture...",
                            lines=2, interactive=False,
                        )
                        face_texture_edit_btn = gr.Button("Get edited face")
            output_img = gr.Image(label="result")

        input_img.change(
            helper.set_source, inputs=[input_img],
            outputs=[input_mask, shape_log], queue=False,
        )
        reference_img.change(
            helper.set_reference, inputs=[reference_img],
            outputs=[texture_log], queue=False,
        )
        edit_mask_btn.click(
            lambda region, mask: helper.edit_mask(region, _sketch_strokes(mask)),
            inputs=[region_radio, input_mask], outputs=[input_mask, shape_log],
        )
        face_shape_edit_btn.click(
            lambda mask: helper.shape_edit(
                mask["image"] if isinstance(mask, dict) else mask
            ),
            inputs=[input_mask], outputs=[output_img, shape_log],
        )
        face_texture_edit_btn.click(
            helper.texture_edit, inputs=[region_groups, alpha],
            outputs=[output_img, texture_log],
        )
    ui.launch()


if __name__ == "__main__":
    launch()
