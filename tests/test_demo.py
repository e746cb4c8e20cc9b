"""Headless tests for the demo callbacks (ref demo/gradio_demo.py has no
tests; these pin the sketch-repaint and edit-callback semantics the UI
builds on)."""

import numpy as np
import pytest

from demo.gradio_demo import DemoHelper, paint_region
from demo.gradio_utils import (
    COMP2INDEX,
    COMP_COLORS_NUMPY,
    colored_mask_to_label_map,
    label_map_to_colored_mask,
)


def test_colored_mask_round_trip():
    rng = np.random.default_rng(0)
    label_map = rng.integers(0, 12, size=(32, 32)).astype(np.uint8)
    colored = label_map_to_colored_mask(label_map)
    np.testing.assert_array_equal(colored_mask_to_label_map(colored), label_map)


def test_paint_region_repaints_strokes_only():
    label_map = np.zeros((16, 16), dtype=np.uint8)
    label_map[:8] = COMP2INDEX["skin"]
    base = label_map_to_colored_mask(label_map)

    strokes = np.zeros((16, 16, 4), dtype=np.uint8)  # RGBA, as gradio returns
    strokes[4:12, 4:12, :3] = 255

    edited, ok, msg = paint_region(base, strokes, "hair")
    assert ok and "hair" in msg
    out = colored_mask_to_label_map(edited)
    assert (out[4:12, 4:12] == COMP2INDEX["hair"]).all()
    # untouched pixels keep their labels
    np.testing.assert_array_equal(out[:4], label_map[:4])
    np.testing.assert_array_equal(out[12:], label_map[12:])


def test_paint_region_requires_region():
    base = np.zeros((8, 8, 3), dtype=np.uint8)
    edited, ok, msg = paint_region(base, np.zeros((8, 8, 4)), None)
    assert not ok and "choose the region" in msg
    np.testing.assert_array_equal(edited, base)


def _stub_helper():
    """A DemoHelper with the model machinery stubbed out — exercises the
    callback logic (caching, lerp math, messages) without loading nets."""
    h = DemoHelper.__new__(DemoHelper)
    h.src_img = np.zeros((8, 8, 3), dtype=np.uint8)
    h.initial_label_map = np.zeros((8, 8), dtype=np.uint8)
    h.initial_colored_map = label_map_to_colored_mask(h.initial_label_map)
    h.src_texture_vectors = np.ones((1, 12, 512), dtype=np.float32)
    h.ref_texture_vectors = np.full((1, 12, 512), 3.0, dtype=np.float32)
    h.generated_with = []
    h._generate = lambda label_map, tv: (
        h.generated_with.append((np.array(label_map), np.array(tv)))
        or np.zeros((8, 8, 3), dtype=np.uint8)
    )
    return h


def test_texture_edit_lerps_only_chosen_regions():
    h = _stub_helper()
    _, msg = h.texture_edit(["hair", "eyes"], 0.5)
    assert "hair eyes" in msg
    label_map, tv = h.generated_with[-1]
    np.testing.assert_array_equal(label_map, h.initial_label_map)
    for name, idx in COMP2INDEX.items():
        expected = 2.0 if name in ("hair", "eyes") else 1.0
        np.testing.assert_allclose(tv[0, idx], expected)


def test_texture_edit_empty_regions_is_a_noop_with_message():
    h = _stub_helper()
    img, msg = h.texture_edit([], 1.0)
    assert "choose the region" in msg
    assert img is h.src_img
    assert h.generated_with == []


def test_shape_edit_uses_source_textures_and_edited_mask():
    h = _stub_helper()
    edited_map = np.full((8, 8), COMP2INDEX["hair"], dtype=np.uint8)
    _, msg = h.shape_edit(label_map_to_colored_mask(edited_map))
    assert "shape success" in msg
    label_map, tv = h.generated_with[-1]
    np.testing.assert_array_equal(label_map, edited_map)
    np.testing.assert_allclose(tv, h.src_texture_vectors)


def test_edit_mask_restarts_from_initial_map_like_the_reference():
    h = _stub_helper()
    strokes = np.zeros((8, 8, 4), dtype=np.uint8)
    strokes[0, 0, :3] = 255
    first, _ = h.edit_mask("hair", strokes)
    assert (colored_mask_to_label_map(first)[0, 0]) == COMP2INDEX["hair"]
    # a second confirm with different strokes does NOT keep the first edit
    strokes2 = np.zeros((8, 8, 4), dtype=np.uint8)
    strokes2[1, 1, :3] = 255
    second, _ = h.edit_mask("eyes", strokes2)
    out = colored_mask_to_label_map(second)
    assert out[1, 1] == COMP2INDEX["eyes"]
    assert out[0, 0] == 0  # reference semantics: restart from initial map
