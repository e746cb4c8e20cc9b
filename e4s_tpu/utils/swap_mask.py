"""Mask swap logic for face swapping.

Parity target: src/utils/swap_face_mask.py:33-83
(swap_head_mask_revisit_considerGlass). Pure numpy on 12-class label maps.
"""

from __future__ import annotations

import numpy as np

PLACEHOLDER = 99  # background placeholder magic number (ref: swap_face_mask.py:43)


def swap_head_mask(source: np.ndarray, target: np.ndarray, hair_first: bool = True):
    """Compose the swapped segmentation.

    Keeps target's background/neck/ear/earring/hair/glasses, overlays source's
    inner face (lip/brows/eyes/nose/skin/mouth) where the target isn't
    background, fills holes with skin. Returns (swapped 12-cls map, hole_map).

    ref: src/utils/swap_face_mask.py:33-83
    """
    source = np.asarray(source)
    target = np.asarray(target)
    res = np.zeros_like(target)

    target_regions = [np.equal(target, i) for i in range(12)]
    source_regions = [np.equal(source, i) for i in range(12)]

    res[target_regions[0]] = PLACEHOLDER
    res[target_regions[8]] = 8  # neck
    res[target_regions[7]] = 7  # ear
    res[target_regions[11]] = 11  # ear_rings
    if hair_first:
        res[target_regions[4]] = 4  # hair

    for cls in (1, 2, 3, 5, 6, 9):  # lip, brows, eyes, nose, skin, mouth
        res[np.logical_and(source_regions[cls], np.not_equal(res, PLACEHOLDER))] = cls

    if not hair_first:
        res[target_regions[4]] = 4

    res[target_regions[10]] = 10  # eye_glass of target

    if np.sum(res == 0) != 0:
        hole_map = 255 * (res == 0).astype(res.dtype)
        res[res == 0] = 6  # fill with skin
    else:
        hole_map = np.zeros_like(res)

    res[res == PLACEHOLDER] = 0
    return res, hole_map


# Alias matching the reference public name.
swap_head_mask_revisit_considerGlass = swap_head_mask


def swap_comp_style_vector(
    style_vectors1, style_vectors2, comp_indices, belowface_interpolation=False
):
    """Region-wise texture swap with ear/teeth fallbacks.

    style_vectors1: target [1,R,1280]; style_vectors2: source/driven.
    ref: scripts/face_swap.py:117-146
    """
    style_vectors = np.array(style_vectors1, copy=True)
    for comp_idx in comp_indices:
        style_vectors[:, comp_idx, :] = style_vectors2[:, comp_idx, :]

    # if no ear(7) region for source: average
    if np.sum(style_vectors2[:, 7, :]) == 0:
        style_vectors[:, 7, :] = (
            style_vectors1[:, 7, :] + style_vectors2[:, 7, :]
        ) / 2
    # if no teeth(9) region for source: keep target
    if np.sum(style_vectors2[:, 9, :]) == 0:
        style_vectors[:, 9, :] = style_vectors1[:, 9, :]
    # neck(8) interpolation
    if belowface_interpolation:
        style_vectors[:, 8, :] = (
            style_vectors1[:, 8, :] + style_vectors2[:, 8, :]
        ) / 2
    return style_vectors
