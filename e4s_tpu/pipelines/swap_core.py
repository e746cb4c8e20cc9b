"""Device-side core of the face-swap pipeline (everything jittable).

The reference pipeline (ref: scripts/face_swap.py:149-331) interleaves host
numpy with model calls. Here the whole compute path after parsing —

  style extraction (driven + target) -> texture swap w/ fallbacks ->
  LocalMLPs + latent_avg -> mask-guided synthesis -> stitch masks -> feather

— is a single jitted function, so one TPU launch produces the swapped face.
Host code (dlib alignment, PIL perspective paste) stays outside.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from e4s_tpu.models.net3 import Net3
from e4s_tpu.ops.morphology import create_masks
from e4s_tpu.ops.resize import bilinear_resize

# Texture regions taken from the driven/source face; the rest stay target.
# ref: scripts/face_swap.py:261 — all minus {background 0, hair 4, glass 10,
# earrings 11}.
SWAP_COMP_INDICES = tuple(sorted(set(range(12)) - {0, 4, 10, 11}))


def swap_style_vectors_device(
    target_sv: jnp.ndarray,
    driven_sv: jnp.ndarray,
    comp_indices: Sequence[int] = SWAP_COMP_INDICES,
    belowface_interpolation: bool = False,
) -> jnp.ndarray:
    """jnp version of swap_comp_style_vector (ref: face_swap.py:117-146),
    with the data-dependent ear/teeth fallbacks as jnp.where."""
    sv = target_sv
    idx = jnp.asarray(comp_indices)
    sv = sv.at[:, idx, :].set(driven_sv[:, idx, :])
    # ear(7): if source ear style is all-zero (region absent) -> average.
    # Signed sum (not |.|) to match the reference exactly
    # (ref: face_swap.py:132) and the host util swap_comp_style_vector.
    ear_absent = jnp.sum(driven_sv[:, 7, :]) == 0
    sv = sv.at[:, 7, :].set(
        jnp.where(
            ear_absent,
            (target_sv[:, 7, :] + driven_sv[:, 7, :]) / 2,
            sv[:, 7, :],
        )
    )
    # teeth(9): if absent in source -> keep target (ref: face_swap.py:136)
    teeth_absent = jnp.sum(driven_sv[:, 9, :]) == 0
    sv = sv.at[:, 9, :].set(
        jnp.where(teeth_absent, target_sv[:, 9, :], sv[:, 9, :])
    )
    if belowface_interpolation:
        sv = sv.at[:, 8, :].set((target_sv[:, 8, :] + driven_sv[:, 8, :]) / 2)
    return sv


def make_swap_core(net: Net3):
    """Returns swap_core(variables, driven, target, driven_onehot,
    target_onehot, swapped_onehot, latent_avg) -> swapped face [B,3,S,S]."""

    def swap_core(
        variables,
        driven,
        target,
        driven_onehot,
        target_onehot,
        swapped_onehot,
        latent_avg,
    ):
        driven_sv, _ = net.apply(
            variables, driven, driven_onehot, method=Net3.get_style_vectors
        )
        target_sv, _ = net.apply(
            variables, target, target_onehot, method=Net3.get_style_vectors
        )
        swapped_sv = swap_style_vectors_device(target_sv, driven_sv)
        codes = net.apply(
            variables, swapped_sv, latent_avg, method=Net3.cal_style_codes
        )
        B = driven.shape[0]
        struc = jnp.zeros((B, 512, 32, 32), driven.dtype)
        img, _, _ = net.apply(
            variables, struc, codes, swapped_onehot,
            method=Net3.gen_img, randomize_noise=False,
        )
        return img

    return swap_core


def reconstruct_core(net: Net3):
    """Encode + regenerate with the same mask (face_edit / optimization base)."""

    def recon(variables, img, onehot, latent_avg):
        sv, _ = net.apply(variables, img, onehot, method=Net3.get_style_vectors)
        codes = net.apply(variables, sv, latent_avg, method=Net3.cal_style_codes)
        B = img.shape[0]
        struc = jnp.zeros((B, 512, 32, 32), img.dtype)
        out, _, _ = net.apply(
            variables, struc, codes, onehot,
            method=Net3.gen_img, randomize_noise=False,
        )
        return out

    return recon


def _cv2_gaussian_taps(ksize: int):
    """cv2.getGaussianKernel(ksize, sigma=0): sigma from the ksize formula."""
    import numpy as np

    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    xs = np.arange(ksize) - (ksize - 1) / 2
    k = np.exp(-(xs**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def _gaussian_blur(x, ksize: int):
    """Separable Gaussian with zero ("constant") borders like cv2 on a padded
    alpha; x: [B,1,H,W]."""
    from jax import lax
    import numpy as np

    taps = jnp.asarray(_cv2_gaussian_taps(ksize), x.dtype)
    p = ksize // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (p, p), (0, 0)))
    kv = taps.reshape(ksize, 1, 1, 1)
    x = lax.conv_general_dilated(
        xp, kv, (1, 1), "VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"), feature_group_count=1,
    )
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (p, p)))
    kh = taps.reshape(1, ksize, 1, 1)
    return lax.conv_general_dilated(
        xp, kh, (1, 1), "VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"), feature_group_count=1,
    )


def stitch_foreground(swapped_face, target_img, swapped_label, hole_map,
                      outer_dilation: int = 5):
    """Build the foreground mask and alpha-feather the swap onto the target.

    Device version of the default (non-Laplacian) stitch
    (ref: scripts/face_swap.py:276-311): background = classes {0, 11, 4},
    holes are foreground, dilate by ``outer_dilation``, bilinear-resize to
    out res, then the smooth_face_boundry feather (ref: face_swap.py:81-97):
    erode by (2r+1)^2 and Gaussian-blur (sigmaX=0 -> cv2 ksize formula)
    before alpha-compositing.
    swapped_face/target_img: [B,3,S,S] in [-1,1]; swapped_label: [B,1,h,w];
    hole_map: [B,1,h,w] (255 at holes).
    """
    from e4s_tpu.ops.morphology import erosion
    import numpy as np

    mask_bg = (
        (swapped_label == 0) | (swapped_label == 11) | (swapped_label == 4)
    )
    is_fg = ~mask_bg
    is_fg = is_fg | (hole_map == 255)
    fg = is_fg.astype(swapped_face.dtype)
    _, _, full_mask = create_masks(fg, outer_dilation=outer_dilation)
    S = swapped_face.shape[-1]
    full_mask = bilinear_resize(full_mask, (S, S))
    alpha = jnp.clip(full_mask, 0.0, 1.0)
    if outer_dilation != 0:
        ksize = 2 * outer_dilation + 1
        k = np.ones((ksize, ksize), np.float32)
        alpha = erosion(alpha, k)
        alpha = jnp.clip(_gaussian_blur(alpha, ksize), 0.0, 1.0)
    return swapped_face * alpha + target_img * (1.0 - alpha)
