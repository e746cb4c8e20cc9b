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
import numpy as np

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


def swap_head_mask_device(source, target, hair_first: bool = True):
    """jnp twin of utils.swap_mask.swap_head_mask (same sequential overwrite
    semantics; ref: src/utils/swap_face_mask.py:33-83). Pure elementwise, so
    it fuses into the e2e swap program instead of a host round-trip.

    source/target: int label maps [..., H, W]. Returns (swapped, hole_map).
    """
    PLACEHOLDER = 99
    res = jnp.zeros_like(target)
    res = jnp.where(target == 0, PLACEHOLDER, res)
    res = jnp.where(target == 8, 8, res)    # neck
    res = jnp.where(target == 7, 7, res)    # ear
    res = jnp.where(target == 11, 11, res)  # ear_rings
    if hair_first:
        res = jnp.where(target == 4, 4, res)
    for cls in (1, 2, 3, 5, 6, 9):  # lip, brows, eyes, nose, skin, mouth
        res = jnp.where((source == cls) & (res != PLACEHOLDER), cls, res)
    if not hair_first:
        res = jnp.where(target == 4, 4, res)
    res = jnp.where(target == 10, 10, res)  # eye_glass of target
    # hole handling: when res has no zeros the where is a no-op and hole_map
    # is all-zero — exactly the numpy branch semantics
    hole_map = (255 * (res == 0)).astype(res.dtype)
    res = jnp.where(res == 0, 6, res)  # fill with skin
    res = jnp.where(res == PLACEHOLDER, 0, res)
    return res, hole_map


# face-parsing.PyTorch 19-cls -> detailed 12-cls, as a gather LUT
# (ref: src/datasets/dataset.py:60-108; mirrors
# datasets.dataset.ffhq_mask_to_faceparser_mask_detailed)
_SEG19_TO12 = [0] * 19
for _srcs, _dst in [
    ([12, 13], 1), ([2, 3], 2), ([4, 5], 3), ([17], 4), ([10], 5),
    ([1], 6), ([7, 8], 7), ([14], 8), ([11], 9), ([6], 10), ([9], 11),
]:
    for _s in _srcs:
        _SEG19_TO12[_s] = _dst


def seg19_to_12_device(seg19):
    """19-cls labels -> detailed 12-cls on device (one gather)."""
    lut = jnp.asarray(_SEG19_TO12, dtype=seg19.dtype)
    return lut[seg19]


# CelebAMask-HQ 19-cls -> detailed 12-cls (the SegNeXt parser's taxonomy;
# mirrors datasets.dataset.celebahq_mask_to_faceparser_mask_detailed,
# ref: src/datasets/dataset.py:153-209)
_CELEBA19_TO12 = [0] * 19
for _srcs, _dst in [
    ([11, 12], 1), ([6, 7], 2), ([4, 5], 3), ([13], 4), ([2], 5),
    ([1], 6), ([8, 9], 7), ([17], 8), ([10], 9), ([3], 10), ([15], 11),
]:
    for _s in _srcs:
        _CELEBA19_TO12[_s] = _dst


def celeba19_to_12_device(seg19):
    """CelebA-order 19-cls labels -> detailed 12-cls on device."""
    lut = jnp.asarray(_CELEBA19_TO12, dtype=seg19.dtype)
    return lut[seg19]


def parse12_device(
    parser_model, parser_variables, img01, parser_size=512,
    taxonomy: str = "ffhq19",
):
    """Face parse + 19->12 conversion, fully on device.

    img01: [B,3,S,S] float in [0,1] -> int32 12-cls labels [B,ps,ps].
    ``taxonomy`` selects the parser family: "ffhq19" = BiSeNet
    (face-parsing.PyTorch label order, ref: face_parsing_demo.py:127-209),
    "celeba19" = SegNeXt (CelebA order, ref: face_parsing_demo.py:200-207).
    """
    if taxonomy == "celeba19":
        from e4s_tpu.models.segnext import segnext_parse19_device

        seg19 = segnext_parse19_device(
            parser_model, parser_variables, img01, parser_size
        )
        return celeba19_to_12_device(seg19)

    from e4s_tpu.models.bisenet import SEG_MEAN, SEG_STD, bicubic_downsample

    if img01.shape[-1] >= parser_size:
        pim = bicubic_downsample(img01, img01.shape[-1] // parser_size)
    else:
        pim = bilinear_resize(img01, (parser_size, parser_size))
    pim = jnp.clip(pim, 0.0, 1.0)
    pim = (pim - jnp.asarray(SEG_MEAN)) / jnp.asarray(SEG_STD)
    seg_out, _, _ = parser_model.apply(parser_variables, pim)
    return seg19_to_12_device(jnp.argmax(seg_out, axis=1).astype(jnp.int32))


def parse12_host(parser, arr01) -> np.ndarray:
    """Host-side parse + 19->12 conversion for any parser wrapper, selecting
    the taxonomy converter by the parser's ``taxonomy`` attribute
    (ref: face_parsing_demo.py:188-209)."""
    if getattr(parser, "taxonomy", "ffhq19") == "celeba19":
        from e4s_tpu.datasets.dataset import (
            celebahq_mask_to_faceparser_mask_detailed,
        )

        seg = np.asarray(parser(jnp.asarray(arr01))).astype(np.uint8)
        return np.stack(
            [celebahq_mask_to_faceparser_mask_detailed(s) for s in seg]
        )
    from e4s_tpu.models.bisenet import face_parsing_demo

    return face_parsing_demo(parser, jnp.asarray(arr01), True)


def _img_to01(img):
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32) / 255.0
    return img


def make_swap_e2e(
    net: Net3, parser_model, parser_size: int = 512,
    taxonomy: str = "ffhq19", lap_bld: bool = False,
):
    """Single-program end-to-end swap: uint8 images in, uint8 image out.

    The axon host<->device link runs ~20 MB/s, so the e2e swap is transfer
    bound unless everything between the two images and the final pixel lives
    on device. This fuses: normalize -> BiSeNet parse (both faces, one
    batched pass) -> 19->12 LUT -> mask swap -> style extraction (batched)
    -> texture swap -> masked synthesis -> stitch -> uint8.

    ``lap_bld`` selects the Laplacian multi-band blend stitch (the
    reference's --lap_bld, ref: scripts/face_swap.py:283-311 + the cv2
    pyramid at src/utils/multi_band_blending.py:52-75) instead of the
    Gaussian-feather paste; it is part of the same fused program (BASELINE
    config #3 runs entirely on device).

    Returns fn(variables, parser_variables, src_u8, tgt_u8, latent_avg)
    -> (uint8 image [B,3,S,S], swapped 12-cls labels [B,h,w], hole map,
        driven 12-cls labels [B,h,w], target 12-cls labels [B,h,w]) — the
    label maps are tiny uint8-sized downloads used by verbose dumps.
    src_u8/tgt_u8: [B,3,S,S] uint8 (or float in [0,1]).
    """
    def swap_e2e(variables, parser_variables, src, tgt, latent_avg):
        B = src.shape[0]
        img01 = jnp.concatenate([_img_to01(src), _img_to01(tgt)], axis=0)
        seg12 = parse12_device(
            parser_model, parser_variables, img01, parser_size,
            taxonomy=taxonomy,
        )
        d_label, t_label = seg12[:B], seg12[B:]
        swapped_label, hole_map = swap_head_mask_device(d_label, t_label)

        dt = latent_avg.dtype
        cls = jnp.arange(net.num_seg_cls, dtype=jnp.int32)[None, :, None, None]
        d_oh = (d_label[:, None] == cls).astype(dt)
        t_oh = (t_label[:, None] == cls).astype(dt)
        s_oh = (swapped_label[:, None] == cls).astype(dt)

        imgs = (img01 * 2.0 - 1.0).astype(dt)
        sv, _ = net.apply(
            variables,
            imgs,
            jnp.concatenate([d_oh, t_oh], axis=0),
            method=Net3.get_style_vectors,
        )
        driven_sv, target_sv = sv[:B], sv[B:]
        swapped_sv = swap_style_vectors_device(target_sv, driven_sv)
        codes = net.apply(
            variables, swapped_sv, latent_avg, method=Net3.cal_style_codes
        )
        struc = jnp.zeros((B, 512, 32, 32), dt)
        face, _, _ = net.apply(
            variables, struc, codes, s_oh,
            method=Net3.gen_img, randomize_noise=False,
        )

        if lap_bld:
            # device twin of the staged --lap_bld branch (bit-matching the
            # host path in pipelines/face_swap.py): content/border masks from
            # the swapped labels, feathered paste, 10-level Laplacian blend
            # in [0,255] f32
            label_t = swapped_label[:, None]
            hole_t = hole_map[:, None].astype(jnp.int32)
            mask_bg = (label_t == 0) | (label_t == 11) | (label_t == 4)
            fg = (~mask_bg | (hole_t == 255)).astype(jnp.float32)
            content_mask, border_mask, _ = create_masks(
                fg, outer_dilation=5, operation="expansion"
            )
            S = src.shape[-1]
            content_mask = bilinear_resize(content_mask, (S, S))
            border_mask = bilinear_resize(border_mask, (S, S))
            swapped01 = (face.astype(jnp.float32) + 1.0) / 2.0 * 255.0
            target255 = img01[B:].astype(jnp.float32) * 255.0
            pasted = swapped01 * content_mask + target255 * (1 - content_mask)
            from e4s_tpu.ops.blending import blend_images

            blended = blend_images(
                target255, pasted, jnp.repeat(border_mask, 3, axis=1)
            )
            out_u8 = jnp.clip(blended, 0.0, 255.0).astype(jnp.uint8)
        else:
            stitched = stitch_foreground(
                face, imgs[B:], swapped_label[:, None],
                hole_map[:, None].astype(jnp.int32),
            )
            # truncating cast matches utils.img_utils.tensor2im exactly
            out01 = jnp.clip(
                (stitched.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0
            )
            out_u8 = (out01 * 255.0).astype(jnp.uint8)
        return out_u8, swapped_label, hole_map, d_label, t_label

    return swap_e2e


def make_swap_core(net: Net3, from_labels: bool = False):
    """Returns swap_core(variables, driven, target, driven_onehot,
    target_onehot, swapped_onehot, latent_avg) -> swapped face [B,3,S,S].

    With ``from_labels`` the three mask arguments are integer label maps
    [B,1,H,W] and the one-hots are built on device — a [B,1,1024,1024] uint8
    upload is ~1 MB vs ~50 MB for a [B,12,1024,1024] f32 one-hot, and the
    host->device link (a tunnel on this deployment) is the e2e bottleneck.
    """

    def swap_core(
        variables,
        driven,
        target,
        driven_onehot,
        target_onehot,
        swapped_onehot,
        latent_avg,
    ):
        if from_labels:
            R = net.num_seg_cls
            cls = jnp.arange(R, dtype=jnp.int32)[None, :, None, None]
            dt = driven.dtype
            driven_onehot = (driven_onehot == cls).astype(dt)
            target_onehot = (target_onehot == cls).astype(dt)
            swapped_onehot = (swapped_onehot == cls).astype(dt)
        # one batched encoder pass for both faces (the encoder is strictly
        # per-sample: InstanceNorm + masked pooling), halving dispatches and
        # doubling the 256^2 trunk's batch utilisation
        nb = driven.shape[0]
        sv, _ = net.apply(
            variables,
            jnp.concatenate([driven, target], axis=0),
            jnp.concatenate([driven_onehot, target_onehot], axis=0),
            method=Net3.get_style_vectors,
        )
        driven_sv, target_sv = sv[:nb], sv[nb:]
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
