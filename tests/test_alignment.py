"""Face-alignment geometry tests (host-side, no dlib).

Oracles are ANALYTIC, derived by hand from the FFHQ alignment definition the
reference implements (src/utils/alignmengt.py:97-238): synthetic landmark
constellations whose crop frame can be computed in closed form, axis-aligned
quads whose QUAD transform degenerates to crop+resize, and perspective
coefficient checks via the projective mapping formula.
"""

import os

import numpy as np
import pytest

from e4s_tpu.utils.alignment import (
    calc_alignment_coefficients,
    crop_and_align_face,
    crop_image,
    crop_faces,
    landmarks_to_transform,
)


def synthetic_landmarks(eye_l=(300, 300), eye_r=(500, 300),
                        mouth_l=(340, 450), mouth_r=(460, 450)):
    """68-point array where only the eye/mouth points used by the transform
    are meaningful."""
    lm = np.zeros((68, 2), np.float64)
    lm[36:42] = eye_l
    lm[42:48] = eye_r
    lm[48] = mouth_l
    lm[54] = mouth_r
    # fill remaining mouth-outer points away from l/r so means stay simple
    for i in range(49, 54):
        lm[i] = mouth_l
    for i in range(55, 60):
        lm[i] = mouth_r
    return lm


def test_landmarks_to_transform_analytic():
    """Horizontal eyes at y=300 (centres 300/500), mouth at y=450:
      eye_avg=(400,300), eye_to_eye=(200,0), eye_to_mouth=(0,150)
      x = (200,0) - flipud((0,150))*[-1,1] = (200,0)+(150,0) = (350,0)
      |x| -> max(2*200, 1.8*150) = 400  =>  x=(400,0), y=(0,400)
      c = (400,300) + 0.1*(0,150) = (400,315)
    """
    c, x, y = landmarks_to_transform(synthetic_landmarks())
    np.testing.assert_allclose(c, [400.0, 315.0])
    np.testing.assert_allclose(x, [400.0, 0.0])
    np.testing.assert_allclose(y, [0.0, 400.0])


def test_landmarks_to_transform_rotated():
    """Rotating the constellation 90 deg rotates the crop frame with it."""
    lm = synthetic_landmarks()
    # rotate all points 90 deg CCW about the origin: (x,y) -> (-y,x)
    rot = np.stack([-lm[:, 1], lm[:, 0]], axis=1)
    c, x, y = landmarks_to_transform(rot)
    c0, x0, y0 = landmarks_to_transform(lm)
    np.testing.assert_allclose(c, [-c0[1], c0[0]], atol=1e-9)
    np.testing.assert_allclose(x, [-x0[1], x0[0]], atol=1e-9)
    np.testing.assert_allclose(y, [-y0[1], y0[0]], atol=1e-9)


def test_crop_image_axis_aligned_quad_is_crop_resize():
    """An axis-aligned quad makes the PIL QUAD transform equivalent to a
    plain box crop + resize (up to resampling): verify on a blockwise image
    where bilinear boundary effects vanish."""
    from PIL import Image

    rng = np.random.RandomState(0)
    blocks = rng.randint(0, 255, (16, 16, 3), np.uint8)
    arr = np.kron(blocks, np.ones((64, 64, 1), np.uint8))  # 1024x1024
    img = Image.fromarray(arr)

    # quad corners in the order the FFHQ code builds them:
    # (c-x-y, c-x+y, c+x+y, c+x-y) = TL, BL, BR, TR
    x0, y0, s = 128, 256, 512
    quad = np.array(
        [[x0, y0], [x0, y0 + s], [x0 + s, y0 + s], [x0 + s, y0]], np.float64
    )
    out = crop_image(img, 256, quad)
    assert out.size == (256, 256)

    want = img.crop((x0, y0, x0 + s, y0 + s)).resize((256, 256), Image.BILINEAR)
    got, wnt = np.asarray(out, np.int32), np.asarray(want, np.int32)
    # interiors of the 64px blocks are flat -> any resampler agrees there
    # (block boundaries may differ by the QUAD transform's half-pixel
    # convention, ref alignmengt.py:131 quad+0.5)
    inner = np.abs(got - wnt) <= 1
    assert inner.mean() > 0.85
    # exact agreement at every downsampled block centre (8 blocks of 32px)
    centers = np.arange(16, 256, 32)
    np.testing.assert_array_equal(
        got[np.ix_(centers, centers)], wnt[np.ix_(centers, centers)]
    )


def test_crop_image_shrink_path():
    """qsize >> output_size triggers the LANCZOS pre-shrink (ref :119-127);
    result must still be output_size^2 and match the unshrunk content."""
    from PIL import Image

    arr = np.zeros((2048, 2048, 3), np.uint8)
    arr[:1024] = [200, 30, 30]
    arr[1024:] = [30, 30, 200]
    img = Image.fromarray(arr)
    quad = np.array(
        [[0, 0], [0, 2048], [2048, 2048], [2048, 0]], np.float64
    )
    out = crop_image(img, 256, quad)
    assert out.size == (256, 256)
    o = np.asarray(out)
    assert (o[:120, :, 0] > 150).all() and (o[136:, :, 2] > 150).all()


def test_calc_alignment_coefficients_affine_and_projective():
    image_size = 64.0
    # pa: destination square corners; pb: source quad corners.
    pa = [[0, 0], [0, image_size], [image_size, image_size], [image_size, 0]]

    def apply(coeffs, pt):
        a, b, c, d, e, f, g, h = coeffs
        x, y = pt
        den = g * x + h * y + 1.0
        return [(a * x + b * y + c) / den, (d * x + e * y + f) / den]

    # affine case: pure scale+translate quad
    pb = [[10, 20], [10, 84], [74, 84], [74, 20]]
    coeffs = calc_alignment_coefficients(pa, pb)
    np.testing.assert_allclose(coeffs[6:], 0.0, atol=1e-9)  # g=h=0
    for p_dst, p_src in zip(pa, pb):
        np.testing.assert_allclose(apply(coeffs, p_dst), p_src, atol=1e-6)

    # genuinely projective case: non-parallel quad
    pb = [[5, 3], [12, 90], [80, 70], [70, 10]]
    coeffs = calc_alignment_coefficients(pa, pb)
    assert np.abs(coeffs[6:]).max() > 1e-8
    for p_dst, p_src in zip(pa, pb):
        np.testing.assert_allclose(apply(coeffs, p_dst), p_src, atol=1e-5)


def test_crop_faces_smoothing_and_quads(tmp_path):
    """Precomputed-landmark batch path: quads follow the analytic frame and
    temporal gaussian smoothing averages jittered centres."""
    from PIL import Image

    paths = []
    for i in range(3):
        p = str(tmp_path / f"f{i}.png")
        Image.fromarray(
            np.full((1024, 1024, 3), 40 * (i + 1), np.uint8)
        ).save(p)
        paths.append((f"f{i}", p))

    base = synthetic_landmarks()
    jitter = [np.array([0.0, 0.0]), np.array([40.0, 0.0]), np.array([0.0, 0.0])]
    lms = [base + j for j in jitter]

    crops, origs, quads = crop_faces(
        256, paths, scale=1.0, landmarks=lms, center_sigma=0.0
    )
    assert len(crops) == 3 and crops[0].size == (256, 256)
    c0, x0, y0 = landmarks_to_transform(lms[0])
    np.testing.assert_allclose(quads[0][0], c0 - x0 - y0)

    # with smoothing, the jittered middle frame is pulled toward neighbours
    _, _, quads_s = crop_faces(
        256, paths, scale=1.0, landmarks=lms, center_sigma=3.0
    )
    mid_raw = quads[1].mean(axis=0)
    mid_smooth = quads_s[1].mean(axis=0)
    ends = (quads[0].mean(axis=0) + quads[2].mean(axis=0)) / 2
    assert np.linalg.norm(mid_smooth - ends) < np.linalg.norm(mid_raw - ends)


def test_crop_and_align_face_inverse_paste(tmp_path):
    """End-to-end: the inverse perspective coefficients returned for a crop
    must map the output square's corners back onto the crop quad."""
    from PIL import Image

    p = str(tmp_path / "face.png")
    rng = np.random.RandomState(1)
    Image.fromarray(rng.randint(0, 255, (1024, 1024, 3), np.uint8)).save(p)

    lms = [synthetic_landmarks()]
    crops, origs, quads, inv = crop_and_align_face(
        [("face", p)], image_size=512, landmarks=lms
    )
    assert crops[0].size == (512, 512)
    coeffs = inv[0]

    def apply(coeffs, pt):
        a, b, c, d, e, f, g, h = coeffs
        x, y = pt
        den = g * x + h * y + 1.0
        return np.array([(a * x + b * y + c) / den, (d * x + e * y + f) / den])

    square = [[0, 0], [0, 512], [512, 512], [512, 0]]
    for corner, qpt in zip(square, quads[0] + 0.5):
        np.testing.assert_allclose(apply(coeffs, qpt), corner, atol=1e-4)


def test_face_swapper_need_crop_with_landmarks(tmp_path):
    """The CLI-reachable crop path (need_crop=True + precomputed landmarks)
    runs the full swap and pastes back into the original frame."""
    import types

    from e4s_tpu.pipelines.face_swap import FaceSwapper
    from tests.test_pipelines import FakeParser

    from PIL import Image

    rng = np.random.RandomState(0)
    paths = []
    for name in ("source", "target"):
        p = str(tmp_path / f"{name}.png")
        Image.fromarray(
            (rng.rand(1024, 1024, 3) * 255).astype(np.uint8)
        ).save(p)
        paths.append(p)

    opts = types.SimpleNamespace(
        num_seg_cls=12, out_size=64, remaining_layer_idx=7, n_styles=10,
        start_from_latent_avg=True, learn_in_w=False, train_G=True,
        checkpoint_path=None, faceParser_name="default", lap_bld=False,
        output_dir=str(tmp_path), verbose=False,
    )
    swapper = FaceSwapper(opts, parser=FakeParser())
    lms = [synthetic_landmarks(), synthetic_landmarks(eye_l=(320, 320),
                                                      eye_r=(520, 320),
                                                      mouth_l=(360, 470),
                                                      mouth_r=(480, 470))]
    result = swapper.swap(
        paths[0], paths[1], save_dir=str(tmp_path / "out"),
        need_crop=True, landmarks=lms,
    )
    # pasted back into the ORIGINAL frame -> original size, RGBA composite
    assert result.size == (1024, 1024)


def test_ffhq_align_image_align(tmp_path):
    """scripts/ffhq_align.image_align: FFHQ recipe (pad+feather variant of the
    default cropper) produces the requested output size and stays in range."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ffhq_align",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "ffhq_align.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from PIL import Image

    rng = np.random.RandomState(0)
    src = tmp_path / "face.png"
    Image.fromarray(rng.randint(0, 255, (800, 800, 3), np.uint8)).save(src)
    lm = synthetic_landmarks()
    out = mod.image_align(
        str(src), str(tmp_path / "out.png"), lm,
        output_size=128, transform_size=256,
    )
    assert out.size == (128, 128)
    assert (tmp_path / "out.png").exists()
    # landmarks near the image edge force the reflect-pad + feather path
    lm_edge = synthetic_landmarks(
        eye_l=(60, 60), eye_r=(260, 60), mouth_l=(100, 210), mouth_r=(220, 210)
    )
    out2 = mod.image_align(
        str(src), None, lm_edge, output_size=128, transform_size=256,
    )
    assert out2.size == (128, 128)
