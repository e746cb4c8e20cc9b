"""FFHQ-recipe batch face alignment CLI.

Parity target: src/utils/ffhq_align.py (the FFHQ dataset-prep aligner,
NVlabs recipe). Reuses the quad geometry already in
e4s_tpu/utils/alignment.py and adds the FFHQ-only steps the E4S default
cropper omits: reflect-padding with a blurred feather toward the median
colour, and the separate transform_size -> output_size downscale
(ref: src/utils/ffhq_align.py:11-88).

Landmarks come from (in order of availability):
  1. ``--landmarks DIR``: per-image ``<stem>.npy`` / ``.json`` files of
     [68, 2] points (precomputed; no extra deps),
  2. the ``face_alignment`` package if imported successfully,
  3. dlib via e4s_tpu.utils.alignment.get_landmark.
This is host-side preprocessing (pure numpy/PIL) — it feeds the TPU
pipeline but has no device work of its own.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
import PIL.Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from e4s_tpu.utils.alignment import landmarks_to_transform  # noqa: E402


def image_align(
    src_file,
    dst_file,
    face_landmarks,
    output_size: int = 256,
    transform_size: int = 1024,
    enable_padding: bool = True,
):
    """Align one face crop the FFHQ way. ref: src/utils/ffhq_align.py:11-88."""
    lm = np.asarray(face_landmarks, dtype=np.float64)[:, :2]
    c, x, y = landmarks_to_transform(lm)
    quad = np.stack([c - x - y, c - x + y, c + x + y, c + x - y])
    qsize = np.hypot(*x) * 2

    if not os.path.isfile(src_file):
        print(f"Cannot find source image {src_file}")
        return None
    img = PIL.Image.open(src_file).convert("RGB")

    # Shrink.
    shrink = int(np.floor(qsize / output_size * 0.5))
    if shrink > 1:
        rsize = (
            int(np.rint(float(img.size[0]) / shrink)),
            int(np.rint(float(img.size[1]) / shrink)),
        )
        img = img.resize(rsize, PIL.Image.LANCZOS)
        quad /= shrink
        qsize /= shrink

    # Crop.
    border = max(int(np.rint(qsize * 0.1)), 3)
    crop = (
        int(np.floor(min(quad[:, 0]))),
        int(np.floor(min(quad[:, 1]))),
        int(np.ceil(max(quad[:, 0]))),
        int(np.ceil(max(quad[:, 1]))),
    )
    crop = (
        max(crop[0] - border, 0),
        max(crop[1] - border, 0),
        min(crop[2] + border, img.size[0]),
        min(crop[3] + border, img.size[1]),
    )
    if crop[2] - crop[0] < img.size[0] or crop[3] - crop[1] < img.size[1]:
        img = img.crop(crop)
        quad -= crop[0:2]

    # Pad (reflect + feather toward the median colour; FFHQ-only step).
    pad = (
        int(np.floor(min(quad[:, 0]))),
        int(np.floor(min(quad[:, 1]))),
        int(np.ceil(max(quad[:, 0]))),
        int(np.ceil(max(quad[:, 1]))),
    )
    pad = (
        max(-pad[0] + border, 0),
        max(-pad[1] + border, 0),
        max(pad[2] - img.size[0] + border, 0),
        max(pad[3] - img.size[1] + border, 0),
    )
    if enable_padding and max(pad) > border - 4:
        import scipy.ndimage

        pad = np.maximum(pad, int(np.rint(qsize * 0.3)))
        arr = np.pad(
            np.float32(img),
            ((pad[1], pad[3]), (pad[0], pad[2]), (0, 0)),
            "reflect",
        )
        h, w, _ = arr.shape
        yy, xx, _ = np.ogrid[:h, :w, :1]
        with np.errstate(divide="ignore", invalid="ignore"):
            mask = np.maximum(
                1.0
                - np.minimum(np.float32(xx) / pad[0], np.float32(w - 1 - xx) / pad[2]),
                1.0
                - np.minimum(np.float32(yy) / pad[1], np.float32(h - 1 - yy) / pad[3]),
            )
        mask = np.nan_to_num(mask, nan=1.0, posinf=1.0, neginf=1.0)
        blur = qsize * 0.02
        arr += (scipy.ndimage.gaussian_filter(arr, [blur, blur, 0]) - arr) * np.clip(
            mask * 3.0 + 1.0, 0.0, 1.0
        )
        arr += (np.median(arr, axis=(0, 1)) - arr) * np.clip(mask, 0.0, 1.0)
        img = PIL.Image.fromarray(np.uint8(np.clip(np.rint(arr), 0, 255)), "RGB")
        quad += pad[:2]

    # Transform.
    img = img.transform(
        (transform_size, transform_size),
        PIL.Image.QUAD,
        (quad + 0.5).flatten(),
        PIL.Image.BILINEAR,
    )
    if output_size < transform_size:
        img = img.resize((output_size, output_size), PIL.Image.LANCZOS)

    if dst_file:
        img.save(dst_file, "PNG")
    return img


def _load_precomputed(landmark_dir, img_name):
    stem = os.path.splitext(img_name)[0]
    for ext in (".npy", ".json"):
        p = os.path.join(landmark_dir, stem + ext)
        if os.path.isfile(p):
            if ext == ".npy":
                return [np.load(p)]
            with open(p) as f:
                return [np.asarray(json.load(f))]
    return None


def _detect(raw_img_path):
    try:
        import face_alignment

        fa = face_alignment.FaceAlignment(
            face_alignment.LandmarksType.TWO_D, flip_input=False
        )
        return fa.get_landmarks(raw_img_path)
    except ImportError:
        pass
    from e4s_tpu.utils.alignment import get_landmark

    try:
        import dlib  # noqa: F401

        lm = get_landmark(raw_img_path)
        return [lm] if lm is not None else None
    except ImportError:
        raise SystemExit(
            "no landmark source: pass --landmarks DIR with precomputed "
            "<stem>.npy/.json files, or install face_alignment / dlib"
        )


def main():
    parser = argparse.ArgumentParser(description="FFHQ-recipe face aligner")
    parser.add_argument("-s", "--src", default="./raw_images")
    parser.add_argument("-d", "--dst", default="./aligned_images")
    parser.add_argument("-o", "--output_size", default=256, type=int)
    parser.add_argument("-t", "--transform_size", default=1024, type=int)
    parser.add_argument("--no_padding", action="store_false", dest="padding")
    parser.add_argument(
        "--landmarks", default=None,
        help="directory of precomputed [68,2] landmark files (<stem>.npy/.json)",
    )
    args = parser.parse_args()

    os.makedirs(args.dst, exist_ok=True)
    for img_name in sorted(os.listdir(args.src)):
        raw = os.path.join(args.src, img_name)
        faces = (
            _load_precomputed(args.landmarks, img_name)
            if args.landmarks
            else _detect(raw)
        )
        if not faces:
            print(f"no face/landmarks for {img_name}, skipped")
            continue
        for lm in faces:
            out = os.path.join(args.dst, f"align-{img_name}")
            image_align(
                raw, out, lm, args.output_size, args.transform_size, args.padding
            )
            print(f"aligned {img_name} -> {out}")


if __name__ == "__main__":
    main()
