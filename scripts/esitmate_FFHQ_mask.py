"""Estimate BiSeNet masks over an FFHQ images_1024 tree.

Parity target: scripts/esitmate_FFHQ_mask.py (the reference's filename typo
is kept as an alias below for CLI parity).
"""

import glob
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = ArgumentParser()
    parser.add_argument('--faceParser_name', default='default', type=str)
    parser.add_argument('--faceParsing_ckpt', type=str,
                        default="./pretrained_ckpts/face_parsing/79999_iter.pth")
    parser.add_argument('--segnext_config', default='', type=str)
    parser.add_argument('--FFHQ_root', type=str, default="./data/FFHQ")
    parser.add_argument('--save_vis', action='store_true')
    parser.add_argument('--seg12', action='store_true')
    parser.add_argument('--batch_size', type=int, default=8,
                        help='TPU batch for the parser (the reference is '
                             'single-image; batching is the TPU win here)')
    args = parser.parse_args()

    from PIL import Image

    import jax.numpy as jnp

    from e4s_tpu.models.bisenet import face_parsing_demo
    from e4s_tpu.pipelines.model_io import load_face_parser
    from e4s_tpu.utils.img_utils import vis_mask_in_color

    class _Opts:
        out_size = 1024

    parser_model = load_face_parser(_Opts(), args.faceParsing_ckpt)

    mask_save_dir = os.path.join(args.FFHQ_root, "BiSeNet_mask")
    os.makedirs(mask_save_dir, exist_ok=True)
    if args.save_vis:
        vis_dir = os.path.join(args.FFHQ_root, "BiSeNet_mask_vis")
        os.makedirs(vis_dir, exist_ok=True)

    img_dirs = sorted(os.listdir(os.path.join(args.FFHQ_root, "images_1024")))
    for d in img_dirs:
        print(f"Estimating {d} directory")
        os.makedirs(os.path.join(mask_save_dir, d), exist_ok=True)
        if args.save_vis:
            os.makedirs(os.path.join(vis_dir, d), exist_ok=True)
        imgs = sorted(
            glob.glob(os.path.join(args.FFHQ_root, "images_1024", d, "*.png"))
        )
        for i in range(0, len(imgs), args.batch_size):
            chunk = imgs[i : i + args.batch_size]
            batch = np.stack(
                [
                    np.transpose(
                        np.asarray(
                            Image.open(p).convert("RGB"), np.float32
                        ) / 255.0,
                        (2, 0, 1),
                    )
                    for p in chunk
                ]
            )
            masks = face_parsing_demo(
                parser_model, jnp.asarray(batch), convert_to_seg12=args.seg12
            )
            for p, m in zip(chunk, masks):
                Image.fromarray(m).save(
                    os.path.join(mask_save_dir, d, os.path.basename(p))
                )
                if args.save_vis:
                    Image.fromarray(vis_mask_in_color(m)).save(
                        os.path.join(vis_dir, d, os.path.basename(p))
                    )


if __name__ == "__main__":
    main()
