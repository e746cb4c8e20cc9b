"""Face swapping CLI — arg-compatible with the reference scripts/face_swap.py.

Usage: python scripts/face_swap.py --source ... --target ... [--lap_bld] ...
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from e4s_tpu.options.swap_options import SwapFacePipelineOptions
    from e4s_tpu.pipelines.face_swap import FaceSwapper

    opts = SwapFacePipelineOptions().parse()

    target_mask_seg12 = None
    if len(opts.target_mask) != 0:
        from PIL import Image

        from e4s_tpu.datasets.dataset import (
            celebahq_mask_to_faceparser_mask_detailed,
        )

        target_mask = Image.open(opts.target_mask).convert("L")
        target_mask_seg12 = celebahq_mask_to_faceparser_mask_detailed(
            np.asarray(target_mask)
        )

    reenactor = restorer = None
    try:
        from e4s_tpu.pipelines.reenact import try_build_reenactor_restorer

        reenactor, restorer = try_build_reenactor_restorer(opts)
    except Exception as e:  # aux models optional
        print(f"[e4s_tpu] re-enactment/restoration unavailable ({e}); "
              "falling back to direct source texture")

    landmarks = None
    if getattr(opts, "landmarks_npz", ""):
        with np.load(opts.landmarks_npz) as z:
            landmarks = [z[k] for k in z.files]

    swapper = FaceSwapper(opts, reenactor=reenactor, restorer=restorer)
    swapper.swap(
        opts.source,
        opts.target,
        save_dir=opts.output_dir,
        target_mask=target_mask_seg12,
        need_crop=getattr(opts, "need_crop", False),
        only_target_crop=getattr(opts, "only_target_crop", False),
        landmarks=landmarks,
        verbose=opts.verbose,
    )
    print(f"Saved swap result to {opts.output_dir}")


if __name__ == "__main__":
    main()
