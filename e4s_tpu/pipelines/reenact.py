"""Re-enactment (FaceVid2Vid) + restoration (GPEN) builders for the swap CLI.

ref: scripts/face_swap.py:340-355. Returns (reenactor, restorer) callables on
[1,3,H,W] float [0,1] arrays, or raises if checkpoints/models are missing —
the CLI then falls back to using the source texture directly.
"""

from __future__ import annotations

import os


def try_build_reenactor_restorer(opts):
    from e4s_tpu.models.facevid2vid import build_reenactor
    from e4s_tpu.models.gpen import build_restorer

    cfg = "./pretrained_ckpts/facevid2vid/vox-256.yaml"
    ckpt = "./pretrained_ckpts/facevid2vid/00000189-checkpoint.pth.tar"
    if not os.path.exists(ckpt):
        # a random-init re-enactor only corrupts the driven face (and costs
        # minutes of compile); the CLI's direct-source fallback is strictly
        # better, so treat missing weights as "unavailable"
        raise FileNotFoundError(ckpt)
    reenactor = build_reenactor(cfg, ckpt)
    gpen_base = "./pretrained_ckpts/gpen/"
    gpen_main = os.path.join(gpen_base, "weights", "GPEN-BFR-512.pth")
    if not os.path.exists(gpen_main):
        raise FileNotFoundError(gpen_main)
    from e4s_tpu.utils.torch_convert import load_gpen_checkpoints

    gpen_vars = load_gpen_checkpoints(gpen_base)
    gpen_params = {
        "base_dir": gpen_base,
        "in_size": 512,
        "model": "GPEN-BFR-512",
        "use_sr": True,
        "sr_model": "realesrnet",
        "sr_scale": 4,
        "channel_multiplier": 2,
        "narrow": 1,
    }
    restorer = build_restorer(gpen_params, variables=gpen_vars)
    return reenactor, restorer
