"""FaceVid2Vid driving: keypoint transformation math + the reenactor builder.

Parity target: src/pretrained/face_vid2vid/driven_demo.py:67-244 (vox-256
config: estimate_jacobian=False, gen='spade').
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from e4s_tpu.models.facevid2vid.generator import OcclusionAwareSPADEGenerator
from e4s_tpu.models.facevid2vid.keypoint_detector import HEEstimator, KPDetector
from e4s_tpu.ops.resize import bilinear_resize


def headpose_pred_to_degree(pred):
    """66-bin classification -> degrees. ref: driven_demo.py:67-74"""
    idx = jnp.arange(66, dtype=pred.dtype)
    p = jax.nn.softmax(pred, axis=-1)
    return jnp.sum(p * idx, axis=1) * 3 - 99


def get_rotation_matrix(yaw, pitch, roll):
    """ref: driven_demo.py:107-133 (pitch @ yaw @ roll, angles in degrees,
    pi approximated as 3.14 exactly as the reference does)."""
    yaw = yaw / 180 * 3.14
    pitch = pitch / 180 * 3.14
    roll = roll / 180 * 3.14
    z = jnp.zeros_like(yaw)
    o = jnp.ones_like(yaw)

    pitch_mat = jnp.stack(
        [o, z, z, z, jnp.cos(pitch), -jnp.sin(pitch), z, jnp.sin(pitch),
         jnp.cos(pitch)], axis=1,
    ).reshape(-1, 3, 3)
    yaw_mat = jnp.stack(
        [jnp.cos(yaw), z, jnp.sin(yaw), z, o, z, -jnp.sin(yaw), z,
         jnp.cos(yaw)], axis=1,
    ).reshape(-1, 3, 3)
    roll_mat = jnp.stack(
        [jnp.cos(roll), -jnp.sin(roll), z, jnp.sin(roll), jnp.cos(roll), z,
         z, z, o], axis=1,
    ).reshape(-1, 3, 3)
    return jnp.einsum("bij,bjk,bkm->bim", pitch_mat, yaw_mat, roll_mat)


def keypoint_transformation(kp_canonical, he):
    """Canonical kp + head pose/expression -> posed keypoints.

    ref: driven_demo.py:135-180 (estimate_jacobian=False path).
    """
    kp = kp_canonical["value"]  # [B,K,3]
    yaw = headpose_pred_to_degree(he["yaw"])
    pitch = headpose_pred_to_degree(he["pitch"])
    roll = headpose_pred_to_degree(he["roll"])
    t, exp = he["t"], he["exp"]
    rot_mat = get_rotation_matrix(yaw, pitch, roll)
    kp_rotated = jnp.einsum("bmp,bkp->bkm", rot_mat, kp)
    kp_t = kp_rotated + t[:, None, :]
    exp = exp.reshape(exp.shape[0], -1, 3)
    return {"value": kp_t + exp}


class FaceVid2Vid:
    """Holds the three sub-models + variables and exposes drive()."""

    def __init__(self, variables=None, seed: int = 0):
        self.generator = OcclusionAwareSPADEGenerator()
        self.kp_detector = KPDetector()
        self.he_estimator = HEEstimator()
        if variables is None:
            x0 = jnp.zeros((1, 3, 256, 256), jnp.float32)
            k = jax.random.PRNGKey(seed)
            kp0 = {"value": jnp.zeros((1, 15, 3), jnp.float32)}
            variables = {
                "kp_detector": jax.jit(self.kp_detector.init)(k, x0),
                "he_estimator": jax.jit(self.he_estimator.init)(k, x0),
                "generator": jax.jit(self.generator.init)(k, x0, kp0, kp0),
            }
        self.variables = variables
        # Split into three jitted programs: the single fused program exceeds
        # the axon remote compiler's HLO size limit (HTTP 413), and the
        # kp/he programs are reused across frames anyway.
        self._jit_kp = jax.jit(
            lambda v, x: self.kp_detector.apply(v, x)
        )
        self._jit_he = jax.jit(
            lambda v, x: self.he_estimator.apply(v, x)
        )
        self._jit_gen = jax.jit(
            lambda v, src, kp_d, kp_s: self.generator.apply(
                v, src, kp_d, kp_s
            )["prediction"]
        )

    def _drive(self, source256, driving256):
        """source/driving: [B,3,256,256] in [0,1] -> prediction [B,3,256,256].

        ref: driven_demo.py:182-211 — kp_canonical from source, head pose from
        each image, generator(source, kp_driving, kp_source).
        """
        kp_canonical = self._jit_kp(self.variables["kp_detector"], source256)
        he_source = self._jit_he(self.variables["he_estimator"], source256)
        he_driving = self._jit_he(self.variables["he_estimator"], driving256)
        kp_source = keypoint_transformation(kp_canonical, he_source)
        kp_driving = keypoint_transformation(kp_canonical, he_driving)
        return self._jit_gen(
            self.variables["generator"], source256, kp_driving, kp_source
        )

    def drive(self, source01, driving01):
        """[B,3,H,W] [0,1] arrays at any res -> driven [B,3,256,256] [0,1].

        The 256^2 downscale is ANTI-ALIASED with skimage semantics — the
        reference feeds FaceVid2Vid ``skimage.transform.resize`` outputs
        (ref: scripts/face_swap.py:197), not a plain bilinear."""
        from e4s_tpu.ops.resize import antialiased_resize

        s = antialiased_resize(jnp.asarray(source01), (256, 256))
        d = antialiased_resize(jnp.asarray(driving01), (256, 256))
        return self._drive(s, d)


def drive_source(model: FaceVid2Vid, source01, driving_list):
    """ref: driven_demo.py:227-244 (list-of-targets driver)."""
    return [np.asarray(model.drive(source01, d)) for d in driving_list]


def build_reenactor(cfg_path: Optional[str] = None, ckpt_path: Optional[str] = None):
    """Returns a callable (S01, T01 [1,3,H,W] in [0,1]) -> D01 [1,3,256,256].

    The prediction stays at FaceVid2Vid's native 256^2 — exactly what the
    reference hands to GPEN (scripts/face_swap.py:203-209: the 256^2 fv2v
    output goes straight into GPEN, whose x4 RealESRNet brings it back to
    1024^2). The swap pipeline resizes to out_size if no restorer follows.

    Loads converted torch weights when ``ckpt_path`` exists
    (ref: driven_demo.py:21-64), random init otherwise.
    """
    variables = None
    if ckpt_path and os.path.exists(ckpt_path):
        from e4s_tpu.utils.torch_convert import load_facevid2vid_checkpoint

        variables = load_facevid2vid_checkpoint(ckpt_path)
    model = FaceVid2Vid(variables=variables)

    def reenact(S01, T01):
        return np.asarray(model.drive(S01, T01))

    # exposes the underlying model so FaceSwapper can build the
    # device-resident reenact->restore chain (pipelines/reenact_restore.py)
    reenact.fv2v = model
    return reenact
