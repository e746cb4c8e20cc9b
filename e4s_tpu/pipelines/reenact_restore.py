"""Device-resident FaceVid2Vid reenact -> GPEN restore chain.

The host-glue pipeline (models/gpen/face_enhancement.py process + the
FaceSwapper._reenact_restore loop) is numerically the reference flow
(ref: scripts/face_swap.py:203-215, src/pretrained/gpen/face_enhancement.py:
51-110) but transfers ~73 MB per swap over the ~20 MB/s host<->TPU tunnel
(S/T f32 uploads, SR download, detector re-upload, per-face GAN round trips).
This chain keeps every intermediate ON DEVICE and reproduces the same
arithmetic, including each uint8 quantisation the host path performs between
stages:

  upload S_u8, T_u8 (uint8, once)                           ~6.3 MB up
  -> /255 -> anti-aliased 256^2 resize (skimage semantics,
     ref face_swap.py:197)                                   [device]
  -> FaceVid2Vid kp/he/generator                             [device]
  -> uint8 cast (ref: (pred*255).astype(uint8))              [device]
  -> RRDBNet x4 SR + bilinear 4x upsample of the original    [device]
  -> RetinaFace + prior decode + top-k                       [device]
  -> boxes/landmarks download (~1 KB), host NMS + umeyama    [host, tiny]
  -> affine crop -> GPEN FullGenerator -> ParseNet mask ->
     double GaussianBlur feather -> inverse warps ->
     composite over the SR base                              [device]
  -> D_u8 stays device-resident for the fused swap program   0 transfer

Fidelity: every stage mirrors the host path op-for-op (same uint8
truncation/rounding points, cv2 kernel constants, REFLECT_101 borders);
tests/test_pipelines.py asserts chain == host-glue output. Falls back to the
host path for >1 detected face or small-face sharpen cases (rare glue the
chain does not duplicate).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from e4s_tpu.models.facevid2vid.driver import keypoint_transformation
from e4s_tpu.models.gpen.align_faces import umeyama
from e4s_tpu.models.gpen.parsenet import parse_mask
from e4s_tpu.models.gpen.retinaface import (
    prior_boxes,
    py_cpu_nms,
)
from e4s_tpu.ops.resize import antialiased_resize, bilinear_resize
from e4s_tpu.ops.warp import affine_warp, gaussian_blur_cv2


def _invert_affine(m: np.ndarray) -> np.ndarray:
    """cv2.invertAffineTransform for a [2,3] matrix."""
    A = m[:, :2]
    b = m[:, 2]
    Ainv = np.linalg.inv(A)
    return np.concatenate([Ainv, (-Ainv @ b)[:, None]], axis=1).astype(
        np.float32
    )


class DeviceReenactRestore:
    """Callable (S_u8_dev, T_u8_dev) -> D_u8_dev (or None -> host fallback).

    ``fv2v``: models.facevid2vid.driver.FaceVid2Vid;
    ``enhancer``: models.gpen.face_enhancement.FaceEnhancement (use_sr with
    sr upscaling back to ``out_size`` required).
    """

    TOP_K = 16  # candidate detections downloaded; >16 above-threshold faces
    # falls back to the host path (never seen on portrait inputs)

    def __init__(self, fv2v, enhancer, out_size: int = 1024,
                 bf16: bool = False):
        if not enhancer.use_sr or enhancer.in_size != 512:
            raise ValueError("device chain expects the GPEN 512 + SR config")
        self.fv2v = fv2v
        self.enh = enhancer
        self.out_size = out_size
        # bf16 compute for the four pure-conv nets (SR, RetinaFace, GPEN,
        # ParseNet) — wholesale f32->bf16 leaf cast, the same policy the
        # coach applies to the frozen criteria (DESIGN.md §6). FaceVid2Vid
        # stays f32: its dense-motion warp coordinates lose a pixel of
        # precision in bf16. All uint8 quantisation points, the box decode,
        # and the mask blurs stay f32. Stage profile that motivates this
        # (f32, v5e): fv2v 122 / restore 136 / det 78 / SR 68 ms.
        self.bf16 = bool(bf16)
        self._act = jnp.bfloat16 if self.bf16 else jnp.float32
        if self.bf16:
            cast = lambda t: jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t
            )
            self._sr_vars = cast(enhancer.srmodel.variables)
            self._rf_vars = cast(enhancer.facedetector.variables)
            self._fg_vars = cast(enhancer.facegan.variables)
            self._pn_vars = cast(enhancer.faceparser.variables)
        else:
            self._sr_vars = enhancer.srmodel.variables
            self._rf_vars = enhancer.facedetector.variables
            self._fg_vars = enhancer.facegan.variables
            self._pn_vars = enhancer.faceparser.variables

        self._jit_prep_pose = jax.jit(self._prep_pose)
        self._jit_sr = jax.jit(self._sr_stage)
        self._jit_det = jax.jit(self._det_stage)
        self._jit_restore = jax.jit(self._restore_stage)
        # fused front: pose -> fv2v generate -> SR -> detect as ONE program
        # with the detection outputs bundled into a single [K,15] download.
        # The chain is dispatch-latency-bound on the tunnel (bf16 A/B of the
        # four conv nets moved 397.5 -> 394.0 ms — a wash at 49.3 dB), so
        # fewer round trips, not faster math, is the lever.
        self._jit_front = jax.jit(self._front_stage)

    # ------------------------- jitted stages ---------------------------

    def _prep_pose(self, kp_vars, he_vars, s_u8, t_u8):
        """uint8 inputs -> (s256, kp_driving, kp_source): the anti-aliased
        256^2 resize (skimage semantics, ref face_swap.py:197) fused with
        the kp/he heads and the pose math in ONE program — the eager
        keypoint_transformation would otherwise dispatch ~30 scalar-sized
        ops over the tunnel."""
        s256 = antialiased_resize(s_u8.astype(jnp.float32) / 255.0, (256, 256))
        t256 = antialiased_resize(t_u8.astype(jnp.float32) / 255.0, (256, 256))
        kp_c = self.fv2v.kp_detector.apply(kp_vars, s256)
        he_s = self.fv2v.he_estimator.apply(he_vars, s256)
        he_d = self.fv2v.he_estimator.apply(he_vars, t256)
        kp_s = keypoint_transformation(kp_c, he_s)
        kp_d = keypoint_transformation(kp_c, he_d)
        return s256, kp_d, kp_s

    def _sr_stage(self, sr_vars, pred):
        """pred [B,3,256,256] RGB [0,1] -> (img_sr_u8, img_up_u8) at 1024^2.

        uint8 points mirror the host path: (pred*255).astype -> truncation
        (face_swap.py:205), RealESRNet output .round() (real_esrnet.py),
        cv2.resize on uint8 -> rounding."""
        pred_u8 = jnp.clip(pred * 255.0, 0, 255).astype(jnp.uint8)
        sr_in = (pred_u8.astype(jnp.float32) / 255.0).astype(self._act)
        out = self.enh.srmodel.model.apply(sr_vars, sr_in)
        out = jnp.clip(out.astype(jnp.float32), 0.0, 1.0)
        img_sr_u8 = jnp.clip(jnp.round(out * 255.0), 0, 255).astype(jnp.uint8)
        S = img_sr_u8.shape[-1]
        up = bilinear_resize(pred_u8.astype(jnp.float32), (S, S))
        img_up_u8 = jnp.clip(jnp.round(up), 0, 255).astype(jnp.uint8)
        return img_sr_u8, img_up_u8

    def _det_stage(self, rf_vars, img_up_u8):
        """RetinaFace + device prior decode + top-k; tiny download."""
        S = img_up_u8.shape[-1]
        x = img_up_u8.astype(jnp.float32)[:, ::-1]  # RGB->BGR (net layout)
        mean = jnp.asarray([104.0, 117.0, 123.0]).reshape(1, 3, 1, 1)
        loc, conf, ldm = self.enh.facedetector.net.apply(
            rf_vars, (x - mean).astype(self._act)
        )
        loc = loc.astype(jnp.float32)
        conf = conf.astype(jnp.float32)
        ldm = ldm.astype(jnp.float32)
        # numpy constant on purpose (no eager device-put at trace time)
        priors = prior_boxes((S, S)).astype(np.float32)
        v0, v1 = 0.1, 0.2
        # decode (ref: utils/box_utils.py decode / decode_landm)
        ctr = priors[:, :2] + loc[0, :, :2] * v0 * priors[:, 2:]
        wh = priors[:, 2:] * jnp.exp(loc[0, :, 2:] * v1)
        boxes = jnp.concatenate([ctr - wh / 2, ctr + wh / 2], axis=1) * S
        lm = jnp.concatenate(
            [
                priors[:, :2] + ldm[0, :, 2 * i : 2 * i + 2] * v0 * priors[:, 2:]
                for i in range(5)
            ],
            axis=1,
        ) * S
        scores = conf[0, :, 1]
        top_s, idx = jax.lax.top_k(scores, self.TOP_K)
        return boxes[idx], lm[idx], top_s

    def _restore_stage(self, fg_vars, pn_vars, img_up_u8, img_sr_u8,
                       minv_crop, minv_back):
        """One face: crop -> FullGenerator -> ParseNet feather -> paste."""
        S = img_sr_u8.shape[-1]
        in_size = self.enh.in_size
        of = affine_warp(
            img_up_u8[0].astype(jnp.float32), minv_crop, (in_size, in_size)
        )
        of_u8 = jnp.clip(jnp.round(of), 0, 255).astype(jnp.uint8)
        net_in = ((of_u8.astype(jnp.float32) / 255.0 - 0.5) / 0.5).astype(
            self._act
        )
        ef = self.enh.facegan.model.apply(fg_vars, net_in[None])[0]
        ef01 = jnp.clip(ef[0].astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)
        ef_u8 = jnp.clip(ef01 * 255.0, 0, 255).astype(jnp.uint8)  # truncation

        pn_in = (ef_u8.astype(jnp.float32) / 255.0 * 2.0 - 1.0).astype(
            self._act
        )
        logits = self.enh.faceparser.model.apply(
            pn_vars, pn_in[None]
        )[0].astype(jnp.float32)
        m = parse_mask(logits)[0] / 255.0  # [512,512] in {0,1}
        thres = 20
        m = m.at[:thres, :].set(0).at[-thres:, :].set(0)
        m = m.at[:, :thres].set(0).at[:, -thres:].set(0)
        m = gaussian_blur_cv2(m, 101, 11.0)
        m = gaussian_blur_cv2(m, 101, 11.0)

        m_full = affine_warp(m[None], minv_back, (S, S))[0]
        ef_warp = affine_warp(ef_u8.astype(jnp.float32), minv_back, (S, S))
        ef_warp = jnp.clip(jnp.round(ef_warp), 0, 255)  # uint8 warp rounds
        base = img_sr_u8[0].astype(jnp.float32)
        out = base * (1.0 - m_full) + ef_warp * m_full
        out_u8 = jnp.clip(out, 0, 255).astype(jnp.uint8)  # ref: astype trunc
        return out_u8[None]

    def _front_stage(self, kp_vars, he_vars, gen_vars, sr_vars, rf_vars,
                     s_u8, t_u8):
        """pose + fv2v generate + SR + detect, fused; detection outputs
        bundled as one [K, 15] array (boxes|landmarks|score) so the host
        sync is a single small download."""
        s256, kp_d, kp_s = self._prep_pose(kp_vars, he_vars, s_u8, t_u8)
        pred = self.fv2v.generator.apply(
            gen_vars, s256, kp_d, kp_s
        )["prediction"]
        img_sr_u8, img_up_u8 = self._sr_stage(sr_vars, pred)
        boxes, lms, scores = self._det_stage(rf_vars, img_up_u8)
        det = jnp.concatenate([boxes, lms, scores[:, None]], axis=1)
        return img_sr_u8, img_up_u8, det

    # ----------------------------- driver -------------------------------

    def __call__(self, s_u8_dev, t_u8_dev) -> Optional[jnp.ndarray]:
        enh = self.enh
        fv_vars = self.fv2v.variables
        if not getattr(self, "_front_unfused", False):
            try:
                img_sr_u8, img_up_u8, det_dev = self._jit_front(
                    fv_vars["kp_detector"], fv_vars["he_estimator"],
                    fv_vars["generator"], self._sr_vars, self._rf_vars,
                    s_u8_dev, t_u8_dev,
                )
            except Exception as e:  # remote-compile size limit (HTTP 413)
                print(
                    f"[reenact_restore] fused front failed "
                    f"({type(e).__name__}); staying staged"
                )
                self._front_unfused = True
        if getattr(self, "_front_unfused", False):
            s256, kp_d, kp_s = self._jit_prep_pose(
                fv_vars["kp_detector"], fv_vars["he_estimator"],
                s_u8_dev, t_u8_dev,
            )
            pred = self.fv2v._jit_gen(fv_vars["generator"], s256, kp_d, kp_s)
            img_sr_u8, img_up_u8 = self._jit_sr(self._sr_vars, pred)
            boxes, lms, scores = self._jit_det(self._rf_vars, img_up_u8)
            det_dev = jnp.concatenate(
                [boxes, lms, scores[:, None]], axis=1
            )
        det_host = np.asarray(det_dev)
        boxes, lms, scores = det_host[:, :4], det_host[:, 4:14], det_host[:, 14]

        keep = scores >= enh.threshold
        if keep.sum() >= self.TOP_K:
            return None  # candidate list saturated; host path decides
        dets = np.hstack([boxes[keep], scores[keep, None]]).astype(np.float32)
        lms_k = lms[keep]
        if len(dets):
            nms_keep = py_cpu_nms(dets, 0.4)
            dets, lms_k = dets[nms_keep], lms_k[nms_keep]
        if enh.force_one_face and len(dets) == 0:
            S = self.out_size
            dets = np.array(
                [[S * 0.25, S * 0.25, S * 0.75, S * 0.75, 1.0]], np.float32
            )
            pts = np.array(
                [[0.38, 0.62, 0.50, 0.40, 0.60],
                 [0.42, 0.42, 0.55, 0.70, 0.70]]
            )
            lms_k = np.stack(
                [S * (0.25 + 0.5 * pts[0]), S * (0.25 + 0.5 * pts[1])]
            ).reshape(1, 10)

        if len(dets) == 0:
            return img_sr_u8  # SR-only composite, already device-resident
        if len(dets) > 1:
            return None  # multi-face overlap-ordering glue -> host path
        fh = dets[0][3] - dets[0][1]
        fw = dets[0][2] - dets[0][0]
        if min(fh, fw) < 100:
            return None  # host path applies the small-face sharpen kernel

        # umeyama similarity, exactly warp_and_crop_face (align_faces.py)
        src_pts = np.reshape(lms_k[0], (2, 5)).T.astype(np.float32)
        ref_pts = np.float32(enh.reference_5pts)
        if ref_pts.shape[0] == 2:
            ref_pts = ref_pts.T
        params, scale = umeyama(src_pts, ref_pts)
        tfm = params[:2, :]
        params_inv, _ = umeyama(ref_pts, src_pts, False, scale=1.0 / scale)
        tfm_inv = params_inv[:2, :]

        minv_crop = jnp.asarray(_invert_affine(tfm))
        minv_back = jnp.asarray(_invert_affine(tfm_inv))
        return self._jit_restore(
            self._fg_vars, self._pn_vars,
            img_up_u8, img_sr_u8, minv_crop, minv_back,
        )
