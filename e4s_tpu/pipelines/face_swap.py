"""End-to-end face-swapping pipeline.

Parity target: scripts/face_swap.py:149-331 (faceSwapping_pipeline). Stages:

  (1) optional dlib crop+align (host; default path resizes to 1024^2, ref
      :189-192)
  (2) re-enactment of S by T (FaceVid2Vid) + restoration (GPEN) — injectable;
      identity fallback (D = S) when the aux models are unavailable
  (3) RGI style extraction for D and T          [device, jitted]
  (4) mask swap (host numpy) + texture swap     [device]
  (5) mask-guided synthesis                     [device, jitted]
  (6) stitching: Gaussian-feathered paste or Laplacian multi-band blending
      [device], then optional inverse-perspective paste to the original frame
      (host PIL)

Stages 3-6 run as one jitted core per variant (see swap_core.py), so a swap is
a fixed number of TPU launches regardless of image content.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from e4s_tpu.models.net3 import Net3
from e4s_tpu.ops.blending import blend_images
from e4s_tpu.ops.morphology import create_masks
from e4s_tpu.ops.resize import bilinear_resize
from e4s_tpu.pipelines.model_io import load_face_parser, load_net3
from e4s_tpu.pipelines.swap_core import (
    make_swap_core,
    make_swap_e2e,
    stitch_foreground,
)
from e4s_tpu.utils.img_utils import tensor2im, vis_mask_in_color
from e4s_tpu.utils.swap_mask import swap_head_mask


class FaceSwapper:
    """Holds the loaded models + jitted cores; call ``swap`` per pair."""

    def __init__(self, opts, reenactor=None, restorer=None, parser=None):
        self.opts = opts
        self.net, self.variables, self.latent_avg = load_net3(opts)
        self.parser = parser if parser is not None else load_face_parser(
            opts, getattr(opts, "faceParsing_ckpt", None)
        )
        self.reenactor = reenactor  # FaceVid2Vid driver: (S01, T01) -> D01
        self.restorer = restorer  # GPEN: D01 -> D01 restored
        self._swap_core = jax.jit(make_swap_core(self.net, from_labels=True))
        self._stitch = jax.jit(stitch_foreground, static_argnames=("outer_dilation",))
        # fully fused uint8->uint8 program (parse + mask swap + core + stitch
        # on device): the host<->device link is the e2e bottleneck (~20 MB/s
        # tunnel), so the default path transfers 2 uint8 images up and 1 down.
        # Injected parser stand-ins without a .model (tests) use the staged
        # host path instead.
        self._swap_e2e = (
            jax.jit(make_swap_e2e(
                self.net, self.parser.model,
                parser_size=getattr(self.parser, "size", 512)
                if getattr(self.parser, "taxonomy", "ffhq19") == "celeba19"
                else 512,
                taxonomy=getattr(self.parser, "taxonomy", "ffhq19"),
                lap_bld=bool(getattr(opts, "lap_bld", False)),
            ))
            if hasattr(self.parser, "model") else None
        )
        # device-resident reenact->restore chain: built when both aux models
        # are our native objects (they expose .fv2v / .enhancer); keeps the
        # fv2v->GPEN->swap intermediates on device (~9 MB of tunnel traffic
        # per full swap instead of ~73 MB). Injected host callables (tests,
        # custom models) keep the host path.
        self._device_chain = None
        if (
            self._swap_e2e is not None
            and hasattr(self.reenactor, "fv2v")
            and hasattr(self.restorer, "enhancer")
        ):
            try:
                from e4s_tpu.pipelines.reenact_restore import (
                    DeviceReenactRestore,
                )

                self._device_chain = DeviceReenactRestore(
                    self.reenactor.fv2v, self.restorer.enhancer,
                    out_size=opts.out_size,
                    bf16=bool(getattr(opts, "bf16", False)),
                )
            except ValueError:
                self._device_chain = None  # non-SR GPEN config: host path

    # -------------------------- host helpers --------------------------

    def _load_1024(self, path):
        from PIL import Image

        S = self.opts.out_size
        img = Image.open(path).convert("RGB").resize((S, S))
        return np.transpose(np.asarray(img, np.float32) / 255.0, (2, 0, 1))[None]

    def _parse12(self, arr01):
        from e4s_tpu.pipelines.swap_core import parse12_host

        return parse12_host(self.parser, arr01)

    def _save_verbose(self, save_dir, d_lab, t_lab, s_lab):
        """Dump the verbose mask intermediates (same files as the staged
        path / the reference's --verbose, ref: scripts/face_swap.py:197-258)
        from the label maps the fused program returns."""
        from PIL import Image

        os.makedirs(save_dir, exist_ok=True)
        T_mask = np.asarray(t_lab[0]).astype(np.uint8)
        D_mask = np.asarray(d_lab[0]).astype(np.uint8)
        S_mask = np.asarray(s_lab[0]).astype(np.uint8)
        Image.fromarray(T_mask).save(os.path.join(save_dir, "T_mask.png"))
        Image.fromarray(D_mask).save(os.path.join(save_dir, "D_mask.png"))
        Image.fromarray(vis_mask_in_color(T_mask)).save(
            os.path.join(save_dir, "T_mask_vis.png")
        )
        Image.fromarray(S_mask).save(
            os.path.join(save_dir, "swappedMask.png")
        )
        Image.fromarray(vis_mask_in_color(S_mask)).save(
            os.path.join(save_dir, "swappedMaskVis.png")
        )

    def _reenact_restore(self, S01, T01):
        """Stage (2): FaceVid2Vid re-enactment at its native 256^2, GPEN
        restoration (x4 SR back to 1024^2), then a resize guard to out_size.
        Identity (D = S) when no reenactor is injected.
        ref: scripts/face_swap.py:203-209."""
        if self.reenactor is None:
            return S01
        D01 = self.reenactor(S01, T01)
        if self.restorer is not None:
            # GPEN's host glue (detect/warp/composite) is per-image
            D01 = np.concatenate([self.restorer(D01[i:i + 1])
                                  for i in range(D01.shape[0])])
        S = self.opts.out_size
        if D01.shape[-2:] != (S, S):
            D01 = np.asarray(bilinear_resize(jnp.asarray(D01), (S, S)))
        return np.clip(D01, 0.0, 1.0)

    # ----------------------------- main --------------------------------

    def swap(
        self,
        source: str,
        target: str,
        save_dir: Optional[str] = None,
        target_mask: Optional[np.ndarray] = None,
        need_crop: bool = False,
        verbose: bool = False,
        only_target_crop: bool = False,
        landmarks: Optional[list] = None,
    ):
        """ref: scripts/face_swap.py:149-331. Returns the pasted PIL image.

        ``landmarks``: optional precomputed 68-point landmarks (one array per
        cropped image, in file order) — bypasses dlib detection for the
        need_crop path."""
        from PIL import Image

        opts = self.opts
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
        result_name = "swap_%s_to_%s.png" % (
            os.path.basename(source).split(".")[0],
            os.path.basename(target).split(".")[0],
        )

        inv_transforms = orig_images = None
        if only_target_crop or need_crop:
            from e4s_tpu.utils.alignment import crop_and_align_face

            files = [(os.path.basename(f).split(".")[0], f) for f in (source, target)]
            sel = files[1:] if only_target_crop else files
            crops, orig_images, quads, inv_transforms = crop_and_align_face(
                sel, image_size=self.opts.out_size, landmarks=landmarks
            )
            crops = [c.convert("RGB") for c in crops]
            if only_target_crop:
                T01 = np.transpose(np.asarray(crops[0], np.float32) / 255.0, (2, 0, 1))[None]
                S01 = self._load_1024(source)
            else:
                S01 = np.transpose(np.asarray(crops[0], np.float32) / 255.0, (2, 0, 1))[None]
                T01 = np.transpose(np.asarray(crops[1], np.float32) / 255.0, (2, 0, 1))[None]
        else:
            S01 = self._load_1024(source)
            T01 = self._load_1024(target)

        result = self.swap_from_arrays(
            S01, T01, target_mask=target_mask, save_dir=save_dir,
            verbose=verbose,
        )

        # restore into the original frame if cropped
        if (only_target_crop or need_crop) and inv_transforms is not None:
            idx = 0 if only_target_crop else 1
            coeffs, orig_image = inv_transforms[idx], orig_images[idx]
            swapped_rgba = result.convert("RGBA")
            swapped_rgba.putalpha(255)
            projected = swapped_rgba.transform(
                orig_image.size, Image.PERSPECTIVE, coeffs, Image.BILINEAR
            )
            pasted_image = orig_image.convert("RGBA")
            pasted_image.alpha_composite(projected)
            result = pasted_image

        if save_dir:
            result.save(os.path.join(save_dir, result_name))
        return result

    def swap_from_arrays(
        self,
        S01: np.ndarray,
        T01: np.ndarray,
        target_mask: Optional[np.ndarray] = None,
        save_dir: Optional[str] = None,
        verbose: bool = False,
    ):
        """Stages (2)-(6) of the swap on pre-loaded [1,3,S,S] arrays in [0,1].

        This is the full on-device pipeline (re-enact/restore, BiSeNet parse
        x2, host mask swap, jitted swap core, stitch) without file I/O or
        crop/inverse-paste — the unit the end-to-end benchmark times.
        Returns the 1024^2 result as a PIL image.
        """
        from PIL import Image

        opts = self.opts
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)

        # The fused program covers feather AND lap_bld stitches (compiled-in)
        # plus verbose dumps (the label maps come back as tiny downloads);
        # only a caller-supplied target mask still needs the staged path.
        fused_ok = self._swap_e2e is not None and target_mask is None

        # fully device-resident path: reenact + restore + parse + swap +
        # stitch with only the two uint8 uploads and one uint8 download
        if fused_ok and self._device_chain is not None:
            s_dev = jnp.asarray(
                np.clip(S01 * 255.0 + 0.5, 0, 255).astype(np.uint8)
            )
            t_dev = jnp.asarray(
                np.clip(T01 * 255.0 + 0.5, 0, 255).astype(np.uint8)
            )
            d_dev = self._device_chain(s_dev, t_dev)
            if d_dev is not None:
                out_u8, s_lab, _, d_lab, t_lab = self._swap_e2e(
                    self.variables, self.parser.variables,
                    d_dev, t_dev, self.latent_avg,
                )
                if verbose and save_dir:
                    self._save_verbose(save_dir, d_lab, t_lab, s_lab)
                return Image.fromarray(
                    np.transpose(np.asarray(out_u8[0]), (1, 2, 0))
                )
            # rare multi-face / small-face glue: host path below

        # (2) re-enact S with T's pose (256^2, fv2v native), then restore
        # (GPEN x4 SR -> 1024^2) — ref: scripts/face_swap.py:203-209
        D01 = self._reenact_restore(S01, T01)

        # default fast path: the whole parse->swap->stitch program on device,
        # 2 uint8 uploads + 1 uint8 download. The staged path below remains
        # for target-mask overrides.
        if fused_ok:
            src_u8 = np.clip(D01 * 255.0 + 0.5, 0, 255).astype(np.uint8)
            tgt_u8 = np.clip(T01 * 255.0 + 0.5, 0, 255).astype(np.uint8)
            out_u8, s_lab, _, d_lab, t_lab = self._swap_e2e(
                self.variables, self.parser.variables,
                jnp.asarray(src_u8), jnp.asarray(tgt_u8), self.latent_avg,
            )
            if verbose and save_dir:
                self._save_verbose(save_dir, d_lab, t_lab, s_lab)
            return Image.fromarray(
                np.transpose(np.asarray(out_u8[0]), (1, 2, 0))
            )

        # parse masks (12-class)
        T_mask = self._parse12(T01)[0] if target_mask is None else target_mask
        D_mask = self._parse12(D01)[0]
        if verbose and save_dir:
            Image.fromarray(T_mask.astype(np.uint8)).save(
                os.path.join(save_dir, "T_mask.png")
            )
            Image.fromarray(D_mask.astype(np.uint8)).save(
                os.path.join(save_dir, "D_mask.png")
            )
            Image.fromarray(vis_mask_in_color(T_mask)).save(
                os.path.join(save_dir, "T_mask_vis.png")
            )

        # (4) mask swap on host numpy (ref: face_swap.py:253)
        swapped_msk, hole_map = swap_head_mask(D_mask, T_mask)
        if verbose and save_dir:
            Image.fromarray(swapped_msk.astype(np.uint8)).save(
                os.path.join(save_dir, "swappedMask.png")
            )
            Image.fromarray(vis_mask_in_color(swapped_msk)).save(
                os.path.join(save_dir, "swappedMaskVis.png")
            )

        dt = jnp.bfloat16 if getattr(opts, "bf16", False) else jnp.float32
        driven = jnp.asarray(D01 * 2 - 1, dt)
        target_t = jnp.asarray(T01 * 2 - 1, dt)
        # upload 1-byte label maps; the core builds the one-hots on device
        # (a [1,12,1024,1024] f32 one-hot is ~50 MB over the tunnel)
        d_labels = jnp.asarray(D_mask[None, None].astype(np.int32))
        t_labels = jnp.asarray(T_mask[None, None].astype(np.int32))
        s_labels = jnp.asarray(swapped_msk[None, None].astype(np.int32))

        # (3)+(5) one jitted core
        swapped_face = self._swap_core(
            self.variables, driven, target_t, d_labels, t_labels, s_labels,
            self.latent_avg,
        )

        # (6) stitch
        outer_dilation = 5  # ref: face_swap.py:279
        label_t = jnp.asarray(swapped_msk[None, None].astype(np.int32))
        hole_t = jnp.asarray(hole_map[None, None].astype(np.int32))
        if getattr(opts, "lap_bld", False):
            mask_bg = (label_t == 0) | (label_t == 11) | (label_t == 4)
            fg = (~mask_bg | (hole_t == 255)).astype(jnp.float32)
            content_mask, border_mask, _ = create_masks(
                fg, outer_dilation=outer_dilation, operation="expansion"
            )
            S = opts.out_size
            content_mask = bilinear_resize(content_mask, (S, S))
            border_mask = bilinear_resize(border_mask, (S, S))
            swapped01 = (swapped_face + 1) / 2 * 255.0
            target255 = jnp.asarray(T01) * 255.0
            pasted = swapped01 * content_mask + target255 * (1 - content_mask)
            blended = blend_images(
                target255, pasted, jnp.repeat(border_mask, 3, axis=1)
            )
            out01 = np.asarray(blended[0]) / 255.0
            result = Image.fromarray(
                np.transpose(np.clip(out01 * 255, 0, 255), (1, 2, 0)).astype(np.uint8)
            )
        else:
            stitched = self._stitch(
                swapped_face, target_t, label_t, hole_t,
                outer_dilation=outer_dilation,
            )
            result = tensor2im(np.asarray(stitched[0]))
        return result


    # ------------------------- batched API ------------------------------

    def swap_batch(self, source_arrays, target_arrays, target_masks=None,
                   chunk: int = 8):
        """Batched swap of N (source, target) pairs in one device pass.

        BASELINE config #5: batched CelebAMask-HQ swap throughput with the
        parser + encoder + generator pipelined on TPU. Arrays are [N,3,S,S]
        float in [0,1] (returns float [0,1]) or uint8 (returns uint8 — the
        fast path: images come off disk/camera as uint8 and the fused
        program consumes uint8 directly), stitched with the default feather.
        """
        opts = self.opts
        # uint8 fast path: images arrive as uint8 (PIL/camera frames); the
        # fused program takes uint8 directly, so skip the float round-trip
        # (a [64,3,1024,1024] f32 convert is ~1.5 GB of host traffic)
        u8_in = (
            np.asarray(source_arrays).dtype == np.uint8
            and np.asarray(target_arrays).dtype == np.uint8
            and self.reenactor is None
            and self._swap_e2e is not None
            and target_masks is None
        )
        if u8_in:
            D01 = np.asarray(source_arrays)
            T01 = np.asarray(target_arrays)
        else:
            S01 = np.asarray(source_arrays, np.float32)
            T01 = np.asarray(target_arrays, np.float32)
            D01 = self._reenact_restore(S01, T01)

        if target_masks is None and self._swap_e2e is not None:
            # Fused device path, three-stage thread pipeline. The ~20 MB/s
            # host<->device tunnel is the bottleneck (6.3 MB up + 3.1 MB down
            # per image); a single thread serialises upload, dispatch-wait and
            # download on that one link driver, capping throughput at
            # ~bytes_total/bandwidth. A dedicated uploader thread (device_put,
            # 2 chunks in flight) and a dedicated downloader thread
            # (np.asarray) let the runtime overlap the up- and down-stream
            # transfers with each other and with compute; the main thread
            # only dispatches (async on this backend).
            import queue as _queue
            import threading as _threading
            import time as _time

            n = D01.shape[0]
            chunk = min(chunk, n)
            timeline = os.environ.get("E4S_BATCH_TIMELINE") == "1"

            def prep(lo):
                hi = min(lo + chunk, n)
                if u8_in:
                    s, t = D01[lo:hi], T01[lo:hi]
                else:
                    s = np.clip(
                        D01[lo:hi] * 255.0 + 0.5, 0, 255
                    ).astype(np.uint8)
                    t = np.clip(
                        T01[lo:hi] * 255.0 + 0.5, 0, 255
                    ).astype(np.uint8)
                if hi - lo < chunk:  # pad tail: one compiled shape
                    rep = chunk - (hi - lo)
                    s = np.concatenate([s, s[-1:].repeat(rep, 0)])
                    t = np.concatenate([t, t[-1:].repeat(rep, 0)])
                return s, t

            in_q: _queue.Queue = _queue.Queue(maxsize=2)
            out_q: _queue.Queue = _queue.Queue(maxsize=4)
            n_chunks = (n + chunk - 1) // chunk
            marks = {"up": 0.0, "disp": 0.0, "down": 0.0}

            errs = []

            def uploader():
                try:
                    for lo in range(0, n, chunk):
                        t0 = _time.perf_counter()
                        s, t = prep(lo)
                        pair = (jax.device_put(s), jax.device_put(t))
                        # device_put may be lazy; forcing isn't possible
                        # without a readback, so just hand it over — the
                        # queue bound keeps at most 2 chunks of host+device
                        # memory in flight
                        marks["up"] += _time.perf_counter() - t0
                        in_q.put(pair)
                except Exception as e:  # propagate instead of deadlocking
                    errs.append(e)
                    in_q.put(None)

            results = [None] * n_chunks

            def downloader():
                i = 0
                try:
                    while True:
                        dev = out_q.get()
                        if dev is None:
                            return
                        t0 = _time.perf_counter()
                        results[i] = np.asarray(dev)
                        i += 1
                        marks["down"] += _time.perf_counter() - t0
                except Exception as e:
                    errs.append(e)

            up_t = _threading.Thread(target=uploader, daemon=True)
            down_t = _threading.Thread(target=downloader, daemon=True)
            up_t.start()
            down_t.start()
            for _ in range(n_chunks):
                cur = in_q.get()
                if cur is None:
                    break
                t0 = _time.perf_counter()
                out_u8 = self._swap_e2e(
                    self.variables, self.parser.variables,
                    cur[0], cur[1], self.latent_avg,
                )[0]
                marks["disp"] += _time.perf_counter() - t0
                out_q.put(out_u8)
            out_q.put(None)
            up_t.join()
            down_t.join()
            if errs:
                raise errs[0]
            assert all(r is not None for r in results)
            if timeline:
                print(
                    f"[swap_batch] {n_chunks} chunks of {chunk}: "
                    f"upload-thread total {marks['up']*1e3:.0f}ms, "
                    f"dispatch total {marks['disp']*1e3:.0f}ms, "
                    f"download-thread total {marks['down']*1e3:.0f}ms"
                )
            if u8_in:  # uint8 in -> uint8 out, no host float pass
                return np.concatenate(results)[:n]
            res = np.concatenate(
                [r.astype(np.float32) for r in results]
            ) / 255.0
            return res[:n]

        D_masks = self._parse12(D01)
        T_masks = (
            self._parse12(T01) if target_masks is None else target_masks
        )

        swapped, holes = [], []
        for d_m, t_m in zip(D_masks, T_masks):
            s_m, h_m = swap_head_mask(d_m, t_m)
            swapped.append(s_m)
            holes.append(h_m)
        swapped_msk = np.stack(swapped)
        hole_map = np.stack(holes)

        dt = jnp.bfloat16 if getattr(opts, "bf16", False) else jnp.float32
        driven = jnp.asarray(D01 * 2 - 1, dt)
        target_t = jnp.asarray(T01 * 2 - 1, dt)
        faces = self._swap_core(
            self.variables, driven, target_t,
            jnp.asarray(np.asarray(D_masks)[:, None].astype(np.int32)),
            jnp.asarray(np.asarray(T_masks)[:, None].astype(np.int32)),
            jnp.asarray(swapped_msk[:, None].astype(np.int32)),
            self.latent_avg,
        )
        stitched = self._stitch(
            faces, target_t,
            jnp.asarray(swapped_msk[:, None].astype(np.int32)),
            jnp.asarray(hole_map[:, None].astype(np.int32)),
            outer_dilation=5,
        )
        return np.clip((np.asarray(stitched, np.float32) + 1) / 2, 0, 1)


def faceSwapping_pipeline(
    source, target, opts, save_dir, target_mask=None, need_crop=False,
    verbose=False, only_target_crop=False, reenactor=None, restorer=None,
):
    """Functional wrapper matching the reference signature
    (ref: scripts/face_swap.py:149-150)."""
    swapper = FaceSwapper(opts, reenactor=reenactor, restorer=restorer)
    return swapper.swap(
        source, target, save_dir=save_dir, target_mask=target_mask,
        need_crop=need_crop, verbose=verbose, only_target_crop=only_target_crop,
    )
