"""Model loading for inference pipelines.

Supports:
- torch E4S checkpoints (``iteration_300000.pt``) through the converter
  (ref: scripts/face_swap.py:372-377 load path),
- orbax checkpoints saved by our Coach,
- random init (no checkpoint) for smoke tests / benchmarking.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from e4s_tpu.models.net3 import Net3


def build_net(opts) -> Net3:
    # NHWC synthesis internals by default (checkpoint-compatible either way;
    # measured faster on TPU and what dispatches the fused Pallas masked conv)
    return Net3(
        num_seg_cls=opts.num_seg_cls,
        out_size=opts.out_size,
        remaining_layer_idx=opts.remaining_layer_idx,
        n_styles=opts.n_styles,
        start_from_latent_avg=opts.start_from_latent_avg,
        learn_in_w=getattr(opts, "learn_in_w", False),
        channels_last=getattr(opts, "channels_last", True),
    )


def init_variables(net: Net3, opts, seed: int = 0):
    S = opts.out_size
    img0 = jnp.zeros((1, 3, S, S), jnp.float32)
    mask0 = jnp.zeros((1, opts.num_seg_cls, S, S), jnp.float32)
    latent_avg0 = jnp.zeros((opts.n_styles, 512), jnp.float32)
    k = jax.random.PRNGKey(seed)
    return jax.jit(
        lambda key: net.init(
            {"params": key, "noise": key},
            img0, mask0, latent_avg=latent_avg0, randomize_noise=False,
        )
    )(k)


def cast_pytree_bf16(tree):
    """float32 leaves -> bfloat16 (params + activations low-precision mode)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        tree,
    )


def load_net3(opts, checkpoint_path: Optional[str] = None):
    """Returns (net, variables, latent_avg). With opts.bf16 the params and
    latent_avg are cast to bfloat16 (demod/accumulation stay f32 inside the
    ops); ~1.2x swap-core speedup measured on v5e."""
    net = build_net(opts)
    checkpoint_path = checkpoint_path or getattr(opts, "checkpoint_path", None)
    latent_avg = jnp.zeros((opts.n_styles, 512), jnp.float32)

    if checkpoint_path and os.path.exists(checkpoint_path):
        if os.path.isdir(checkpoint_path):  # orbax
            import orbax.checkpoint as ocp

            payload = ocp.PyTreeCheckpointer().restore(
                os.path.abspath(checkpoint_path)
            )
            variables = {
                "params": payload["params"],
                "noises": payload.get("noises", {}),
            }
            if payload.get("latent_avg") is not None:
                latent_avg = jnp.asarray(payload["latent_avg"])
        else:  # torch .pt
            from e4s_tpu.utils.torch_convert import load_e4s_checkpoint

            variables, _, la, _ = load_e4s_checkpoint(
                checkpoint_path, opts.num_seg_cls
            )
            variables = jax.tree_util.tree_map(jnp.asarray, variables)
            if la is not None:
                latent_avg = jnp.asarray(la)
    else:
        if checkpoint_path:
            print(
                f"[e4s_tpu] WARNING: checkpoint {checkpoint_path} not found; "
                "using random init"
            )
        variables = init_variables(net, opts)
    if getattr(opts, "bf16", False):
        variables = cast_pytree_bf16(variables)
        latent_avg = latent_avg.astype(jnp.bfloat16)
    return net, variables, latent_avg


def load_face_parser(opts, ckpt_path: Optional[str] = None):
    """Face parser by name (ref: face_parsing_demo.py:179-186):
    ``default`` -> BiSeNet (face-parsing.PyTorch taxonomy);
    ``segnext`` -> SegNeXt MSCAN+LightHamHead (CelebA taxonomy).
    Converted torch/mmseg weights when available, else random."""
    name = getattr(opts, "faceParser_name", "default")
    if name == "segnext":
        from e4s_tpu.models.segnext import SegNeXtFaceParser

        variant = getattr(opts, "segnext_variant", None)
        cfg = getattr(opts, "segnext_config", "") or ""
        if variant is None:
            # infer from the mmseg config filename, e.g.
            # segnext.small.512x512.celebamaskhq.160k.py
            variant = next(
                (v for v in ("tiny", "small", "base", "large") if v in cfg),
                "small",
            )
        if ckpt_path and os.path.exists(ckpt_path):
            from e4s_tpu.utils.torch_convert import load_segnext_checkpoint

            variables, variant = load_segnext_checkpoint(
                ckpt_path, variant=variant
            )
            variables = jax.tree_util.tree_map(jnp.asarray, variables)
            return SegNeXtFaceParser(variant=variant, variables=variables)
        if ckpt_path:
            print(
                f"[e4s_tpu] WARNING: segnext ckpt {ckpt_path} not found; "
                "random init"
            )
        return SegNeXtFaceParser(variant=variant)

    from e4s_tpu.models.bisenet import FaceParser

    if ckpt_path and os.path.exists(ckpt_path):
        from e4s_tpu.utils.torch_convert import load_bisenet_checkpoint

        variables = jax.tree_util.tree_map(
            jnp.asarray, load_bisenet_checkpoint(ckpt_path)
        )
        return FaceParser(variables=variables, size=opts.out_size)
    if ckpt_path:
        print(
            f"[e4s_tpu] WARNING: parser ckpt {ckpt_path} not found; random init"
        )
    return FaceParser(size=opts.out_size)
