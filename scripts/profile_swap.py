"""Stage-level breakdown of the swap core on the current backend.

Times each stage of the fused swap program as its own jitted function —
encoder (batched x2), LocalMLP style codes, masked synthesis, BiSeNet parse,
feathered stitch — plus the fused core itself, so optimization effort can
target the dominant stage. Stage sum > fused time is expected (XLA fuses
across stage boundaries; each stand-alone program pays its own HBM
round-trips).

Prints one JSON line with per-stage ms. Env knobs: PROF_OUT_SIZE,
PROF_ITERS, PROF_BF16 (default 1), PROF_STAGES (comma list to restrict,
e.g. PROF_STAGES=encoder,synthesis).

NOTE (axon): jax.block_until_ready is not a sync barrier — every timing
forces a scalar host readback; the first 1-2 executions of each program are
slow (remote load) and excluded by the warmup loop.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT_SIZE = int(os.environ.get("PROF_OUT_SIZE", "1024"))
ITERS = int(os.environ.get("PROF_ITERS", "10"))
BF16 = os.environ.get("PROF_BF16", "1") == "1"
ONLY = [s for s in os.environ.get("PROF_STAGES", "").split(",") if s]


def main():
    import jax
    import jax.numpy as jnp

    from e4s_tpu.models.net3 import Net3
    from e4s_tpu.pipelines.swap_core import (
        make_swap_core,
        stitch_foreground,
        swap_style_vectors_device,
    )
    from e4s_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    S, R = OUT_SIZE, 12
    net = Net3(
        out_size=S, remaining_layer_idx=13, n_styles=18, channels_last=True
    )

    rng = np.random.RandomState(0)
    driven = jnp.asarray(rng.rand(1, 3, S, S).astype(np.float32) * 2 - 1)
    target = jnp.asarray(rng.rand(1, 3, S, S).astype(np.float32) * 2 - 1)

    yy, xx = np.mgrid[0:S, 0:S]
    lab = np.zeros((1, S, S), np.int32)
    rad = np.hypot(yy - S / 2, xx - S / 2)
    lab[:, rad < S * 0.4] = 6
    lab[:, rad < S * 0.12] = 5
    lab[:, (yy < S * 0.3) & (rad < S * 0.48)] = 4
    oh = np.zeros((1, R, S, S), np.float32)
    for c in range(R):
        oh[:, c] = lab == c
    onehot = jnp.asarray(oh)
    latent_avg = jnp.asarray(rng.randn(18, 512).astype(np.float32) * 0.1)

    variables = jax.jit(
        lambda k: net.init(
            {"params": k, "noise": k}, driven, onehot,
            latent_avg=latent_avg, randomize_noise=False,
        )
    )(jax.random.PRNGKey(0))

    if BF16:
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t
        )
        variables, driven, target, onehot, latent_avg = cast(
            (variables, driven, target, onehot, latent_avg)
        )

    def sync(x):
        return float(jnp.mean(jnp.asarray(x, jnp.float32)))

    def timeit(fn, *args):
        out = fn(*args)
        sync(jax.tree_util.tree_leaves(out)[0])  # compile
        for _ in range(2):  # axon warmup executions
            sync(jax.tree_util.tree_leaves(fn(*args))[0])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        sync(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / ITERS * 1000.0

    results = {}

    def want(name):
        return not ONLY or name in ONLY

    # --- stage: batched encoder (2 faces, as the core runs it) ---
    img2 = jnp.concatenate([driven, target], axis=0)
    oh2 = jnp.concatenate([onehot, onehot], axis=0)
    enc = jax.jit(
        lambda v, i, m: net.apply(v, i, m, method=Net3.get_style_vectors)[0]
    )
    if want("encoder"):
        results["encoder_x2_ms"] = timeit(enc, variables, img2, oh2)
    sv2 = enc(variables, img2, oh2)
    swapped_sv = swap_style_vectors_device(sv2[1:], sv2[:1])

    # --- stage: LocalMLP style codes ---
    codes_fn = jax.jit(
        lambda v, s, la: net.apply(v, s, la, method=Net3.cal_style_codes)
    )
    if want("style_codes"):
        results["style_codes_ms"] = timeit(
            codes_fn, variables, swapped_sv, latent_avg
        )
    codes = codes_fn(variables, swapped_sv, latent_avg)

    # --- stage: masked synthesis ---
    struc = jnp.zeros((1, 512, 32, 32), driven.dtype)
    synth = jax.jit(
        lambda v, st, c, m: net.apply(
            v, st, c, m, method=Net3.gen_img, randomize_noise=False
        )[0]
    )
    if want("synthesis"):
        results["synthesis_ms"] = timeit(synth, variables, struc, codes, onehot)
    face = synth(variables, struc, codes, onehot)

    # --- stage: parser (BiSeNet, both faces batched, on-device 19->12) ---
    if want("parse"):
        try:
            from e4s_tpu.models.bisenet import BiSeNet
            from e4s_tpu.pipelines.swap_core import parse12_device

            pm = BiSeNet(n_classes=19)
            img01_2 = (jnp.asarray(img2, jnp.float32) + 1.0) / 2.0
            pv = jax.jit(pm.init)(jax.random.PRNGKey(0), jnp.zeros(
                (1, 3, 512, 512), jnp.float32))
            if BF16:
                pv = cast(pv)
                img01_2 = img01_2.astype(jnp.bfloat16)
            parse = jax.jit(
                lambda v, i: parse12_device(pm, v, i, parser_size=512)
            )
            results["parse_x2_ms"] = timeit(parse, pv, img01_2)
        except Exception as e:
            results["parse_x2_ms"] = f"failed: {type(e).__name__}: {e}"

    # --- stage: stitch (feathered paste) ---
    if want("stitch"):
        labels = jnp.asarray(lab[:, None])
        holes = jnp.zeros_like(labels)
        stitch = jax.jit(stitch_foreground, static_argnames=("outer_dilation",))
        results["stitch_ms"] = timeit(
            lambda f, t, l, h: stitch(f, t, l, h, outer_dilation=5),
            face, target, labels, holes,
        )

    # --- fused core for reference ---
    if want("core"):
        core = jax.jit(make_swap_core(net))
        results["fused_core_ms"] = timeit(
            core, variables, driven, target, onehot, onehot, onehot, latent_avg
        )

    stage_keys = [
        "encoder_x2_ms", "style_codes_ms", "synthesis_ms", "stitch_ms"
    ]
    known = [results[k] for k in stage_keys
             if isinstance(results.get(k), float)]
    out = {
        "metric": "swap_stage_breakdown",
        "out_size": OUT_SIZE,
        "bf16": BF16,
        "backend": __import__("jax").default_backend(),
        **{k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in results.items()},
        "stage_sum_ms": round(sum(known), 3) if known else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
