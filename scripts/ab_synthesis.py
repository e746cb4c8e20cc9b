"""Interleaved same-process A/B of a synthesis-path dispatch env knob.

Traces the masked-synthesis stage twice in one process (the env knob is
read at trace time), then alternates timed rounds A,B,A,B,... so axon
tunnel drift hits both variants equally. Reports per-round means and the
min-of-means per variant (min is the right statistic on a noisy shared
tunnel).

AB_ENV picks the knob (default E4S_TPU_UP_STACKED; e.g. set
AB_ENV=E4S_TPU_PACKED_TAIL to A/B the packed tail).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS = int(os.environ.get("AB_ITERS", "20"))
ROUNDS = int(os.environ.get("AB_ROUNDS", "4"))
OUT_SIZE = int(os.environ.get("AB_OUT_SIZE", "1024"))
AB_ENV = os.environ.get("AB_ENV", "E4S_TPU_UP_STACKED")
# knob values for the two arms (default a boolean knob; e.g. for
# AB_ENV=E4S_TPU_PACKED_MIN_RES use AB_VAL_OFF=1024 AB_VAL_ON=512)
AB_VAL_OFF = os.environ.get("AB_VAL_OFF", "0")
AB_VAL_ON = os.environ.get("AB_VAL_ON", "1")
AB_BATCH = int(os.environ.get("AB_BATCH", "1"))


def main():
    import jax
    import jax.numpy as jnp

    from e4s_tpu.models.net3 import Net3
    from e4s_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    S, R = OUT_SIZE, 12
    net = Net3(
        out_size=S, remaining_layer_idx=13, n_styles=18, channels_last=True
    )
    B = AB_BATCH
    rng = np.random.RandomState(0)
    driven = jnp.asarray(rng.rand(B, 3, S, S).astype(np.float32) * 2 - 1)
    lab = np.zeros((B, S, S), np.int32)
    yy, xx = np.mgrid[0:S, 0:S]
    rad = np.hypot(yy - S / 2, xx - S / 2)
    lab[:, rad < S * 0.4] = 6
    oh = np.zeros((B, R, S, S), np.float32)
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
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t
    )
    variables, driven, onehot, latent_avg = cast(
        (variables, driven, onehot, latent_avg)
    )

    enc = jax.jit(
        lambda v, i, m: net.apply(v, i, m, method=Net3.get_style_vectors)[0]
    )
    sv = enc(variables, driven, onehot)
    codes = jax.jit(
        lambda v, s, la: net.apply(v, s, la, method=Net3.cal_style_codes)
    )(variables, sv, latent_avg)
    struc = jnp.zeros((B, 512, 32, 32), driven.dtype)

    def mk_synth():
        return jax.jit(
            lambda v, st, c, m: net.apply(
                v, st, c, m, method=Net3.gen_img, randomize_noise=False
            )[0]
        )

    def sync(x):
        return float(jnp.mean(jnp.asarray(x, jnp.float32)))

    fns = {}
    for name, env in (("off", AB_VAL_OFF), ("on", AB_VAL_ON)):
        os.environ[AB_ENV] = env
        f = mk_synth()
        sync(f(variables, struc, codes, onehot))  # compile
        for _ in range(2):
            sync(f(variables, struc, codes, onehot))  # axon warmup
        fns[name] = f

    rounds = {"off": [], "on": []}
    for r in range(ROUNDS):
        for name in ("off", "on") if r % 2 == 0 else ("on", "off"):
            f = fns[name]
            out = f(variables, struc, codes, onehot)
            sync(out)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = f(variables, struc, codes, onehot)
            sync(out)
            rounds[name].append(
                (time.perf_counter() - t0) / ITERS * 1000.0
            )

    print(json.dumps({
        "metric": "synthesis_ab", "env": AB_ENV,
        "out_size": OUT_SIZE,
        "iters": ITERS,
        "rounds_off_ms": [round(v, 3) for v in rounds["off"]],
        "rounds_on_ms": [round(v, 3) for v in rounds["on"]],
        "min_off_ms": round(min(rounds["off"]), 3),
        "min_on_ms": round(min(rounds["on"]), 3),
    }))


if __name__ == "__main__":
    main()
