"""Benchmark harness — prints ONE JSON line for the driver.

Flagship metric: 1024px swaps/sec/chip for the core swap compute (style
extraction x2 + texture swap + mask-guided 1024^2 synthesis), plus p50
end-to-end core latency and batched throughput.

vs_baseline semantics: the reference publishes no numbers (BASELINE.md); the
driver's north star is ">=5x CPU-reference throughput". We therefore measure
the same jitted core on the host CPU backend once (cached in
.bench_cpu_baseline.json) and report vs_baseline = tpu_throughput /
(5 * cpu_throughput), i.e. >= 1.0 means the target is met.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

OUT_SIZE = int(os.environ.get("BENCH_OUT_SIZE", "1024"))
BATCH = int(os.environ.get("BENCH_BATCH", "1"))
ITERS = int(os.environ.get("BENCH_ITERS", "20"))
BF16 = os.environ.get("BENCH_BF16", "0") == "1"
CPU_BASELINE_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_cpu_baseline.json"
)


def _build(backend_devices=None):
    import jax
    import jax.numpy as jnp

    from e4s_tpu.models.net3 import Net3
    from e4s_tpu.pipelines.swap_core import make_swap_core

    net = Net3(out_size=OUT_SIZE, remaining_layer_idx=13, n_styles=18)
    S, R = OUT_SIZE, 12

    rng = np.random.RandomState(0)
    driven = jnp.asarray(rng.rand(BATCH, 3, S, S).astype(np.float32) * 2 - 1)
    target = jnp.asarray(rng.rand(BATCH, 3, S, S).astype(np.float32) * 2 - 1)

    def onehot_like(seed):
        r = np.random.RandomState(seed)
        yy, xx = np.mgrid[0:S, 0:S]
        lab = np.zeros((BATCH, S, S), np.int32)
        rad = np.hypot(yy - S / 2, xx - S / 2)
        lab[:, rad < S * 0.4] = 6
        lab[:, rad < S * 0.12] = 5
        lab[:, (yy < S * 0.3) & (rad < S * 0.48)] = 4
        oh = np.zeros((BATCH, R, S, S), np.float32)
        for c in range(R):
            oh[:, c] = lab == c
        return jnp.asarray(oh)

    d_oh, t_oh, s_oh = onehot_like(1), onehot_like(2), onehot_like(3)
    latent_avg = jnp.asarray(rng.randn(18, 512).astype(np.float32) * 0.1)

    init_img = driven[:1]
    init_mask = d_oh[:1]
    variables = jax.jit(
        lambda k: net.init(
            {"params": k, "noise": k}, init_img, init_mask,
            latent_avg=latent_avg, randomize_noise=False,
        )
    )(jax.random.PRNGKey(0))

    if BF16:
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            t,
        )
        variables = cast(variables)
        driven, target = cast((driven, target))
        d_oh, t_oh, s_oh = cast((d_oh, t_oh, s_oh))
        latent_avg = cast(latent_avg)

    core = jax.jit(make_swap_core(net))
    args = (variables, driven, target, d_oh, t_oh, s_oh, latent_avg)
    return core, args


def _sync(x):
    """Force completion + host readback of a scalar derived from x.

    NOTE: jax.block_until_ready does NOT synchronize on the axon TPU backend
    (remote execution); a host transfer is the only reliable barrier.
    """
    import jax.numpy as jnp

    return float(jnp.mean(x))


def _time_core(core, args, iters):
    """Returns (seconds/iter throughput, seconds p50 single-call latency).

    Throughput: independent back-to-back dispatches with one final sync —
    executions serialise on the single chip while dispatch overlaps, so
    total/iters is the true device time per swap. Latency: per-call host
    sync (includes the dispatch round trip).
    """
    out = core(*args)
    _sync(out)  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = core(*args)
    _sync(out)
    per_iter = (time.perf_counter() - t0) / iters

    lat = []
    for _ in range(min(iters, 5)):
        t0 = time.perf_counter()
        _sync(core(*args))
        lat.append(time.perf_counter() - t0)
    return per_iter, float(np.median(lat))


def _cpu_baseline():
    """Swaps/sec of the same core on the CPU backend (cached)."""
    if os.path.exists(CPU_BASELINE_CACHE):
        try:
            with open(CPU_BASELINE_CACHE) as f:
                d = json.load(f)
            if d.get("out_size") == OUT_SIZE and d.get("batch") == BATCH:
                return d["swaps_per_sec"]
        except Exception:
            pass
    if os.environ.get("BENCH_SKIP_CPU_BASELINE"):
        return None
    import jax

    try:
        cpu = jax.devices("cpu")
    except RuntimeError:
        return None
    with jax.default_device(cpu[0]):
        core, args = _build()
        med, _ = _time_core(core, args, iters=2)
    sps = BATCH / med
    with open(CPU_BASELINE_CACHE, "w") as f:
        json.dump(
            {"out_size": OUT_SIZE, "batch": BATCH, "swaps_per_sec": sps}, f
        )
    return sps


def main():
    import jax

    from e4s_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    core, args = _build()
    med, p50_latency = _time_core(core, args, ITERS)
    swaps_per_sec = BATCH / med

    cpu_sps = None
    try:
        cpu_sps = _cpu_baseline()
    except Exception:
        cpu_sps = None

    vs_baseline = (
        swaps_per_sec / (5.0 * cpu_sps) if cpu_sps else None
    )
    result = {
        "metric": "1024px_swaps_per_sec_per_chip",
        "value": round(swaps_per_sec, 4),
        "unit": "swaps/s",
        "vs_baseline": round(vs_baseline, 4) if vs_baseline else None,
        "p50_latency_ms": round(p50_latency * 1000, 2),
        "batch": BATCH,
        "out_size": OUT_SIZE,
        "backend": jax.default_backend(),
        "bf16": BF16,
        "cpu_baseline_swaps_per_sec": round(cpu_sps, 5) if cpu_sps else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
