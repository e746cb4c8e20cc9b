"""Stage-level breakdown of the training G step on the current backend.

Times (a) the Net3 forward, (b) each loss term's forward as its own jitted
program against a fixed recon, (c) the fused loss forward, and (d) the full
G step (grad + optimizer) — so training optimization effort can target the
dominant term. Stage sum != step time is expected: the real step pays each
loss net's forward AND backward inside one fused program.

Prints one JSON line. Env knobs: PROF_OUT_SIZE, PROF_ITERS, PROF_BF16
(default 1), PROF_BATCH.

NOTE (axon): jax.block_until_ready is not a sync barrier — every timing
forces a scalar host readback; first 1-2 executions of each program are
slow (remote load) and excluded by warmup.
"""

import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT_SIZE = int(os.environ.get("PROF_OUT_SIZE", "1024"))
ITERS = int(os.environ.get("PROF_ITERS", "10"))
BF16 = os.environ.get("PROF_BF16", "1") == "1"
BATCH = int(os.environ.get("PROF_BATCH", "2"))


def main():
    import jax
    import jax.numpy as jnp

    from e4s_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from e4s_tpu.datasets.dataset import SyntheticFaceDataset, label_map_to_onehot
    from e4s_tpu.parallel.mesh import shard_batch
    from e4s_tpu.training.coach import Coach

    opts = types.SimpleNamespace(
        exp_dir="/tmp/e4s_train_prof", num_seg_cls=12, out_size=OUT_SIZE,
        remaining_layer_idx=13, n_styles=18, start_from_latent_avg=True,
        learn_in_w=False, train_G=True, train_D=True, n_devices=1,
        d_reg_every=-1, d_every=15, max_steps=10, board_interval=1000,
        val_interval=10**6, save_interval=10**6, image_interval=0,
        seed=0, learning_rate=1e-4, optim_name="adam", batch_size=BATCH,
        dataset_name="synthetic", ds_frac=1.0, flip_p=0.5,
        lpips_lambda=0.8, id_lambda=0.1, id_loss_multiscale=True,
        face_parsing_lambda=0.1, l2_lambda=1.0, w_norm_lambda=0.0,
        r1_lambda=10.0, g_adv_lambda=0.01, style_lambda=0.0,
        style_loss_norm=1, no_tensorboard=True, latent_avg_samples=1000,
        bf16=BF16,
    )
    coach = Coach(opts)
    ds = SyntheticFaceDataset(size=OUT_SIZE, num_seg_cls=12)
    imgs, labels = zip(*[(ds[i][0], ds[i][1]) for i in range(BATCH)])
    img = np.stack(imgs).astype(np.float32)
    label = np.stack(labels).astype(np.int32)
    onehot = label_map_to_onehot(label, 12)
    img, label, onehot = shard_batch((img, label, onehot), coach.mesh)
    rng = jax.random.PRNGKey(0)
    state = coach.state

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

    class _Results(dict):
        # progress lines to stderr so a crash mid-run loses nothing
        def __setitem__(self, k, v):
            print(f"[profile_train] {k} = {v:.3f}", file=sys.stderr, flush=True)
            super().__setitem__(k, v)

    results = _Results()
    mp = coach._mp
    img_c, onehot_c, la_c = mp(img), mp(onehot), mp(state.latent_avg)
    params_c, noises_c = mp(state.params), mp(state.noises)

    # --- Net3 forward (encoder + style codes + masked synthesis) ---
    fwd = jax.jit(
        lambda p, n, i, o, la: coach._net_forward(p, n, i, o, la, rng)[0]
    )
    results["net_forward_ms"] = timeit(
        fwd, params_c, noises_c, img_c, onehot_c, la_c
    )
    recon = fwd(params_c, noises_c, img_c, onehot_c, la_c)

    # --- individual loss-term forwards against the fixed recon ---
    from e4s_tpu.ops.resize import adaptive_avg_pool2d

    lp = jax.jit(
        lambda r, i: coach.parsing_loss.apply(coach.loss_vars["parsing"], r, i)[0]
    )
    results["loss_parsing_ms"] = timeit(lp, recon, img_c)

    lid = jax.jit(
        lambda r, i: coach.id_loss.apply(coach.loss_vars["id"], r, i)[0]
    )
    results["loss_id_ms"] = timeit(lid, recon, img_c)

    def lpips_all(r, i):
        acc = 0.0
        for k in range(3):
            s = max(OUT_SIZE // (2**k), 32)
            acc = acc + coach.lpips.apply(
                coach.loss_vars["lpips"],
                adaptive_avg_pool2d(r, (s, s)),
                adaptive_avg_pool2d(i, (s, s)),
            )
        return acc

    results["loss_lpips3_ms"] = timeit(jax.jit(lpips_all), recon, img_c)

    l2 = jax.jit(lambda r, i: jnp.mean(jnp.square((r - i).astype(jnp.float32))))
    results["loss_l2_ms"] = timeit(l2, recon, img_c)

    dfwd = jax.jit(lambda pd, r: coach.D.apply({"params": pd}, r))
    results["d_forward_ms"] = timeit(dfwd, mp(state.params_d), recon)

    # --- full loss forward (no grad) ---
    def loss_only(p, i, o):
        r, _, latent = coach._net_forward(p, noises_c, i, o, la_c, rng)
        loss, _ = coach._calc_loss(coach.loss_vars, i, r, label, latent, la_c)
        fake = coach.D.apply({"params": mp(state.params_d)}, r)
        from e4s_tpu.criteria.adv_loss import adv_g_loss

        return (loss + opts.g_adv_lambda * adv_g_loss(fake)).astype(jnp.float32)

    results["loss_forward_ms"] = timeit(
        jax.jit(loss_only), params_c, img_c, onehot_c
    )

    # --- full G step (fwd + bwd + optimizer), the coach's real program.
    # Uses the coach's donated compiled step (a non-donating jit holds two
    # full TrainStates and OOMs the chip on top of the stage buffers), so
    # the state is chained through the loop like the real training loop.
    del recon
    st = state
    for _ in range(3):  # compile + axon warmup
        st, gl = coach._compiled_g(st, img, label, onehot, rng)
        sync(gl["loss"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        st, gl = coach._compiled_g(st, img, label, onehot, rng)
    sync(gl["loss"])
    results["g_step_ms"] = (time.perf_counter() - t0) / ITERS * 1000.0

    print(json.dumps({
        "metric": "train_stage_breakdown",
        "out_size": OUT_SIZE,
        "batch": BATCH,
        "bf16": BF16,
        "backend": jax.default_backend(),
        **{k: round(v, 3) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
