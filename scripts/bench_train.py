"""Training-step benchmark: full G step (all losses) at 1024^2 on one chip.

Prints one JSON line: steady-state img/s/chip and step time. Note the axon
runtime executes the first ~2 iterations of a large program slowly (warmup);
they are excluded.

Reference anchor: 8xA100, global batch 16, ~2 days / 300K iters
(BASELINE.md) -> ~3.5 img/s per A100.
"""

import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from e4s_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from e4s_tpu.datasets.dataset import SyntheticFaceDataset, label_map_to_onehot
    from e4s_tpu.parallel.mesh import shard_batch
    from e4s_tpu.training.coach import Coach

    out_size = int(os.environ.get("BENCH_OUT_SIZE", "1024"))
    batch = int(os.environ.get("BENCH_BATCH", "2"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    bf16 = os.environ.get("BENCH_TRAIN_BF16", "0") == "1"

    opts = types.SimpleNamespace(
        exp_dir="/tmp/e4s_train_bench", num_seg_cls=12, out_size=out_size,
        remaining_layer_idx=13, n_styles=18, start_from_latent_avg=True,
        learn_in_w=False, train_G=True, train_D=True, n_devices=1,
        d_reg_every=-1, d_every=15, max_steps=10, board_interval=1000,
        val_interval=10**6, save_interval=10**6, image_interval=0,
        seed=0, learning_rate=1e-4, optim_name="adam", batch_size=batch,
        dataset_name="synthetic", ds_frac=1.0, flip_p=0.5,
        lpips_lambda=0.8, id_lambda=0.1, id_loss_multiscale=True,
        face_parsing_lambda=0.1, l2_lambda=1.0, w_norm_lambda=0.0,
        r1_lambda=10.0, g_adv_lambda=0.01, style_lambda=0.0, style_loss_norm=1,
        no_tensorboard=True, latent_avg_samples=1000, bf16=bf16,
    )
    coach = Coach(opts)
    ds = SyntheticFaceDataset(size=out_size, num_seg_cls=12)
    imgs, labels = zip(*[(ds[i][0], ds[i][1]) for i in range(batch)])
    img = np.stack(imgs).astype(np.float32)
    label = np.stack(labels).astype(np.int32)
    onehot = label_map_to_onehot(label, 12)
    img, label, onehot = shard_batch((img, label, onehot), coach.mesh)
    rng = jax.random.PRNGKey(0)

    # compile + axon warmup (first large-program executions are slow)
    for _ in range(3):
        coach.state, gl = coach._compiled_g(coach.state, img, label, onehot, rng)
        float(gl["loss"])

    t0 = time.perf_counter()
    for _ in range(iters):
        coach.state, gl = coach._compiled_g(coach.state, img, label, onehot, rng)
    loss = float(gl["loss"])  # host readback = sync barrier
    dt = (time.perf_counter() - t0) / iters

    print(json.dumps({
        "metric": "train_g_step_imgs_per_sec_per_chip",
        "value": round(batch / dt, 3),
        "unit": "img/s",
        "step_time_s": round(dt, 4),
        "batch": batch,
        "out_size": out_size,
        "loss": round(loss, 4),
        "bf16": bf16,
        "a100_reference_imgs_per_sec": 3.5,
    }))


if __name__ == "__main__":
    main()
