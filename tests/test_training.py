"""End-to-end training smoke test on the virtual 8-device CPU mesh.

Runs real G and D steps (all losses active) of a small-config coach over the
synthetic dataset, sharded batch over the data axis — the JAX-native "fake
cluster" test of the reference's DDP training (SURVEY §2.10).
"""

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s_tpu.training.coach import Coach, TrainState, trainable_mask


def small_opts(**kw):
    base = dict(
        exp_dir="/tmp/e4s_tpu_test_exp",
        num_seg_cls=12,
        out_size=64,
        remaining_layer_idx=7,
        n_styles=10,
        start_from_latent_avg=True,
        learn_in_w=False,
        train_G=True,
        train_D=True,
        n_devices=None,
        d_reg_every=-1,
        d_every=2,
        max_steps=3,
        board_interval=1,
        val_interval=1000,
        save_interval=1000,
        image_interval=0,
        seed=0,
        learning_rate=1e-4,
        optim_name="adam",
        batch_size=1,
        dataset_name="synthetic",
        ds_frac=1.0,
        flip_p=0.5,
        # loss lambdas
        lpips_lambda=0.8,
        id_lambda=0.1,
        id_loss_multiscale=True,
        face_parsing_lambda=0.1,
        l2_lambda=1.0,
        w_norm_lambda=0.0,
        r1_lambda=10.0,
        g_adv_lambda=0.01,
        style_lambda=0.0,
        style_loss_norm=1,
    )
    base.update(kw)
    return types.SimpleNamespace(**base)


@pytest.mark.slow
def test_coach_trains_on_8dev_mesh(tmp_path):
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    # NB: mesh over 4 of the 8 virtual devices. This CI host has a single
    # physical core; 8-way collective rendezvous under that starvation
    # occasionally hard-aborts inside XLA:CPU. 4-way still exercises the
    # sharding + all-reduce path. (The driver dryrun uses all 8.)
    opts = small_opts(exp_dir=str(tmp_path), n_devices=4)
    coach = Coach(opts)
    assert coach.n_data == 4
    assert coach.global_batch == 4

    params_before = jax.device_get(
        coach.state.params["MLPs_0"]["fc1"]["weight"]
    )
    g_before = jax.device_get(
        coach.state.params["G"]["convs_0"]["conv"]["weight"]
    )
    style_before = jax.device_get(
        coach.state.params["G"]["style_1"]["weight"]
    )
    frozen_conv_before = jax.device_get(
        coach.state.params["G"]["convs_7"]["conv"]["weight"]  # layer idx 8 >= K=7
    )

    # no weak-typed leaves: a weak->strong aval flip after the first update
    # forces silent jit retraces of the (minutes-long on TPU) train step
    weak = [
        jax.tree_util.keystr(p)
        for p, leaf in jax.tree_util.tree_leaves_with_path(coach.state)
        if leaf is not None and getattr(leaf, "weak_type", False)
    ]
    assert not weak, f"weak-typed TrainState leaves would retrace: {weak[:5]}"

    coach.train(max_steps=2)

    # steps must reuse the compiled executables (aval drift = retrace)
    for fn in (coach._compiled_g, coach._compiled_d):
        try:
            assert fn._cache_size() <= 1
        except AttributeError:
            pass

    params_after = jax.device_get(coach.state.params["MLPs_0"]["fc1"]["weight"])
    g_after = jax.device_get(coach.state.params["G"]["convs_0"]["conv"]["weight"])
    style_after = jax.device_get(coach.state.params["G"]["style_1"]["weight"])
    frozen_conv_after = jax.device_get(
        coach.state.params["G"]["convs_7"]["conv"]["weight"]
    )

    assert not np.allclose(params_before, params_after), "MLPs should train"
    assert not np.allclose(g_before, g_after), "early G convs should train"
    np.testing.assert_array_equal(style_before, style_after)  # style MLP frozen
    np.testing.assert_array_equal(frozen_conv_before, frozen_conv_after)
    # metrics written
    assert (tmp_path / "logs" / "metrics.jsonl").exists()


@pytest.mark.slow
@pytest.mark.parametrize("n_dev", [2, 8])
def test_aux_losses_shard_on_mesh(tmp_path, n_dev):
    """Frozen-aux-net GRADIENT paths under data parallelism: one jitted G
    step on a 2- and (driver-width) 8-device mesh with LPIPS/ID/parsing
    lambdas > 0 (the narrowed driver dryrun zeroes ID/parsing; this keeps
    the differentiated frozen-net graphs' collectives exercised in-suite at
    the dryrun's mesh width). Also asserts loss_vars flows through the step
    as a jit ARGUMENT, not a closure — the closure variant embedded device
    arrays as MLIR constants and crashed trace-time on the real TPU
    (BENCH_r03)."""
    import inspect

    from e4s_tpu.datasets.dataset import (
        SyntheticFaceDataset,
        label_map_to_onehot,
    )
    from e4s_tpu.parallel.mesh import shard_batch

    opts = small_opts(exp_dir=str(tmp_path), n_devices=n_dev, batch_size=1)
    coach = Coach(opts)
    assert coach.n_data == n_dev

    # the jitted step signature must carry loss_vars explicitly
    assert "loss_vars" in inspect.signature(coach._g_step).parameters
    assert "loss_vars" in inspect.signature(coach._eval_step_impl).parameters

    ds = SyntheticFaceDataset(size=64, num_seg_cls=12)
    img = np.stack([ds[i][0] for i in range(n_dev)]).astype(np.float32)
    label = np.stack([ds[i][1] for i in range(n_dev)]).astype(np.int32)
    onehot = label_map_to_onehot(label, 12)
    b = shard_batch((img, label, onehot), coach.mesh)

    rng = jax.random.PRNGKey(0)
    coach.state, g_l = coach._compiled_g(coach.state, b[0], b[1], b[2], rng)
    for key in ("loss_lpips", "loss_id", "loss_face_parsing", "loss"):
        assert key in g_l and np.isfinite(float(g_l[key])), (key, g_l)
    # grads were psum'd over the data axis: updated params stay replicated
    w = coach.state.params["MLPs_0"]["fc1"]["weight"]
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


@pytest.mark.slow
def test_mixed_precision_training_step(tmp_path):
    """bf16 compute / f32 master weights: the mp G+D steps run, keep the
    params f32, and produce losses close to the f32 steps from the same
    init."""
    from e4s_tpu.datasets.dataset import (
        SyntheticFaceDataset,
        label_map_to_onehot,
    )
    from e4s_tpu.parallel.mesh import shard_batch

    ds = SyntheticFaceDataset(size=64, num_seg_cls=12)
    img = np.stack([ds[0][0]]).astype(np.float32)
    label = np.stack([ds[0][1]]).astype(np.int32)
    onehot = label_map_to_onehot(label, 12)
    rng = jax.random.PRNGKey(0)

    losses = {}
    for mp in (False, True):
        opts = small_opts(
            exp_dir=str(tmp_path / f"mp_{mp}"), n_devices=1, bf16=mp
        )
        coach = Coach(opts)
        b = shard_batch((img, label, onehot), coach.mesh)
        coach.state, d_l = coach._compiled_d(coach.state, b[0], b[2], rng)
        coach.state, g_l = coach._compiled_g(coach.state, b[0], b[1], b[2], rng)
        assert all(np.isfinite(float(v)) for v in g_l.values())
        assert all(np.isfinite(float(v)) for v in d_l.values())
        # master weights + optimizer state stay f32
        for leaf in jax.tree_util.tree_leaves(coach.state.params):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(coach.state.opt_state):
            if hasattr(leaf, "dtype") and jnp.issubdtype(
                leaf.dtype, jnp.floating
            ):
                assert leaf.dtype == jnp.float32
        losses[mp] = (float(g_l["loss"]), float(d_l["d_loss"]))

    for f32_v, bf16_v in zip(losses[False], losses[True]):
        assert abs(f32_v - bf16_v) <= 0.05 * abs(f32_v) + 5e-2, (
            f"bf16 step diverged from f32: {losses}"
        )


def test_trainable_mask_rules():
    params = {
        "encoder": {"w": np.zeros(1)},
        "MLPs_0": {"w": np.zeros(1)},
        "G": {
            "style_1": {"weight": np.zeros(1)},
            "conv1": {"conv": {"weight": np.zeros(1)}},
            "convs_0": {"conv": {"weight": np.zeros(1)}},
            "convs_12": {"conv": {"weight": np.zeros(1)}},  # layer 13 >= K
            "to_rgbs_0": {"conv": {"weight": np.zeros(1)}},
            "to_rgbs_5": {"conv": {"weight": np.zeros(1)}},  # 2*5+3=13 >= K
        },
    }
    mask = trainable_mask(params, train_G=True, remaining_layer_idx=13)
    assert mask["encoder"]["w"] and mask["MLPs_0"]["w"]
    assert not mask["G"]["style_1"]["weight"]
    assert mask["G"]["conv1"]["conv"]["weight"]
    assert mask["G"]["convs_0"]["conv"]["weight"]
    assert not mask["G"]["convs_12"]["conv"]["weight"]
    assert mask["G"]["to_rgbs_0"]["conv"]["weight"]
    assert not mask["G"]["to_rgbs_5"]["conv"]["weight"]

    mask_frozen_g = trainable_mask(params, train_G=False, remaining_layer_idx=13)
    assert not mask_frozen_g["G"]["conv1"]["conv"]["weight"]
    assert mask_frozen_g["encoder"]["w"]


def test_ranger_optimizer_steps():
    import optax

    from e4s_tpu.training.ranger import ranger

    tx = ranger(1e-2)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    state = tx.init(params)
    rng = np.random.RandomState(0)
    # NB: non-constant gradients — gradient centralisation (by design, as in
    # the reference Ranger) removes the per-row mean of rank>1 gradients, so
    # a constant gradient is centralised to exactly zero.
    g_w = jnp.asarray(rng.rand(4, 4).astype(np.float32) * 0.2)
    for i in range(8):
        grads = {"w": g_w, "b": jnp.ones((4,)) * 0.1}
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    assert np.all(np.isfinite(np.asarray(params["w"])))
    assert float(jnp.mean(params["b"])) < 0.0  # moved against the gradient
    assert float(jnp.std(params["w"])) > 0.0  # centralised grads still update

    # constant rank>1 gradients are centralised to zero (reference parity)
    params2 = {"w": jnp.ones((4, 4))}
    state2 = tx.init(params2)
    up2, _ = tx.update({"w": jnp.ones((4, 4)) * 0.1}, state2, params2)
    np.testing.assert_allclose(np.asarray(up2["w"]), 0.0, atol=1e-8)


@pytest.mark.slow
def test_checkpoint_resume_preserves_optimizer_state(tmp_path):
    """Save -> restore must round-trip Adam moments, D optimizer state and
    best_val_loss (the torch reference loses all three, ref coach.py:505-517).
    """
    opts = small_opts(exp_dir=str(tmp_path), n_devices=1, max_steps=2)
    coach = Coach(opts)
    coach.train(max_steps=2)
    coach.best_val_loss = 1.2345
    coach.checkpoint_me({}, is_best=False)
    ckpt = str(tmp_path / "checkpoints" / f"iteration_{coach.global_step}")

    opts2 = small_opts(exp_dir=str(tmp_path / "resumed"), n_devices=1)
    coach2 = Coach(opts2)
    coach2.load_checkpoint(ckpt)

    assert coach2.global_step == coach.global_step + 1
    assert coach2.best_val_loss == pytest.approx(1.2345)

    want = jax.device_get(jax.tree_util.tree_leaves(coach.state.opt_state))
    got = jax.device_get(jax.tree_util.tree_leaves(coach2.state.opt_state))
    assert len(want) == len(got)
    # after 2 steps the Adam moments are non-trivial; they must match exactly
    assert any(np.any(w != 0) for w in want if np.ndim(w) > 0)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)
    # the restored state must be a real optax state (NamedTuples), usable
    # directly by the jitted step
    assert type(coach2.state.opt_state) is type(coach.state.opt_state)

    want_d = jax.device_get(jax.tree_util.tree_leaves(coach.state.opt_state_d))
    got_d = jax.device_get(jax.tree_util.tree_leaves(coach2.state.opt_state_d))
    for w, g in zip(want_d, got_d):
        np.testing.assert_array_equal(w, g)


def test_dataloader_distributed_sharding():
    """DistributedSampler-equivalent semantics (ref coach.py:171-177): all
    shards use the same per-epoch permutation, cover the dataset disjointly
    (up to wrap padding) and stay the same length across processes."""
    from e4s_tpu.datasets.dataset import DataLoader

    class IdxDataset:
        def __len__(self):
            return 11  # deliberately not divisible by 4

        def __getitem__(self, i):
            img = np.full((3, 4, 4), i, np.float32)
            label = np.full((1, 4, 4), i % 12, np.int64)
            return img, label, None

    loaders = [
        DataLoader(IdxDataset(), batch_size=1, shuffle=True, seed=7,
                   num_shards=4, shard_index=r, num_prefetch=1)
        for r in range(4)
    ]
    assert all(len(l) == 3 for l in loaders)  # ceil(11/4)=3 each

    seen = []
    for l in loaders:
        ids = [int(img[0, 0, 0, 0]) for img, _, _ in l]
        assert len(ids) == 3
        seen.append(ids)
    flat = [i for ids in seen for i in ids]
    # 12 draws over 11 items: every item appears, exactly one wraps
    assert set(flat) == set(range(11))
    assert len(flat) == 12

    # same epoch -> shards disjoint before the wrap duplicates
    from collections import Counter

    dup = [k for k, c in Counter(flat).items() if c > 1]
    assert len(dup) == 1

    # epoch 2 reshuffles identically across shards (same seed+epoch)
    flat2 = [
        int(img[0, 0, 0, 0]) for l in loaders for img, _, _ in l
    ]
    assert set(flat2) == set(range(11))
    assert flat2 != flat  # reshuffled
