"""Aux-net converter structural tests: build synthetic torch-style state
dicts (names per the reference module naming, values random) and check the
converted trees load into the flax models exactly (keys + shapes align)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s_tpu.utils import torch_convert as tc


def tree_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(tree_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v).shape
    return out


def _flatten_to_torch_names(tree, sep=".", prefix=""):
    out = {}
    for k, v in tree.items():
        name = f"{prefix}{sep}{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten_to_torch_names(v, sep, name))
        else:
            out[name] = np.asarray(v)
    return out


def test_kp_detector_converter_structure():
    from e4s_tpu.models.facevid2vid.keypoint_detector import KPDetector

    model = KPDetector(num_blocks=2, max_features=64, block_expansion=8,
                       reshape_channel=64, reshape_depth=4, scale_factor=1)
    x = jnp.zeros((1, 3, 32, 32))
    variables = model.init(jax.random.PRNGKey(0), x)

    # fabricate the torch dict from our structure using reference names
    sd = {}
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def put_convnorm(torch_p, flax_p):
        sd[f"{torch_p}.conv.weight"] = params
        # handled generically below

    # generic emit: walk our params and map names back
    def emit(prefix_t, tree_p, tree_s):
        for k, v in tree_p.items():
            if k.startswith("down_") or k.startswith("up_"):
                i = k.split("_")[1]
                base = (
                    f"predictor.down_blocks.down{i}" if k.startswith("down_")
                    else f"predictor.up_blocks.up{i}"
                )
                sd[f"{base}.conv.weight"] = np.asarray(v["conv"]["weight"])
                sd[f"{base}.conv.bias"] = np.asarray(v["conv"]["bias"])
                sd[f"{base}.norm.weight"] = np.asarray(v["norm"]["weight"])
                sd[f"{base}.norm.bias"] = np.asarray(v["norm"]["bias"])
                st = tree_s[k]["norm"]
                sd[f"{base}.norm.running_mean"] = np.asarray(st["running_mean"])
                sd[f"{base}.norm.running_var"] = np.asarray(st["running_var"])
            elif k == "conv":
                sd["predictor.conv.weight"] = np.asarray(v["weight"])
                sd["predictor.conv.bias"] = np.asarray(v["bias"])

    emit("predictor", params["predictor"], stats.get("predictor", {}))
    sd["kp.weight"] = np.asarray(params["kp"]["weight"])
    sd["kp.bias"] = np.asarray(params["kp"]["bias"])

    conv_params, conv_stats = tc.convert_kp_detector(sd)
    assert tree_paths(conv_params) == tree_paths(params)
    assert tree_paths(conv_stats) == tree_paths(stats)


def test_rrdbnet_converter_structure():
    from e4s_tpu.models.gpen.rrdbnet import RRDBNet

    model = RRDBNet(scale=4, num_block=2, num_feat=16, num_grow_ch=8)
    x = jnp.zeros((1, 3, 8, 8))
    variables = model.init(jax.random.PRNGKey(0), x)
    params = variables["params"]

    sd = {}
    for name in ("conv_first", "conv_body", "conv_up1", "conv_up2",
                 "conv_hr", "conv_last"):
        sd[f"{name}.weight"] = np.asarray(params[name]["weight"])
        sd[f"{name}.bias"] = np.asarray(params[name]["bias"])
    for i in range(2):
        for rdb in ("rdb1", "rdb2", "rdb3"):
            for c in range(1, 6):
                blk = params[f"body_{i}"][rdb][f"conv{c}"]
                sd[f"body.{i}.{rdb}.conv{c}.weight"] = np.asarray(blk["weight"])
                sd[f"body.{i}.{rdb}.conv{c}.bias"] = np.asarray(blk["bias"])
    converted = tc.convert_rrdbnet(sd)
    assert tree_paths(converted) == tree_paths(params)
    out = model.apply({"params": converted}, x)
    assert out.shape == (1, 3, 32, 32)


def test_gpen_full_generator_converter_structure():
    from e4s_tpu.models.gpen.gpen_model import GPENFullGenerator

    model = GPENFullGenerator(size=32)
    x = jnp.zeros((1, 3, 32, 32))
    variables = model.init(jax.random.PRNGKey(0), x)
    params = variables["params"]

    sd = {}
    # encoder: ecd0 plain (conv at .0.0, act at .0.1); ecd1+ downsample
    # (Blur at .0.0, conv at .0.1, act at .0.2)
    for key, sub in params.items():
        if key == "generator":
            continue
        if key == "final_linear":
            sd["final_linear.0.weight"] = np.asarray(sub["weight"])
            sd["final_linear.0.bias"] = np.asarray(sub["bias"])
            continue
        idx = int(key[3:])
        if idx == 0:
            sd[f"{key}.0.0.weight"] = np.asarray(sub["conv"]["weight"])
            sd[f"{key}.0.1.bias"] = np.asarray(sub["activate"]["bias"])
        else:
            sd[f"{key}.0.1.weight"] = np.asarray(sub["conv"]["weight"])
            sd[f"{key}.0.2.bias"] = np.asarray(sub["activate"]["bias"])
    g = params["generator"]
    for key, sub in g.items():
        if key.startswith("style_"):
            i = key.split("_")[1]
            sd[f"generator.style.{i}.weight"] = np.asarray(sub["weight"])
            sd[f"generator.style.{i}.bias"] = np.asarray(sub["bias"])
        elif key == "input":
            sd["generator.input.input"] = np.asarray(sub)
        elif key == "conv1" or key.startswith("convs_"):
            p = ("generator.conv1" if key == "conv1"
                 else "generator.convs." + key.rsplit("_", 1)[1])
            sd[f"{p}.conv.weight"] = np.asarray(sub["conv"]["weight"])[None]
            sd[f"{p}.conv.modulation.weight"] = np.asarray(sub["conv"]["modulation"]["weight"])
            sd[f"{p}.conv.modulation.bias"] = np.asarray(sub["conv"]["modulation"]["bias"])
            sd[f"{p}.noise.weight"] = np.asarray(sub["noise_weight"])
            sd[f"{p}.activate.bias"] = np.asarray(sub["activate"]["bias"])
        elif key == "to_rgb1" or key.startswith("to_rgbs_"):
            p = ("generator.to_rgb1" if key == "to_rgb1"
                 else "generator.to_rgbs." + key.rsplit("_", 1)[1])
            sd[f"{p}.conv.weight"] = np.asarray(sub["conv"]["weight"])[None]
            sd[f"{p}.conv.modulation.weight"] = np.asarray(sub["conv"]["modulation"]["weight"])
            sd[f"{p}.conv.modulation.bias"] = np.asarray(sub["conv"]["modulation"]["bias"])
            sd[f"{p}.bias"] = np.asarray(sub["bias"])

    converted = tc.convert_gpen_full_generator(sd)
    assert tree_paths(converted) == tree_paths(params)


def test_spectral_norm_folding():
    rng = np.random.RandomState(0)
    w = rng.randn(8, 4, 3, 3).astype(np.float64)
    u = rng.randn(8)
    v = rng.randn(4 * 9)
    sd = {"c.weight_orig": w, "c.weight_u": u, "c.weight_v": v}
    folded = tc.fold_spectral_norm(sd, "c")
    sigma = float(u @ (w.reshape(8, -1) @ v))
    np.testing.assert_allclose(folded, w / sigma)
