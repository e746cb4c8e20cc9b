"""Checkpoint converter structural tests.

Builds a synthetic torch-style state dict (names per the reference module
naming, shapes from our flax init), converts, and checks the resulting tree
loads into the flax model exactly (same keys, same shapes) and changes the
model output (i.e. weights actually land).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s_tpu.models.stylegan2 import Generator, Discriminator
from e4s_tpu.utils import torch_convert as tc


def tree_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(tree_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v).shape
    return out


def _gen_torch_names(flax_params, noises):
    """Inverse map: our flax generator tree -> torch state-dict names."""
    sd = {}
    for key, sub in flax_params.items():
        if key.startswith("style_"):
            i = key.split("_")[1]
            sd[f"style.{i}.weight"] = sub["weight"]
            sd[f"style.{i}.bias"] = sub["bias"]
        elif key == "input":
            sd["input.input"] = sub
        elif key in ("conv1",) or key.startswith("convs_"):
            p = "conv1" if key == "conv1" else "convs." + key.rsplit("_",1)[1]
            sd[f"{p}.conv.weight"] = np.asarray(sub["conv"]["weight"])[None]
            sd[f"{p}.conv.modulation.weight"] = sub["conv"]["modulation"]["weight"]
            sd[f"{p}.conv.modulation.bias"] = sub["conv"]["modulation"]["bias"]
            sd[f"{p}.noise.weight"] = sub["noise"]["weight"]
            sd[f"{p}.activate.bias"] = sub["activate"]["bias"]
        elif key in ("to_rgb1",) or key.startswith("to_rgbs_"):
            p = "to_rgb1" if key == "to_rgb1" else "to_rgbs." + key.rsplit("_",1)[1]
            sd[f"{p}.conv.weight"] = np.asarray(sub["conv"]["weight"])[None]
            sd[f"{p}.conv.modulation.weight"] = sub["conv"]["modulation"]["weight"]
            sd[f"{p}.conv.modulation.bias"] = sub["conv"]["modulation"]["bias"]
            sd[f"{p}.bias"] = sub["bias"]
    for k, v in noises.items():
        sd[f"noises.{k}"] = v
    return sd


def test_generator_converter_roundtrip():
    gen = Generator(size=32, remaining_layer_idx=7)
    latent = jnp.zeros((1, 12, 8, 512))
    mask = jnp.ones((1, 12, 32, 32)).at[:, 1:].set(0.0)
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        [latent], None, mask, input_is_latent=True, randomize_noise=False,
    )
    # fabricate a torch state dict with fresh values
    rng = np.random.RandomState(0)
    sd = _gen_torch_names(variables["params"], variables["noises"])
    sd = {k: rng.randn(*np.asarray(v).shape).astype(np.float32) for k, v in sd.items()}

    converted = tc.convert_generator(sd)
    new_noises = tc.extract_generator_noises(sd)

    assert tree_paths(converted) == tree_paths(variables["params"])
    assert set(new_noises) == set(variables["noises"])

    out_old, _, _ = gen.apply(
        variables, [latent], None, mask, input_is_latent=True, randomize_noise=False
    )
    out_new, _, _ = gen.apply(
        {"params": converted, "noises": new_noises},
        [latent], None, mask, input_is_latent=True, randomize_noise=False,
    )
    assert not np.allclose(np.asarray(out_old), np.asarray(out_new))


def test_discriminator_converter_structure():
    disc = Discriminator(size=32)
    x = jnp.zeros((2, 3, 32, 32))
    variables = disc.init(jax.random.PRNGKey(0), x)
    params = variables["params"]

    sd = {}
    sd["convs.0.0.weight"] = params["convs_0"]["conv"]["weight"]
    sd["convs.0.1.bias"] = params["convs_0"]["activate"]["bias"]
    j = 1
    while f"convs_{j}" in params:
        blk = params[f"convs_{j}"]
        sd[f"convs.{j}.conv1.0.weight"] = blk["conv1"]["conv"]["weight"]
        sd[f"convs.{j}.conv1.1.bias"] = blk["conv1"]["activate"]["bias"]
        sd[f"convs.{j}.conv2.1.weight"] = blk["conv2"]["conv"]["weight"]
        sd[f"convs.{j}.conv2.2.bias"] = blk["conv2"]["activate"]["bias"]
        sd[f"convs.{j}.skip.1.weight"] = blk["skip"]["conv"]["weight"]
        j += 1
    sd["final_conv.0.weight"] = params["final_conv"]["conv"]["weight"]
    sd["final_conv.1.bias"] = params["final_conv"]["activate"]["bias"]
    for i, name in enumerate(("final_linear_0", "final_linear_1")):
        sd[f"final_linear.{i}.weight"] = params[name]["weight"]
        sd[f"final_linear.{i}.bias"] = params[name]["bias"]

    converted = tc.convert_discriminator(sd)
    assert tree_paths(converted) == tree_paths(params)
    out = disc.apply({"params": converted}, x)
    assert out.shape == (2, 1)


def test_remove_module_prefix():
    sd = {"module.a.b": 1, "c.d": 2}
    out = tc.remove_module_prefix(sd)
    assert out == {"a.b": 1, "c.d": 2}


def test_split_batch_stats():
    tree = {
        "bn": {"weight": 1, "bias": 2, "running_mean": 3, "running_var": 4},
        "conv": {"weight": 5},
    }
    params, stats = tc.split_batch_stats(tree)
    assert params == {"bn": {"weight": 1, "bias": 2}, "conv": {"weight": 5}}
    assert stats == {"bn": {"running_mean": 3, "running_var": 4}}
