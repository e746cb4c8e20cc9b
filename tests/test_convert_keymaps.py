"""Checkpoint-converter key-map hardening (VERDICT r1 item 10).

tests/fixtures/torch_keymaps/*.json hold the EXACT state-dict key -> shape
listings of every pretrained checkpoint family, dumped from the reference
torch module trees by scripts/gen_key_fixtures.py (torch state-dict naming is
fully determined by the module tree, so random-init listings equal the
released checkpoints'). Each converter must

  (a) run over a synthetic state dict with exactly those keys/shapes, and
  (b) consume every key except an explicit, justified allowlist,

so converter naming drift is caught before real weights ever arrive
(day-0 parity: scripts/eval_parity.py is then the single green-light command).
"""

import fnmatch
import json
import os

import numpy as np
import pytest

from e4s_tpu.utils import torch_convert as tc

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "torch_keymaps"
)


class RecordingDict(dict):
    """State dict recording which keys the converter read."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.accessed = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        self.accessed.add(k)
        return super().get(k, default)

    def __contains__(self, k):
        # membership tests are part of consumption decisions, not reads
        return super().__contains__(k)


def load_fixture(name):
    with open(os.path.join(FIXTURE_DIR, f"{name}.json")) as f:
        keymap = json.load(f)
    rng = np.random.RandomState(0)
    sd = RecordingDict(
        {
            k: np.asarray(rng.randn(*shape), np.float32)
            for k, shape in keymap.items()
        }
    )
    return sd


def check_consumed(sd, allow_unconsumed=()):
    """Every fixture key must be read, except allowlisted patterns."""
    patterns = DEFAULT_ALLOW + tuple(allow_unconsumed)
    missed = sorted(
        k
        for k in sd
        if k not in sd.accessed
        and not any(fnmatch.fnmatch(k, pat) for pat in patterns)
    )
    assert not missed, f"converter ignored {len(missed)} keys, e.g. {missed[:12]}"


def leaves(tree):
    out = []
    if isinstance(tree, (tuple, list)):
        for t in tree:
            out += leaves(t)
        return out
    for v in tree.values():
        if isinstance(v, dict):
            out += leaves(v)
        else:
            out.append(v)
    return out


# Always-ignorable buffers: BatchNorm step counters, and the fixed FIR
# blur/upsample kernels ([1,3,3,1] outer products registered as buffers by
# Blur/Upsample, ref model.py Blur.register_buffer) — our ops synthesise
# them from the static blur_kernel config instead of loading them.
DEFAULT_ALLOW = ("*num_batches_tracked*", "*.kernel")


def test_net3_keymap():
    sd = load_fixture("net3_state_dict")
    out = tc.convert_net3_state_dict(sd, num_seg_cls=12)
    assert leaves(out)
    check_consumed(
        sd,
        (
            # the encoder returns zeros as structure feats
            # (ref psp_encoders.py:300); its structure branch layers are dead
            # weights in the released checkpoint
            "encoder.structure_linear*",
            # per-layer noise buffers are extracted separately
            # (extract_generator_noises)
            "G.noises.*",
        ),
    )
    noises = tc.extract_generator_noises(sd, prefix="G")
    assert len(noises) == 17  # 1024^2 -> 2*log2(1024)-3


def test_stylegan2_generator_keymap():
    sd = load_fixture("stylegan2_generator")
    out = tc.convert_generator(sd)
    assert leaves(out)
    check_consumed(sd, ("noises.*",))
    noises = tc.extract_generator_noises(sd)
    assert len(noises) == 17


def test_stylegan2_discriminator_keymap():
    sd = load_fixture("stylegan2_discriminator")
    out = tc.convert_discriminator(sd)
    assert leaves(out)
    check_consumed(sd)


def test_ir_se50_keymap():
    sd = load_fixture("ir_se50")
    out = tc.convert_irse50(sd)
    assert leaves(out)
    check_consumed(sd)


def test_bisenet_keymap():
    sd = load_fixture("bisenet")
    out = tc.convert_bisenet(sd)
    assert leaves(out)
    check_consumed(
        sd,
        (
            # auxiliary training heads conv_out16/conv_out32 are unused at
            # inference (ref face_parsing/model.py BiSeNet.forward returns
            # feat_out only in the demo path)
            "conv_out16.*",
            "conv_out32.*",
        ),
    )


def test_parsing_unet_keymap():
    sd = load_fixture("parsing_unet")
    out = tc.convert_unet(sd)
    assert leaves(out)
    check_consumed(sd)


def test_lpips_trunk_keymaps():
    # the released torchvision checkpoints key the trunk as "features.N.*"
    sd = load_fixture("alexnet_features")
    sd = RecordingDict({f"features.{k}": v for k, v in sd.items()})
    out = tc.convert_alexnet_features(sd, prefix="features")
    assert leaves(out)
    check_consumed(sd)

    sd = load_fixture("vgg16_features")
    sd = RecordingDict({f"features.{k}": v for k, v in sd.items()})
    out = tc.convert_vgg16_features(sd, prefix="features")
    assert leaves(out)
    check_consumed(sd)


def test_facevid2vid_keymaps():
    sd = load_fixture("facevid2vid_kp_detector")
    out = tc.convert_kp_detector(sd)
    assert leaves(out)
    # down.weight is AntiAliasInterpolation2d's FIXED gaussian kernel buffer
    # (ref keypoint_detector.py:42, util.py AntiAliasInterpolation2d) — our
    # resize op synthesises it from scale_factor
    check_consumed(sd, ("down.weight",))

    sd = load_fixture("facevid2vid_he_estimator")
    out = tc.convert_he_estimator(sd)
    assert leaves(out)
    check_consumed(sd)

    sd = load_fixture("facevid2vid_generator")
    out = tc.convert_fv_generator(sd)
    assert leaves(out)
    check_consumed(sd)


def test_gpen_keymaps():
    sd = load_fixture("gpen_bfr_512")
    out = tc.convert_gpen_full_generator(sd)
    assert leaves(out)
    check_consumed(sd, ("noises.*",))

    sd = load_fixture("gpen_realesrnet")
    out = tc.convert_rrdbnet(sd)
    assert leaves(out)
    check_consumed(sd)

    sd = load_fixture("gpen_parsenet")
    out = tc.convert_parsenet(sd)
    assert leaves(out)
    check_consumed(sd)

    sd = load_fixture("gpen_retinaface_r50")
    out = tc.convert_retinaface(sd)
    assert leaves(out)
    check_consumed(sd)
