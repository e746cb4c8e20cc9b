"""CLI flag parity with the reference option classes."""

from e4s_tpu.options.train_options import TrainOptions
from e4s_tpu.options.swap_options import SwapFacePipelineOptions
from e4s_tpu.options.edit_options import EditOptions
from e4s_tpu.options.optim_options import OptimOptions


def test_train_options_defaults():
    o = TrainOptions().parse([])
    # ref: src/options/train_options.py defaults
    assert o.num_seg_cls == 12
    assert o.out_size == 1024
    assert o.remaining_layer_idx == 13
    assert o.batch_size == 2
    assert o.learning_rate == 1e-4
    assert o.d_every == 15
    assert o.d_reg_every == -1
    assert o.max_steps == 200000
    assert o.lpips_lambda == 0.8
    assert o.id_lambda == 0.1
    assert o.face_parsing_lambda == 0.1
    assert o.l2_lambda == 1.0
    assert o.r1_lambda == 10
    assert o.g_adv_lambda == 0.01
    assert o.n_styles == 18
    assert o.start_from_latent_avg is True


def test_swap_options_defaults():
    o = SwapFacePipelineOptions().parse([])
    assert o.num_seg_cls == 12
    assert o.out_size == 1024
    assert o.remaining_layer_idx == 13
    assert o.faceParser_name == "default"
    assert o.source.endswith("source.jpg")
    assert o.target.endswith("target.jpg")
    assert o.lap_bld is False
    o2 = SwapFacePipelineOptions().parse(["--lap_bld", "--verbose", "true"])
    assert o2.lap_bld is True and o2.verbose is True


def test_edit_options():
    o = EditOptions().parse(["--regions", "hair", "eyes", "--alpha", "0.5"])
    assert o.regions == ["hair", "eyes"]
    assert o.alpha == 0.5


def test_optim_options():
    o = OptimOptions().parse([])
    assert o.W_steps == 200
    assert o.lr == 1e-2
    assert o.opt_name == "adam"
    assert o.save_interval == 50
