"""Optimization (inversion refinement) options — parity with
src/options/optim_options.py."""

from argparse import ArgumentParser


class OptimOptions:
    def __init__(self):
        self.parser = ArgumentParser()
        self.initialize()

    def initialize(self):
        p = self.parser
        p.add_argument('--exp_dir', type=str, default="optimization_exp")
        p.add_argument('--num_seg_cls', type=int, default=12)
        p.add_argument('--remaining_layer_idx', type=int, default=13)
        # ================= Model =====================
        p.add_argument('--out_size', type=int, default=1024)
        p.add_argument('--load_ema', default=False, type=lambda x: str(x).lower() == 'true')
        p.add_argument('--n_styles', default=18, type=int)
        p.add_argument('--fsencoder_type', type=str, default="psp")
        p.add_argument('--checkpoint_path',
                       default="./pretrained_ckpts/e4s/iteration_300000.pt", type=str)
        p.add_argument('--train_G', default=False, type=lambda x: str(x).lower() == 'true')
        # ================= Dataset =====================
        p.add_argument('--dataset_root', default='./data/CelebAMask-HQ', type=str)
        p.add_argument('--ds_frac', default=1.0, type=float)
        p.add_argument('--test_batch_size', default=1, type=int)
        p.add_argument('--test_workers', default=4, type=int)
        p.add_argument('--output_size', default=1024, type=int)
        p.add_argument('--start_from_latent_avg', action='store_true', default=True)
        p.add_argument('--learn_in_w', action='store_true')
        # ================= Optimization =========================
        p.add_argument('--num_layers', default=18, type=int)
        p.add_argument('--lr', default=1e-2, type=float)
        p.add_argument('--opt_name', type=str, default='adam',
                       help='sgd | adam | sgdm | adamax')
        p.add_argument('--W_steps', type=int, default=200)
        # jointly optimize the generator's per-layer noise maps with the
        # style vector (ref: scripts/optimization.py:146-159 noise_init path)
        p.add_argument('--optimize_noise', action='store_true')
        p.add_argument('--bf16', action='store_true',
                       help='mixed-precision inversion: bf16 forward/loss, '
                            'f32 theta + Adam moments')
        p.add_argument('--save_intermediate', action='store_true')
        p.add_argument('--verbose', action='store_true')
        p.add_argument('--save_interval', type=int, default=50)
        p.add_argument('--output_dir', type=str, default='./work_dir/optim')
        # ================= Loss Functions =====================
        p.add_argument('--lpips_lambda', default=0.8, type=float)
        p.add_argument('--id_lambda', default=0.1, type=float)
        p.add_argument('--id_loss_multiscale', default=True, type=lambda x: str(x).lower() != 'false')
        p.add_argument('--face_parsing_lambda', default=0.1, type=float)
        p.add_argument('--l2_lambda', default=1.0, type=float)
        p.add_argument('--ir_se50_path',
                       default='./pretrained_ckpts/auxiliray/model_ir_se50.pth', type=str)
        p.add_argument('--face_parsing_model_path',
                       default='./pretrained_ckpts/auxiliray/model.pth', type=str)

    def parse(self, args=None):
        return self.parser.parse_args(args)
