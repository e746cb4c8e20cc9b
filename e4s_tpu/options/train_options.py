"""Training options — flag-for-flag parity with the reference.

Parity target: src/options/train_options.py:10-71. Torch/CUDA-specific flags
(local_rank, dist_train) are replaced by mesh controls.
"""

from argparse import ArgumentParser


class TrainOptions:
    def __init__(self):
        self.parser = ArgumentParser()
        self.initialize()

    def initialize(self):
        p = self.parser
        p.add_argument('--exp_dir', type=str, default="running_exp")
        # multi-host data parallelism (jax.distributed; the reference's
        # torch.distributed.launch equivalent). With no coordinator args,
        # JAX auto-detects the cluster (TPU pod metadata / SLURM).
        p.add_argument('--distributed', action='store_true')
        p.add_argument('--coordinator_address', type=str, default='')
        p.add_argument('--num_processes', type=int, default=0)
        p.add_argument('--process_id', type=int, default=-1)
        p.add_argument('--num_seg_cls', type=int, default=12)
        # ================= Model =====================
        p.add_argument('--out_size', type=int, default=1024)
        p.add_argument('--fsencoder_type', type=str, default="psp")
        p.add_argument('--remaining_layer_idx', type=int, default=13,
                       help='mask-guided style injection, i.e., K in paper')
        # ================= Dataset =====================
        p.add_argument('--celeba_dataset_root', default='./data/CelebAMask-HQ', type=str)
        p.add_argument('--ffhq_dataset_root', default='./data/FFHQ', type=str)
        p.add_argument('--dataset_name', default='celeba', type=str,
                       help='celeba | ffhq | synthetic')
        p.add_argument('--flip_p', default=0.5, type=float)
        p.add_argument('--ds_frac', default=1.0, type=float)
        p.add_argument('--batch_size', default=2, type=int,
                       help='per-device batch size')
        p.add_argument('--test_batch_size', default=2, type=int)
        p.add_argument('--workers', default=4, type=int)
        p.add_argument('--test_workers', default=4, type=int)
        # ================= Training =====================
        p.add_argument('--learning_rate', default=0.0001, type=float)
        p.add_argument('--optim_name', default='adam', type=str,
                       help='adam | ranger')
        p.add_argument('--train_G', default=True, type=lambda x: str(x).lower() != 'false')
        p.add_argument('--train_D', default=True, type=lambda x: str(x).lower() != 'false')
        p.add_argument('--n_devices', default=None, type=int,
                       help='data-parallel mesh size (default: all devices)')
        p.add_argument('--d_reg_every', default=-1, type=int)
        p.add_argument('--d_every', default=15, type=int)
        p.add_argument('--max_steps', default=200000, type=int)
        p.add_argument('--image_interval', default=200 * 5 * 2, type=int)
        # samples for the mean-latent estimate when no StyleGAN2 bootstrap /
        # resume checkpoint provides latent_avg (ref: coach.py:139-144)
        p.add_argument('--latent_avg_samples', default=100000, type=int)
        p.add_argument('--board_interval', default=30 * 10 * 2, type=int)
        p.add_argument('--val_interval', default=5000 * 2 * 2, type=int)
        p.add_argument('--save_interval', default=10000 * 5 * 2, type=int)
        p.add_argument('--seed', default=0, type=int)
        p.add_argument('--bf16', action='store_true',
                       help='mixed-precision training: bf16 compute in the '
                            'G/D steps, f32 master weights/optimizer/EMA '
                            '(demod/accum and R1 stay f32)')
        p.add_argument('--channels_last', default=True,
                       type=lambda x: str(x).lower() != 'false',
                       help='NHWC synthesis internals (TPU-native; checkpoint-compatible either way)')
        p.add_argument('--tensorboard', action='store_true',
                       help='also write TensorBoard scalars (imports torch; '
                            'JSONL metrics are always written)')
        # ================= Loss Function =====================
        p.add_argument('--lpips_lambda', default=0.8, type=float)
        p.add_argument('--id_lambda', default=0.1, type=float)
        p.add_argument('--id_loss_multiscale', default=True, type=lambda x: str(x).lower() != 'false')
        p.add_argument('--face_parsing_lambda', default=0.1, type=float)
        p.add_argument('--l2_lambda', default=1.0, type=float)
        p.add_argument('--w_norm_lambda', default=0, type=float)
        p.add_argument('--r1_lambda', default=10, type=float)
        p.add_argument('--g_adv_lambda', default=0.01, type=float)
        p.add_argument('--style_lambda', default=0, type=float)
        p.add_argument('--style_code_lambda', default=2e4, type=float)
        p.add_argument('--structure_code_lambda', default=0, type=float)
        p.add_argument('--style_loss_norm', default=1, type=int)
        # ================== styleGAN2 ==================
        p.add_argument('--stylegan_weights', default='./pretrained_ckpts/stylegan2-ffhq-config-f.pt', type=str)
        p.add_argument('--learn_in_w', action='store_true')
        p.add_argument('--start_from_latent_avg', action='store_true', default=True)
        p.add_argument('--output_size', default=1024, type=int)
        p.add_argument('--n_styles', default=18, type=int)
        # auxiliary models
        p.add_argument('--ir_se50_path', default='./pretrained_ckpts/auxiliray/model_ir_se50.pth', type=str)
        p.add_argument('--face_parsing_model_path', default='./pretrained_ckpts/auxiliray/model.pth', type=str)
        p.add_argument('--checkpoint_path', default=None, type=str)

    def parse(self, args=None):
        return self.parser.parse_args(args)
