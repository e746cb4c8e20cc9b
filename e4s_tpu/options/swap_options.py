"""Swap pipeline options — flag parity with src/options/swap_options.py."""

from argparse import ArgumentParser


class SwapFacePipelineOptions:
    def __init__(self):
        self.parser = ArgumentParser()
        self.initialize()

    def initialize(self):
        p = self.parser
        p.add_argument('--num_seg_cls', type=int, default=12)
        p.add_argument('--train_G', default=True, type=lambda x: str(x).lower() != 'false')
        p.add_argument('--lap_bld', action='store_true',
                       help='Whether to use Laplacian multi-band blending')
        p.add_argument('--bf16', action='store_true',
                       help='bfloat16 inference (f32 demod/accum retained)')
        p.add_argument('--channels_last', default=True,
                       type=lambda x: str(x).lower() != 'false',
                       help='NHWC synthesis internals (TPU-native; checkpoint-compatible either way)')
        # ================= Model =====================
        p.add_argument('--out_size', type=int, default=1024)
        p.add_argument('--fsencoder_type', type=str, default="psp")
        p.add_argument('--remaining_layer_idx', type=int, default=13)
        p.add_argument('--outer_dilation', type=int, default=15)
        p.add_argument('--erode_radius', type=int, default=3)
        # ================== Pre-trained Models ==================
        p.add_argument('--learn_in_w', action='store_true')
        p.add_argument('--start_from_latent_avg', action='store_true', default=True)
        p.add_argument('--output_size', default=1024, type=int)
        p.add_argument('--n_styles', default=18, type=int)
        p.add_argument('--checkpoint_path',
                       default='./pretrained_ckpts/e4s/iteration_300000.pt', type=str)
        p.add_argument('--faceParser_name', default='default', type=str,
                       help='face parser name, [ default | segnext ]')
        p.add_argument('--faceParsing_ckpt',
                       default='./pretrained_ckpts/face_parsing/79999_iter.pth', type=str)
        p.add_argument('--segnext_config', default='', type=str)
        # ================== input & output ==================
        p.add_argument('--source', type=str, default="example/input/faceswap/source.jpg")
        p.add_argument('--target', type=str, default="example/input/faceswap/target.jpg")
        p.add_argument('--target_mask', type=str, default="")
        # dlib crop+align of source/target before swapping (the reference
        # pipeline's optional first stage, ref face_swap.py:173-192)
        p.add_argument('--need_crop', action='store_true')
        p.add_argument('--only_target_crop', action='store_true')
        # precomputed 68-pt landmarks (.npz with arrays in file order:
        # source, target) — lets the crop path run without dlib
        p.add_argument('--landmarks_npz', type=str, default="")
        p.add_argument('--verbose', default=False, type=lambda x: str(x).lower() == 'true')
        p.add_argument('--output_dir', type=str, default="example/output/faceswap")

    def parse(self, args=None):
        return self.parser.parse_args(args)
