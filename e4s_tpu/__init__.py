"""e4s_tpu — a TPU-native JAX framework for fine-grained face swapping.

Re-implements the full capability surface of E4S ("Fine-Grained Face Swapping
via Regional GAN Inversion", CVPR 2023) as a from-scratch JAX/XLA/Pallas stack:

- ``e4s_tpu.ops``       — TPU compute primitives (upfirdn2d, fused bias+act,
                          masked modulated convolution, masked region pooling,
                          morphology, Laplacian blending, torch-parity resizes).
- ``e4s_tpu.models``    — StyleGAN2 (mask-guided variant), RGI encoder, Net3
                          facade, IR-SE50, BiSeNet/U-Net parsers, LPIPS nets,
                          FaceVid2Vid re-enactor, GPEN restoration stack.
- ``e4s_tpu.criteria``  — training losses (ID / LPIPS / parsing / Gram / adv).
- ``e4s_tpu.datasets``  — CelebAMask-HQ / FFHQ datasets + label taxonomies.
- ``e4s_tpu.training``  — Coach (optax, EMA, mesh data-parallel, orbax ckpts).
- ``e4s_tpu.parallel``  — device-mesh / sharding helpers.
- ``e4s_tpu.pipelines`` — face_swap / face_edit / optimization entry pipelines.

Design notes live in DESIGN.md. The reference implementation this framework is
feature-matched against is the PyTorch/CUDA e4s2022/e4s repo; docstrings cite
reference files as ``ref: src/...py:line`` for parity auditing.
"""

__version__ = "0.1.0"
