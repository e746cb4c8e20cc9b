"""Inversion refinement CLI — arg-compatible with the reference
scripts/optimization.py (refines the style vector of CelebAMask-HQ test
sample 123 by default, matching the reference's hardcoded index)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from e4s_tpu.options.optim_options import OptimOptions
    from e4s_tpu.pipelines.optimization import Optimizer

    opts = OptimOptions().parse()
    os.makedirs(opts.output_dir, exist_ok=True)
    optimizer = Optimizer(opts)
    optimizer.invertion(123)  # ref: scripts/optimization.py:264


if __name__ == "__main__":
    main()
