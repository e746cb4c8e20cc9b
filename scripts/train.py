"""Training CLI — arg-compatible with the reference scripts/train.py."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from e4s_tpu.options.train_options import TrainOptions

    opts = TrainOptions().parse()

    # Multi-host bring-up MUST precede any other JAX call (the TPU-native
    # equivalent of the reference's NCCL init_process_group + launcher,
    # ref src/training/coach.py:37-58, README.md:150-162).
    if getattr(opts, "distributed", False):
        from e4s_tpu.parallel.mesh import init_distributed

        init_distributed(
            coordinator_address=getattr(opts, "coordinator_address", None) or None,
            num_processes=getattr(opts, "num_processes", None) or None,
            process_id=(
                opts.process_id if getattr(opts, "process_id", -1) >= 0 else None
            ),
        )

    import jax

    from e4s_tpu.training.coach import Coach

    os.makedirs(opts.exp_dir, exist_ok=True)
    if jax.process_index() == 0:
        with open(os.path.join(opts.exp_dir, "opt.json"), "w") as f:
            json.dump(vars(opts), f, indent=2, sort_keys=True)

    coach = Coach(opts)
    if opts.checkpoint_path:
        coach.load_checkpoint(opts.checkpoint_path)
    coach.train()


if __name__ == "__main__":
    main()
