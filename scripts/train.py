"""Training CLI — arg-compatible with the reference scripts/train.py."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from e4s_tpu.options.train_options import TrainOptions
    from e4s_tpu.training.coach import Coach

    opts = TrainOptions().parse()
    os.makedirs(opts.exp_dir, exist_ok=True)
    with open(os.path.join(opts.exp_dir, "opt.json"), "w") as f:
        json.dump(vars(opts), f, indent=2, sort_keys=True)

    coach = Coach(opts)
    if opts.checkpoint_path:
        coach.load_checkpoint(opts.checkpoint_path)
    coach.train()


if __name__ == "__main__":
    main()
