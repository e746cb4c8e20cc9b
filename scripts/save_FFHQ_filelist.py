"""Build ffhq_list.txt. Parity target: scripts/save_FFHQ_filelist.py."""

import glob
import os
from argparse import ArgumentParser


def main():
    parser = ArgumentParser()
    parser.add_argument('--FFHQ_root', type=str, default="./data/FFHQ")
    args = parser.parse_args()

    with open(os.path.join(args.FFHQ_root, "ffhq_list.txt"), "w") as f:
        img_dirs = sorted(os.listdir(os.path.join(args.FFHQ_root, "images_1024")))
        for d in img_dirs:
            imgs = sorted(
                glob.glob(os.path.join(args.FFHQ_root, "images_1024", d, "*.png"))
            )
            for i in imgs:
                f.write(os.path.join(d, os.path.basename(i)) + "\n")


if __name__ == "__main__":
    main()
