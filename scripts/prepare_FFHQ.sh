#!/usr/bin/env bash
# Parity target: scripts/prepare_FFHQ.sh
python scripts/estimate_FFHQ_mask.py --seg12 "$@"
python scripts/save_FFHQ_filelist.py "$@"
