"""Image / tensor conversion + logging helpers.

Parity target: src/utils/torch_utils.py (tensor2im, tensor2map,
labelMap2OneHot, aggregate_loss_dict, get_colors, vis utilities).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax.numpy as jnp
import numpy as np


def tensor2im(var: np.ndarray):
    """[3,H,W] in [-1,1] -> PIL RGB. ref: torch_utils.py:63-69"""
    from PIL import Image

    arr = np.transpose(np.asarray(var), (1, 2, 0))
    arr = np.clip((arr + 1) / 2, 0, 1) * 255
    return Image.fromarray(arr.astype("uint8"))


def im2tensor(img) -> np.ndarray:
    """PIL RGB -> [3,H,W] float32 in [-1,1]."""
    arr = np.asarray(img).astype(np.float32) / 255.0
    return np.transpose(arr, (2, 0, 1)) * 2 - 1


def get_colors() -> List[List[int]]:
    """ref: torch_utils.py:101-107"""
    return [
        [0, 0, 0], [204, 0, 0], [76, 153, 0], [204, 204, 0], [51, 51, 255],
        [204, 0, 204], [0, 255, 255], [255, 204, 204], [102, 51, 0],
        [255, 0, 0], [102, 204, 0], [255, 255, 0], [0, 0, 153], [0, 0, 204],
        [255, 51, 153], [0, 204, 204], [0, 51, 0], [255, 153, 51], [0, 204, 0],
    ]


def tensor2map(var: np.ndarray):
    """[C,H,W] one-hot/logits -> colored PIL mask. ref: torch_utils.py:72-84"""
    from PIL import Image

    mask = np.argmax(np.asarray(var), axis=0)
    return Image.fromarray(vis_mask_in_color(mask))


def vis_mask_in_color(mask: np.ndarray) -> np.ndarray:
    """ref: torch_utils.py:89-97"""
    colors = get_colors()
    out = np.ones(mask.shape + (3,))
    for class_idx in np.unique(mask):
        out[mask == class_idx] = colors[class_idx]
    return out.astype("uint8")


def label_map_to_onehot(label: jnp.ndarray, num_cls: int = 12) -> jnp.ndarray:
    """[B,1,H,W] int -> [B,num_cls,H,W] one-hot (device version).
    ref: torch_utils.py:166-172"""
    B, _, H, W = label.shape
    classes = jnp.arange(num_cls).reshape(1, num_cls, 1, 1)
    return (label == classes).astype(jnp.float32)


def aggregate_loss_dict(agg_loss_dict: Sequence[Dict[str, float]]) -> Dict[str, float]:
    """ref: torch_utils.py:152-163"""
    mean_vals: Dict[str, list] = {}
    for output in agg_loss_dict:
        for key, value in output.items():
            mean_vals.setdefault(key, []).append(value)
    for key in list(mean_vals):
        if len(mean_vals[key]) > 0:
            mean_vals[key] = sum(mean_vals[key]) / len(mean_vals[key])
        else:
            mean_vals[key] = 0.0
    return mean_vals


def vis_faces(log_hooks: Sequence[Dict]):
    """Matplotlib grid of (input, mask, recon) rows. ref: torch_utils.py:109-149"""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    display_count = len(log_hooks)
    fig = plt.figure(figsize=(8, 4 * display_count))
    gs = fig.add_gridspec(display_count, 3)
    for i, hooks in enumerate(log_hooks):
        for j, key in enumerate(("input_face", "input_mask", "recon_styleCode")):
            ax = fig.add_subplot(gs[i, j])
            ax.imshow(hooks[key])
            ax.set_title(key)
            ax.axis("off")
    plt.tight_layout()
    return fig
