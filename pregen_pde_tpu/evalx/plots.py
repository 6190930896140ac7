"""Prediction visualization — counterpart of the reference's wandb image grids
(`scOT/train.py:75-118` `create_prediction_plot` and the `--plot_from_checkpoint`
path, `scOT/train.py:238-307`). Writes PNG grids locally instead of to wandb.
"""

from __future__ import annotations

import numpy as np


def prediction_grid(
    inputs: np.ndarray,  # (N, H, W, Cin)
    predictions: np.ndarray,  # (N, H, W, C)
    labels: np.ndarray,  # (N, H, W, C)
    path: str,
    channel: int = 0,
    channel_name: str = "Ux",
    max_rows: int = 6,
) -> str:
    """Rows = samples; columns = input | prediction | label | error."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = min(len(predictions), max_rows)
    fig, axes = plt.subplots(n, 4, figsize=(10, 2.4 * n), squeeze=False)
    err = predictions - labels
    vmax = float(np.abs(labels[:n, ..., channel]).max()) or 1.0
    for i in range(n):
        panels = [
            (inputs[i, ..., channel], f"input {channel_name}", "RdBu_r", vmax),
            (predictions[i, ..., channel], "prediction", "RdBu_r", vmax),
            (labels[i, ..., channel], "label", "RdBu_r", vmax),
            (err[i, ..., channel], "error", "RdBu_r",
             float(np.abs(err[:n, ..., channel]).max()) or 1.0),
        ]
        for j, (img, title, cmap, v) in enumerate(panels):
            ax = axes[i, j]
            im = ax.imshow(img, cmap=cmap, vmin=-v, vmax=v, origin="lower")
            if i == 0:
                ax.set_title(title, fontsize=9)
            ax.set_xticks([])
            ax.set_yticks([])
            fig.colorbar(im, ax=ax, fraction=0.046)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_from_samples(npz_path: str, out_path: str, channel: int = 0) -> str:
    """Render a grid from an `evalx.inference.save_samples` artifact."""
    data = np.load(npz_path)
    return prediction_grid(
        data["input"], data["prediction"], data["label"], out_path, channel
    )
