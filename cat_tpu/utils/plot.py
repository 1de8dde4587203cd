"""Training monitor plot: metrics.jsonl → monitor.png.

Counterpart of /root/reference/cat/utils/plot_tb.py (tensorboard →
monitor.png, wired in common_utils.py:404-422) over our JSONL metric log.
"""
from __future__ import annotations

import json
import os


def plot_monitor(log_dir, out_path=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    path = os.path.join(log_dir, "metrics.jsonl")
    rows = []
    with open(path) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    evals = [r for r in rows if "dev_loss" in r]
    trains = [r for r in rows if "train_loss" in r]
    fig, axes = plt.subplots(1, 3, figsize=(13, 3.6))
    if evals:
        axes[0].plot([r["step"] for r in evals],
                     [r["dev_loss"] for r in evals], marker="o")
        axes[0].set_title("dev loss")
        axes[0].set_xlabel("step")
        axes[1].plot([r["step"] for r in evals],
                     [r["lr"] for r in evals])
        axes[1].set_yscale("log")
        axes[1].set_title("learning rate")
        axes[1].set_xlabel("step")
    if trains:
        axes[2].plot([r["step"] for r in trains],
                     [r["train_loss"] for r in trains], alpha=0.7)
        axes[2].set_title("train loss")
        axes[2].set_xlabel("step")
    fig.tight_layout()
    out = out_path or os.path.join(log_dir, "monitor.png")
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


if __name__ == "__main__":
    import sys

    print(plot_monitor(sys.argv[1]))
