"""Training/eval visualization: PR curves, confusion matrix, batch galleries.

Capability parity with the reference's plotting subsystem
(``yolov12/ultralytics/utils/plotting.py`` + validator hooks + the project's
W&B val-image tables): PR/F1 curves from the mAP accumulator, a detection
confusion matrix, labeled-batch mosaics, and label-distribution histograms.
All figures render headless (Agg) to the run directory.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def plot_pr_curve(
    recall: np.ndarray, precision: np.ndarray, out: str | Path, label: str = ""
) -> Path:
    fig, ax = plt.subplots(figsize=(6, 5))
    ax.plot(recall, precision, lw=2, label=label or None)
    ax.set_xlabel("recall")
    ax.set_ylabel("precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1.02)
    ax.set_title("Precision-Recall")
    if label:
        ax.legend()
    out = Path(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out


class ConfusionMatrix:
    """Detection confusion matrix with a background class (reference
    ``utils/metrics.py:294``): matched pred<->GT via IoU, unmatched GT ->
    (gt, background), unmatched pred -> (background, pred)."""

    def __init__(self, nc: int, conf: float = 0.25, iou_thres: float = 0.45):
        self.nc = nc
        self.conf = conf
        self.iou_thres = iou_thres
        self.matrix = np.zeros((nc + 1, nc + 1), np.int64)

    def update(
        self,
        pred_boxes: np.ndarray,
        pred_scores: np.ndarray,
        pred_classes: np.ndarray,
        gt_boxes: np.ndarray,
        gt_classes: np.ndarray,
    ) -> None:
        from kuzu.core.metrics import box_iou_np

        keep = pred_scores >= self.conf
        pb, pc = pred_boxes[keep], pred_classes[keep].astype(int)
        gc = gt_classes.astype(int)
        if len(gt_boxes) and len(pb):
            iou = box_iou_np(gt_boxes, pb)
            matched_gt = np.zeros(len(gt_boxes), bool)
            matched_pred = np.zeros(len(pb), bool)
            order = np.argsort(-iou, axis=None)
            for flat in order:
                g, p = np.unravel_index(flat, iou.shape)
                if iou[g, p] < self.iou_thres:
                    break
                if matched_gt[g] or matched_pred[p]:
                    continue
                matched_gt[g] = matched_pred[p] = True
                self.matrix[gc[g], pc[p]] += 1
            for g in np.where(~matched_gt)[0]:
                self.matrix[gc[g], self.nc] += 1  # missed GT -> background col
            for p in np.where(~matched_pred)[0]:
                self.matrix[self.nc, pc[p]] += 1  # spurious pred
        elif len(gt_boxes):
            for g in range(len(gt_boxes)):
                self.matrix[gc[g], self.nc] += 1
        elif len(pb):
            for p in range(len(pb)):
                self.matrix[self.nc, pc[p]] += 1

    def plot(self, out: str | Path, names: dict[int, str] | None = None) -> Path:
        labels = [
            (names or {}).get(i, str(i)) for i in range(self.nc)
        ] + ["background"]
        fig, ax = plt.subplots(figsize=(6, 5))
        im = ax.imshow(self.matrix, cmap="Blues")
        ax.set_xticks(range(len(labels)), labels, rotation=90, fontsize=7)
        ax.set_yticks(range(len(labels)), labels, fontsize=7)
        ax.set_xlabel("predicted")
        ax.set_ylabel("true")
        fig.colorbar(im)
        out = Path(out)
        out.parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(out, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out


def plot_batch(
    images: np.ndarray,  # (B, H, W, C) in [0, 1]
    boxes: list[np.ndarray],  # per-image (N, 4) xyxy pixels
    out: str | Path,
    labels: list[np.ndarray] | None = None,
    max_images: int = 16,
) -> Path:
    """Annotated batch mosaic (reference ``plot_images``)."""
    n = min(len(images), max_images)
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows))
    axes = np.atleast_1d(axes).ravel()
    for i in range(n):
        ax = axes[i]
        img = images[i]
        ax.imshow(img.squeeze() if img.shape[-1] == 1 else img, cmap="gray")
        for j, b in enumerate(np.asarray(boxes[i])):
            x1, y1, x2, y2 = b
            ax.add_patch(
                plt.Rectangle(
                    (x1, y1), x2 - x1, y2 - y1, fill=False, color="lime", lw=1
                )
            )
            if labels is not None and j < len(labels[i]):
                ax.text(x1, y1, str(labels[i][j]), color="red", fontsize=6)
        ax.axis("off")
    for ax in axes[n:]:
        ax.axis("off")
    out = Path(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return out


def plot_label_histogram(
    classes: np.ndarray, out: str | Path, names: dict[int, str] | None = None
) -> Path:
    fig, ax = plt.subplots(figsize=(7, 4))
    vals, counts = np.unique(classes.astype(int), return_counts=True)
    ax.bar([str((names or {}).get(v, v)) for v in vals], counts)
    ax.set_ylabel("instances")
    ax.set_title("label distribution")
    plt.xticks(rotation=90, fontsize=7)
    out = Path(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out


def plot_results_csv(csv_path: str | Path, out: str | Path) -> Path:
    """Loss/metric curves from a run's results.csv (reference plot_results)."""
    import csv as _csv

    with open(csv_path) as f:
        rows = list(_csv.DictReader(f))
    if not rows:
        raise ValueError("empty results csv")
    keys = [k for k in rows[0] if k not in ("epoch",) and rows[0][k] != ""]
    epochs = [float(r["epoch"]) for r in rows]
    n = len(keys)
    cols = min(4, n)
    rws = int(np.ceil(n / cols))
    fig, axes = plt.subplots(rws, cols, figsize=(3.2 * cols, 2.6 * rws))
    axes = np.atleast_1d(axes).ravel()
    for i, k in enumerate(keys):
        vals = [float(r[k]) if r[k] else np.nan for r in rows]
        axes[i].plot(epochs, vals, marker=".")
        axes[i].set_title(k, fontsize=8)
    for ax in axes[n:]:
        ax.axis("off")
    fig.tight_layout()
    out = Path(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=110)
    plt.close(fig)
    return out
