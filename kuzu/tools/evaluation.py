"""Evaluation driver: column mAP + char mAP + char accuracy over test data.

Capability parity with the reference ``scripts/evaluation.py:12,65,126``:
evaluate a column detector and a character detector/recognizer against
ground truth, reporting 11-point mAP (project metric), 101-point mAP50-95
(engine metric) and IoU-matched character accuracy; plus worst-case panels
(reference ``scripts/test_character_detection.py:179``).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from kuzu.core.metrics import DetMetrics, character_accuracy, compute_ap


def evaluate_detector(
    run_dir: str | Path,
    dataset_yaml: str | Path,
    split: str = "val",
    conf: float = 0.001,
    iou: float = 0.7,
    max_images: int | None = None,
    save_panels: int = 0,
    out_dir: str | Path | None = None,
) -> dict:
    """Run a trained detector over a split; compute mAP + per-image P/R/F1."""
    from kuzu.core.config import load_config
    from kuzu.core.metrics import box_iou_np
    from kuzu.data.yolo_dataset import YoloDetectionDataset
    from kuzu.tasks.detect import DetectPredictor

    predictor = DetectPredictor(
        load_config(overrides={"model": str(run_dir), "conf": conf, "iou": iou})
    )
    ds = YoloDetectionDataset(
        str(dataset_yaml), split=split, imgsz=640, augment=False
    )
    dm = DetMetrics()
    per_image = []
    worst: list[tuple[float, str]] = []
    n = len(ds.images) if max_images is None else min(max_images, len(ds.images))
    for i in range(n):
        path = ds.images[i]
        img, gt_boxes, gt_labels = ds._load_raw(i)
        r = predictor([path])[0]
        dm.update(
            r["boxes"], r["scores"], r["classes"],
            np.ones(len(r["boxes"]), bool),
            gt_boxes, gt_labels, np.ones(len(gt_boxes), bool),
        )
        # per-image precision/recall/F1 at IoU 0.5
        iou_m = box_iou_np(gt_boxes, r["boxes"])
        tp = int((iou_m.max(axis=1) >= 0.5).sum()) if iou_m.size else 0
        prec = tp / max(len(r["boxes"]), 1)
        rec = tp / max(len(gt_boxes), 1)
        f1 = 2 * prec * rec / max(prec + rec, 1e-9)
        per_image.append({"image": str(path), "precision": prec, "recall": rec, "f1": f1})
        worst.append((f1, str(path)))
    res = dm.compute()
    res["per_image"] = per_image
    res["worst_images"] = [p for _, p in sorted(worst)[: max(save_panels, 10)]]
    if out_dir:
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        (out_dir / "evaluation.json").write_text(
            json.dumps({k: v for k, v in res.items() if k != "per_image"}, indent=2)
        )
    return res


def evaluate_recognizer(
    run_dir: str | Path,
    data: str | Path,
    split: str = "test",
    max_samples: int | None = None,
) -> dict:
    """CER over a recognizer test split (reference trainer.test path)."""
    from kuzu.core.config import load_config
    from kuzu.core.metrics import character_error_rate
    from kuzu.data.ocr_datasets import ColumnInfoDataset, OneLineDataset
    from kuzu.data.tokenizer import CharTokenizer
    from kuzu.tasks.recognize import RecognizePredictor

    predictor = RecognizePredictor(load_config(overrides={"model": str(run_dir)}))
    predictor._setup()
    tok = predictor.tokenizer
    if str(data).endswith(".csv"):
        ds = ColumnInfoDataset(data, tok, split=split, image_size=predictor.image_size)
        items = [(p, t) for p, t in ds.items]
    else:
        ds = OneLineDataset(data, tok, split=split, image_size=predictor.image_size)
        items = [(p, t) for p, t, _ in ds.items]
    if max_samples:
        items = items[:max_samples]
    preds = predictor([p for p, _ in items])
    refs = [t for _, t in items]
    cer = character_error_rate(preds, refs)
    exact = sum(p == r for p, r in zip(preds, refs)) / max(len(refs), 1)
    return {"cer": cer, "exact_match": exact, "n": len(refs)}


__all__ = [
    "evaluate_detector",
    "evaluate_recognizer",
    "character_accuracy",
    "compute_ap",
]
