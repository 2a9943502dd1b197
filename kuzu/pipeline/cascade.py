"""Page -> text cascade: column detect -> crop -> recognize -> LM rescore.

Parity with the reference ``KuzushijiRecognizer`` (``scripts/inference.py:15``)
and its production tiled variant (``scripts/test_character_detection.py:222``):

1. column detection on the resized page (tiled for high-res pages);
2. column crops batched — the reference loops crops sequentially
   (``inference.py:94``, flagged in SURVEY §3.4); here all crops letterbox
   into one batch and a single jitted TrOCR generate handles them;
3. optional per-column character detection (tiled);
4. optional char-LM rescoring: masked pseudo-log-likelihood per text
   (the reference uses its MLM for correction/rescoring, P23/P25).

Results serialize to YAML per page (reference writes YAML + visualization).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np
import yaml


def sort_columns_right_to_left(boxes: np.ndarray) -> np.ndarray:
    """Reading order for vertical Japanese: right-most column first."""
    if len(boxes) == 0:
        return np.zeros((0,), np.int64)
    return np.argsort(-(boxes[:, 0] + boxes[:, 2]) / 2)


class KuzushijiPipeline:
    def __init__(
        self,
        column_model: str | Path | None = None,
        char_model: str | Path | None = None,
        recognizer: str | Path | None = None,
        lm: str | Path | None = None,
        tile_grid: int = 0,  # 0 = no tiling
        tile_overlap: float = 0.15,
        conf: float = 0.25,
        margin: float = 0.05,  # column crop margin (reference padding ratio)
    ):
        from kuzu.core.config import load_config

        self.tile_grid = tile_grid
        self.tile_overlap = tile_overlap
        self.margin = margin
        self.column_det = None
        self.char_det = None
        self.recognizer = None
        self.lm = None
        if column_model:
            from kuzu.tasks.detect import DetectPredictor

            self.column_det = DetectPredictor(
                load_config(overrides={"model": str(column_model), "conf": conf})
            )
        if char_model:
            from kuzu.tasks.detect import DetectPredictor

            self.char_det = DetectPredictor(
                load_config(overrides={"model": str(char_model), "conf": conf})
            )
        if recognizer:
            from kuzu.tasks.recognize import RecognizePredictor

            self.recognizer = RecognizePredictor(
                load_config(overrides={"model": str(recognizer)})
            )
        if lm:
            from kuzu.tasks.lm import LMPredictor

            self.lm = LMPredictor(load_config(overrides={"model": str(lm)}))

    # ------------------------------------------------------------ stages
    def detect_columns(self, image_path: str | Path) -> dict[str, np.ndarray]:
        assert self.column_det is not None, "no column model configured"
        if self.tile_grid > 1:
            return self._detect_tiled(self.column_det, image_path)
        r = self.column_det([image_path])[0]
        return {k: r[k] for k in ("boxes", "scores", "classes")}

    def detect_chars(self, image_path: str | Path) -> dict[str, np.ndarray]:
        assert self.char_det is not None, "no char model configured"
        if self.tile_grid > 1:
            return self._detect_tiled(self.char_det, image_path)
        r = self.char_det([image_path])[0]
        return {k: r[k] for k in ("boxes", "scores", "classes")}

    def _detect_tiled(self, predictor, image_path) -> dict[str, np.ndarray]:
        import cv2
        import jax.numpy as jnp

        from kuzu.pipeline.tiling import merge_tile_detections, tile_image

        if not predictor.ready:
            predictor._setup()
        img = cv2.cvtColor(cv2.imread(str(image_path)), cv2.COLOR_BGR2RGB)
        tiles, metas = tile_image(
            img, grid=self.tile_grid, overlap=self.tile_overlap,
            tile_size=predictor.imgsz,
        )
        out = predictor._fwd(jnp.asarray(tiles))
        out = {k: np.asarray(v) for k, v in out.items()}
        per_tile = [
            {k: out[k][i] for k in ("boxes", "scores", "classes", "valid")}
            for i in range(len(tiles))
        ]
        return merge_tile_detections(per_tile, metas, page_shape=img.shape[:2])

    def crop_columns(
        self, image: np.ndarray, boxes: np.ndarray
    ) -> list[np.ndarray]:
        h, w = image.shape[:2]
        crops = []
        for x1, y1, x2, y2 in boxes:
            mw = (x2 - x1) * self.margin
            mh = (y2 - y1) * self.margin
            xa, ya = max(int(x1 - mw), 0), max(int(y1 - mh), 0)
            xb, yb = min(int(x2 + mw), w), min(int(y2 + mh), h)
            if xb <= xa or yb <= ya:
                # detection clipped to a sliver at the image edge: emit a
                # blank crop so downstream indices stay aligned
                crops.append(np.full((8, 8, 3), 255, np.uint8))
            else:
                crops.append(image[ya:yb, xa:xb])
        return crops

    def recognize_crops(self, crops: list[np.ndarray]) -> list[str]:
        assert self.recognizer is not None, "no recognizer configured"
        if not self.recognizer.ready:
            self.recognizer._setup()
        import jax.numpy as jnp

        from kuzu.models.trocr import greedy_generate

        if not crops:
            return []
        size = self.recognizer.image_size
        batch = []
        for c in crops:
            batch.append(self._letterbox_crop(c, size))
        images = jnp.asarray(np.stack(batch))
        out = greedy_generate(
            self.recognizer.model,
            self.recognizer.params,
            images,
            max_len=self.recognizer.model.max_len,
            bos_id=self.recognizer.tokenizer.bos_id,
            eos_id=self.recognizer.tokenizer.eos_id,
        )
        return self.recognizer.tokenizer.batch_decode(np.asarray(out))

    @staticmethod
    def _letterbox_crop(crop: np.ndarray, size: tuple[int, int]) -> np.ndarray:
        import cv2

        out_h, out_w = size
        h, w = crop.shape[:2]
        gain = min(out_h / max(h, 1), out_w / max(w, 1))
        nw, nh = max(int(w * gain), 1), max(int(h * gain), 1)
        resized = cv2.resize(crop, (nw, nh), interpolation=cv2.INTER_LINEAR)
        canvas = np.full((out_h, out_w, 3), 255, np.uint8)
        canvas[:nh, :nw] = resized
        arr = canvas.astype(np.float32) / 255.0
        return (arr - 0.5) / 0.5

    def rescore_texts(self, texts: list[str]) -> list[float]:
        """Masked pseudo-log-likelihood per text via the char-LM."""
        assert self.lm is not None, "no LM configured"
        if not self.lm.ready:
            self.lm._setup()
        import jax.numpy as jnp
        import optax

        tok = self.lm.tokenizer
        scores = []
        for t in texts:
            ids = tok.encode(t, max_length=self.lm.max_len)
            n = int((ids != tok.pad_id).sum())
            if n <= 2:
                scores.append(0.0)
                continue
            # mask each char position once (batched)
            pos = np.arange(1, n - 1)
            batch = np.tile(ids, (len(pos), 1))
            batch[np.arange(len(pos)), pos] = tok.mask_id
            logits = self.lm.model.apply(
                {"params": self.lm.params},
                jnp.asarray(batch),
                jnp.asarray((batch != tok.pad_id).astype(np.float32)),
            )
            lp = -optax.softmax_cross_entropy_with_integer_labels(
                logits[np.arange(len(pos)), pos], jnp.asarray(ids[pos])
            )
            scores.append(float(np.asarray(lp).mean()))
        return scores

    # --------------------------------------------------------------- e2e
    def process_page(self, image_path: str | Path) -> dict[str, Any]:
        import cv2

        image = cv2.cvtColor(cv2.imread(str(image_path)), cv2.COLOR_BGR2RGB)
        result: dict[str, Any] = {"image": str(image_path)}
        cols = self.detect_columns(image_path)
        order = sort_columns_right_to_left(cols["boxes"])
        boxes = cols["boxes"][order]
        scores = cols["scores"][order]
        result["columns"] = [
            {"box": b.tolist(), "score": float(s)} for b, s in zip(boxes, scores)
        ]
        if self.recognizer is not None:
            crops = self.crop_columns(image, boxes)
            texts = self.recognize_crops(crops)
            for c, t in zip(result["columns"], texts):
                c["text"] = t
            result["text"] = "\n".join(texts)
            if self.lm is not None and texts:
                lm_scores = self.rescore_texts(texts)
                for c, s in zip(result["columns"], lm_scores):
                    c["lm_score"] = s
        if self.char_det is not None:
            chars = self.detect_chars(image_path)
            result["characters"] = {
                "boxes": chars["boxes"].tolist(),
                "scores": chars["scores"].tolist(),
            }
        return result

    def process_pages(self, image_paths: list[str | Path]) -> list[dict]:
        """Batched multi-page cascade: ONE detector forward for all pages and
        ONE recognizer generate for all columns of all pages — the reference
        loops pages and crops sequentially (``inference.py:94``); batching
        amortizes dispatch and keeps the MXU fed."""
        import cv2

        if not image_paths:
            return []
        if self.tile_grid > 1:
            return [self.process_page(p) for p in image_paths]
        assert self.column_det is not None, "no column model configured"
        detections = self.column_det(list(image_paths))  # one batched forward
        results: list[dict] = []
        all_crops: list[np.ndarray] = []
        crop_spans: list[tuple[int, int]] = []
        for path, det in zip(image_paths, detections):
            image = cv2.cvtColor(cv2.imread(str(path)), cv2.COLOR_BGR2RGB)
            order = sort_columns_right_to_left(det["boxes"])
            boxes = det["boxes"][order]
            scores = det["scores"][order]
            result = {
                "image": str(path),
                "columns": [
                    {"box": b.tolist(), "score": float(s)}
                    for b, s in zip(boxes, scores)
                ],
            }
            if self.recognizer is not None:
                crops = self.crop_columns(image, boxes)
                crop_spans.append((len(all_crops), len(all_crops) + len(crops)))
                all_crops.extend(crops)
            else:
                crop_spans.append((0, 0))
            results.append(result)
        if self.recognizer is not None and all_crops:
            texts = self.recognize_crops(all_crops)  # one batched generate
            for result, (lo, hi) in zip(results, crop_spans):
                page_texts = texts[lo:hi]
                for col, t in zip(result["columns"], page_texts):
                    col["text"] = t
                result["text"] = "\n".join(page_texts)
                if self.lm is not None and page_texts:
                    for col, s in zip(
                        result["columns"], self.rescore_texts(page_texts)
                    ):
                        col["lm_score"] = s
        return results

    def save_result(self, result: dict, out_path: str | Path) -> None:
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        with open(out_path, "w") as f:
            yaml.safe_dump(result, f, allow_unicode=True, sort_keys=False)
