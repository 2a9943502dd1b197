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


def dedup_columns(
    boxes: np.ndarray,
    scores: np.ndarray,
    x_frac: float = 0.6,
    y_frac: float = 0.45,
) -> np.ndarray:
    """Indices of column boxes that survive same-region suppression.

    Tall thin columns produce duplicate detections that survive box-IoU
    NMS (a partial-height duplicate of a tall column has low corner IoU
    but reads the same text twice downstream). Walking by descending
    score, a box is dropped when its x-interval overlaps a kept box by
    more than ``x_frac`` of the narrower AND its y-interval by more than
    ``y_frac`` of the shorter — "reads largely the same region". This is
    suppression, not union-merge: the reference merges columns at ETL
    time (``data_preprocessv2.py:699``) where GT segments are known, but
    at inference the segments must stay separate (measured: union-merge
    costs ~170/334 matched columns on the dense val pages; this rule at
    conf 0.002 keeps 330/334 matched with 3 spurious — the (0.6, 0.45)
    fractions swept on cached detections, see PERFORMANCE.md).
    """
    order = np.argsort(-scores)
    keep: list[int] = []
    for i in order:
        b = boxes[i]
        dup = False
        for j in keep:
            a = boxes[j]
            ox = min(a[2], b[2]) - max(a[0], b[0])
            oy = min(a[3], b[3]) - max(a[1], b[1])
            if (
                ox > x_frac * max(min(a[2] - a[0], b[2] - b[0]), 1e-6)
                and oy > y_frac * max(min(a[3] - a[1], b[3] - b[1]), 1e-6)
            ):
                dup = True
                break
        if not dup:
            keep.append(i)
    return np.array(sorted(keep), np.int64)


def refine_columns_by_chars(
    col_boxes: np.ndarray,  # (C, 4) xyxy
    char_boxes: np.ndarray,  # (K, 4) xyxy, full-page frame
    pad: float = 4.0,
    gap_frac: float = 1.0,
    min_chars: int = 1,
) -> tuple[np.ndarray, np.ndarray]:
    """Snap column boxes to their character-detection support.

    The column detector localizes the segment roughly (a partial-height
    box can match GT at IoU 0.5 yet crop away 30% of the text — measured:
    GT-box crops read at CER 0.031 while detected-box crops read at 0.096,
    so box *extent* is the matched-column error, not crop margins). The
    char detector is near-perfect (mAP50 0.995), so each column snaps to
    the chars it actually contains: chars whose center-x falls in the
    column's x-band are merged bottom-up into vertical segments (split
    where the inter-char gap exceeds ``gap_frac`` x the band's median char
    height — intra-column gaps are a few px, inter-segment gaps tens), the
    column takes the segment it overlaps most, and its box becomes that
    segment's char union +- ``pad`` (the training-crop convention).
    Columns with no char support are dropped (keep mask False): nothing
    to read. Returns (refined (C, 4), keep (C,) bool).
    """
    col_boxes = np.asarray(col_boxes, np.float64)
    refined = col_boxes.copy()
    keep = np.zeros(len(col_boxes), bool)
    if len(char_boxes) == 0:
        return refined, keep
    ch = np.asarray(char_boxes, np.float64)
    cx = (ch[:, 0] + ch[:, 2]) / 2
    for i, (x1, y1, x2, y2) in enumerate(col_boxes):
        band = np.where((cx >= x1) & (cx <= x2))[0]
        if len(band) < min_chars:
            continue
        b = ch[band]
        gap = gap_frac * float(np.median(b[:, 3] - b[:, 1]))
        segs = _char_segments(b, gap)
        # the segment this column overlaps most, vertically
        best, best_ov = None, 0.0
        for s in segs:
            ov = min(s[1], y2) - max(s[0], y1)
            if ov > best_ov:
                best, best_ov = s, ov
        if best is None or len(best[4]) < min_chars:
            continue
        refined[i] = [
            best[2] - pad, best[0] - pad, best[3] + pad, best[1] + pad,
        ]
        keep[i] = True
    return refined, keep


def _char_segments(boxes: np.ndarray, gap: float) -> list[list]:
    """Merge char boxes (any order) into vertical segments: consecutive
    y-sorted chars join one segment while the inter-char gap stays within
    ``gap``. Returns [y_lo, y_hi, x_lo, x_hi, member_row_indices] per
    segment (rows index into ``boxes``)."""
    segs: list[list] = []
    for i in np.argsort(boxes[:, 1]):
        bx1, by1, bx2, by2 = boxes[i]
        if segs and by1 - segs[-1][1] <= gap:
            s = segs[-1]
            s[1] = max(s[1], by2)
            s[2] = min(s[2], bx1)
            s[3] = max(s[3], bx2)
            s[4].append(i)
        else:
            segs.append([by1, by2, bx1, bx2, [i]])
    return segs


def columns_from_orphan_chars(
    char_boxes: np.ndarray,  # (K, 4) xyxy
    char_scores: np.ndarray,  # (K,)
    col_boxes: np.ndarray,  # (C, 4) kept columns; orphans lie outside these
    pad: float = 4.0,
    gap_frac: float = 1.0,
    min_chars: int = 2,
) -> tuple[np.ndarray, np.ndarray]:
    """Synthesize column boxes for char detections no column claims.

    The column detector can miss a segment outright (never proposed at any
    confidence) while the char detector still reads every glyph in it.
    Chars whose center falls inside no kept column are grouped into
    x-bands (greedy: a char joins a band when its x-interval overlaps the
    band by half the narrower width — a column's chars stack at nearly
    equal x), each band splits into vertical segments by the same
    median-height gap rule as ``refine_columns_by_chars``, and every
    segment with at least ``min_chars`` support becomes a column whose
    score is its chars' mean detection score. Returns (boxes (N, 4),
    scores (N,)); the caller dedups against the kept columns.
    """
    ch = np.asarray(char_boxes, np.float64)
    sc = np.asarray(char_scores, np.float64)
    empty = np.zeros((0, 4), np.float64), np.zeros((0,), np.float64)
    if len(ch) == 0:
        return empty
    cx = (ch[:, 0] + ch[:, 2]) / 2
    cy = (ch[:, 1] + ch[:, 3]) / 2
    orphan = np.ones(len(ch), bool)
    for x1, y1, x2, y2 in np.asarray(col_boxes, np.float64):
        orphan &= ~((cx >= x1) & (cx <= x2) & (cy >= y1) & (cy <= y2))
    if orphan.sum() < min_chars:
        return empty
    ch, sc = ch[orphan], sc[orphan]
    # x-band grouping
    bands: list[list[float]] = []  # [x_lo, x_hi, member indices...]
    members: list[list[int]] = []
    for i in np.argsort(ch[:, 0]):
        x1, _, x2, _ = ch[i]
        placed = False
        for b, m in zip(bands, members):
            ov = min(b[1], x2) - max(b[0], x1)
            if ov >= 0.5 * min(b[1] - b[0], x2 - x1):
                b[0], b[1] = min(b[0], x1), max(b[1], x2)
                m.append(i)
                placed = True
                break
        if not placed:
            bands.append([x1, x2])
            members.append([i])
    boxes, scores = [], []
    for m in members:
        if len(m) < min_chars:
            continue
        b = ch[m]
        gap = gap_frac * float(np.median(b[:, 3] - b[:, 1]))
        for s in _char_segments(b, gap):
            if len(s[4]) < min_chars:
                continue
            boxes.append([s[2] - pad, s[0] - pad, s[3] + pad, s[1] + pad])
            scores.append(float(np.mean(sc[np.asarray(m)[s[4]]])))
    if not boxes:
        return empty
    return np.asarray(boxes, np.float64), np.asarray(scores, np.float64)


def _run_task(run_dir: str | Path, default: str = "recognize") -> str:
    """Task recorded in a training run's args.yaml snapshot."""
    args = Path(str(run_dir)) / "args.yaml"
    if args.exists():
        try:
            return str((yaml.safe_load(args.read_text()) or {}).get("task", default))
        except yaml.YAMLError:
            pass
    return default


def _bucket_floor(predictor, base: int = 8) -> int:
    """Smallest multiple of the predictor's mesh size >= ``base`` — bucket
    sizes (floor * 2^k) then stay divisible by the data axis even when the
    mesh size does not divide ``base`` (e.g. dp=6)."""
    m = max(1, getattr(predictor, "min_bucket", 1))
    return m * -(-base // m)


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
        decode: str = "greedy",  # 'beam' = reference num_beams=4;
        # 'beam_lm' = beam n-best reranked by the char-LM (needs ``lm``)
        num_beams: int = 4,
        max_det: int = 300,  # production char detection: 2000
        lm_weight: float = 0.3,  # beam_lm: score = beam + lm_weight * PLL
        dp: int = 0,  # data-parallel serving: shard every stage's batch
        # over a dp-device mesh (v5e-8 north star; core/mesh.py DataParallel)
        col_conf: float | None = None,  # column-stage conf (default: conf);
        # columns tolerate a much lower threshold than chars because
        # dedup_columns removes the duplicate reads low conf lets through
        col_dedup: bool = True,  # same-region column suppression
        col_refine: bool = True,  # snap column boxes to char-detection
        # support (tiled batched path; refine_columns_by_chars)
        col_recover: bool = True,  # synthesize columns for char segments
        # no column claims (columns_from_orphan_chars; needs col_refine)
        lm_mode: str = "annotate",  # what the LM stage does to final texts:
        # 'annotate' = attach a PLL lm_score per column (costs one jitted
        # rescore pass; never changes text), 'off' = skip it. Measured: for
        # a greedy recognizer the stage buys ZERO CER by construction —
        # decode='beam_lm' is the mode where the LM actually corrects
        # (n-best rerank), and it rescores regardless of lm_mode.
        ship_once: bool = True,  # equal-shape page batches cross the
        # tunnel once as raw uint8; letterbox/tiles/crops derive on device
        # (device_pages.py). Auto-falls-back for mixed shapes or dp>0.
        transport: str = "rgb",  # 'yc' ships full-res luma + 4x-subsampled
        # chroma (2.7x fewer tunnel bytes; device_pages.pack_yc) and
        # reconstructs RGB on device. Only affects the ship_once path.
        col_imgsz: int | None = None,  # run column detection on a smaller
        # on-device letterbox of the page (e.g. 960 instead of the model's
        # train size); compute drops quadratically, boxes still unscale to
        # page pixels. None = the column model's own imgsz.
    ):
        from kuzu.core.config import load_config

        self.dp = int(dp or 0)
        self.tile_grid = tile_grid
        self.tile_overlap = tile_overlap
        self.margin = margin
        self.decode = decode
        self.num_beams = num_beams
        self.max_det = max_det
        self.lm_weight = lm_weight
        self.lm_mode = lm_mode
        self.ship_once = ship_once
        self.transport = transport
        self.col_imgsz = int(col_imgsz) if col_imgsz else None
        self.col_dedup = col_dedup
        self.col_refine = col_refine
        self.col_recover = col_recover
        self.column_det = None
        self.char_det = None
        self.recognizer = None
        self.lm = None
        if column_model:
            from kuzu.tasks.detect import DetectPredictor

            self.column_det = DetectPredictor(
                load_config(
                    overrides={
                        "model": str(column_model),
                        "conf": conf if col_conf is None else col_conf,
                        "dp": self.dp,
                    }
                )
            )
        if char_model:
            from kuzu.tasks.detect import DetectPredictor

            self.char_det = DetectPredictor(
                load_config(
                    overrides={
                        "model": str(char_model), "conf": conf,
                        "max_det": max_det, "dp": self.dp,
                    }
                )
            )
        if recognizer:
            # pluggable recognizer family: the run dir's args.yaml says
            # whether it is an AR TrOCR run (task=recognize) or a CTC CRNN
            # run (task=ctc) — both train on the same column data
            self.rec_task = _run_task(recognizer)
            if self.rec_task == "ctc":
                from kuzu.tasks.ctc import CTCPredictor

                self.recognizer = CTCPredictor(
                    load_config(overrides={"model": str(recognizer), "dp": self.dp})
                )
            else:
                from kuzu.tasks.recognize import RecognizePredictor

                self.recognizer = RecognizePredictor(
                    load_config(overrides={"model": str(recognizer), "dp": self.dp})
                )
        if lm:
            from kuzu.tasks.lm import LMPredictor

            self.lm = LMPredictor(
                load_config(overrides={"model": str(lm), "dp": self.dp})
            )

    # ------------------------------------------------------------ stages
    def detect_columns(self, image_path: str | Path) -> dict[str, np.ndarray]:
        """Columns are page-scale objects: always detect on the full page.

        ``tile_grid`` applies only to *character* detection — tiling the
        column stage would cut every tall column into per-tile fragments
        (the batched path ``_process_pages_tiled`` already detected columns
        full-page; this keeps ``process_page`` consistent with it)."""
        assert self.column_det is not None, "no column model configured"
        r = self.column_det([image_path])[0]
        return self._dedup({k: r[k] for k in ("boxes", "scores", "classes")})

    def _dedup(self, det) -> dict:
        """Same-region column suppression (``dedup_columns``) on one
        detection (dict or Results — both index by key); returns a plain
        dict of boxes/scores/classes. No-op when ``col_dedup`` is off."""
        out = {k: np.asarray(det[k]) for k in ("boxes", "scores", "classes")}
        if not self.col_dedup or len(out["boxes"]) == 0:
            return out
        keep = dedup_columns(out["boxes"], out["scores"])
        return {k: v[keep] for k, v in out.items()}

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
        stack = np.asarray(tiles)
        # tile count is fixed per (grid, aspect) so no bucketing needed —
        # but dp shards the batch dim, which must divide the mesh
        pad = (-len(stack)) % predictor.min_bucket
        if pad:
            stack = np.concatenate([stack, np.zeros_like(stack[:1]).repeat(pad, 0)])
        out = predictor._fwd(stack)
        out = {k: np.asarray(v) for k, v in out.items()}
        per_tile = [
            {k: out[k][i] for k in ("boxes", "scores", "classes", "valid")}
            for i in range(len(tiles))
        ]
        return merge_tile_detections(
            per_tile, metas, page_shape=img.shape[:2], max_det=self.max_det
        )

    def _column_bounds(
        self, shape: tuple[int, ...], boxes: np.ndarray
    ) -> list[tuple[int, int, int, int]]:
        """Margin-expanded integer crop bounds per column box."""
        h, w = shape[:2]
        out = []
        for x1, y1, x2, y2 in boxes:
            mw = (x2 - x1) * self.margin
            mh = (y2 - y1) * self.margin
            xa, ya = max(int(x1 - mw), 0), max(int(y1 - mh), 0)
            xb, yb = min(int(x2 + mw), w), min(int(y2 + mh), h)
            out.append((xa, ya, xb, yb))
        return out

    def crop_columns(
        self, image: np.ndarray, boxes: np.ndarray
    ) -> list[np.ndarray]:
        crops = []
        for xa, ya, xb, yb in self._column_bounds(image.shape, boxes):
            if xb <= xa or yb <= ya:
                # detection clipped to a sliver at the image edge: emit a
                # blank crop so downstream indices stay aligned
                crops.append(np.full((8, 8, 3), 255, np.uint8))
            else:
                crops.append(image[ya:yb, xa:xb])
        return crops

    def detect_chars_in_columns(
        self, image: np.ndarray, boxes: np.ndarray
    ) -> list[dict[str, np.ndarray]]:
        """Per-column character detection, reference-shaped: crop each
        detected column, run the char detector INSIDE the column, map boxes
        back to the page frame, and order them top-to-bottom (vertical
        reading order). Matches ``scripts/inference.py:94-118``; unlike the
        reference's sequential crop loop, all columns of the call batch
        through one jitted forward (count padded to a static bucket).
        """
        assert self.char_det is not None, "no char model configured"
        if not self.char_det.ready:
            self.char_det._setup()
        if len(boxes) == 0:
            return []
        import jax.numpy as jnp

        size = self.char_det.imgsz
        bounds = self._column_bounds(image.shape, boxes)
        crops = self.crop_columns(image, boxes)
        tiles, metas = [], []
        from kuzu.data.yolo_dataset import letterbox_np

        for (xa, ya, _, _), crop in zip(bounds, crops):
            canvas, gain, (px, py) = letterbox_np(crop, size)
            tiles.append(canvas)  # uint8; the detector normalizes on-device
            metas.append((xa, ya, gain, px, py))
        # pad the column count to a static bucket so repeat pages reuse the
        # compiled program (a fresh batch dim = a fresh XLA program)
        from kuzu.data.loader import next_bucket

        n = len(tiles)
        nb = next_bucket(n, min_bucket=_bucket_floor(self.char_det))
        tiles.extend([np.zeros_like(tiles[0])] * (nb - n))
        out = self.char_det._fwd(np.stack(tiles))
        out = {k: np.asarray(v) for k, v in out.items()}
        per_col = []
        for i, ((xa, ya, gain, px, py), (_, _, xb, yb)) in enumerate(
            zip(metas, bounds)
        ):
            v = out["valid"][i]
            b = (out["boxes"][i][v] - [px, py, px, py]) / gain
            b += [xa, ya, xa, ya]
            # clip into the column's crop region (stays within the page)
            b[:, [0, 2]] = b[:, [0, 2]].clip(xa, max(xb, xa))
            b[:, [1, 3]] = b[:, [1, 3]].clip(ya, max(yb, ya))
            s = out["scores"][i][v]
            c = out["classes"][i][v]
            order = np.argsort(b[:, 1] + b[:, 3])  # top -> bottom
            per_col.append(
                {"boxes": b[order], "scores": s[order], "classes": c[order]}
            )
        return per_col

    def recognize_crops(self, crops: list[np.ndarray]) -> list[str]:
        assert self.recognizer is not None, "no recognizer configured"
        if not self.recognizer.ready:
            self.recognizer._setup()
        if not crops:
            return []
        size = self.recognizer.image_size
        batch = []
        for c in crops:
            batch.append(self._letterbox_crop(c, size))
        # pad crop count to a static bucket: every distinct batch size is a
        # fresh XLA program through the tunnel
        from kuzu.data.loader import next_bucket

        n = len(batch)
        nb = next_bucket(n, min_bucket=_bucket_floor(self.recognizer))
        batch.extend([np.zeros_like(batch[0])] * (nb - n))
        images = self.recognizer._put(np.stack(batch))
        return self._decode_crop_batch(images, n)

    def recognize_boxes_device(self, pages_dev, page_idx, boxes) -> list[str]:
        """Ship-once recognizer stage: crop-letterbox every column ON
        DEVICE from the resident page batch (``device_pages.device_crops``)
        and decode — no crop pixels cross the tunnel (the host previously
        shipped ~66 MB of letterboxed crops per 12-page production batch).
        ``boxes`` are margin-expanded page-pixel windows; degenerate
        (sliver) windows read as empty text, matching the host path's blank
        crops."""
        assert self.recognizer is not None, "no recognizer configured"
        if not self.recognizer.ready:
            self.recognizer._setup()
        n = len(page_idx)
        if n == 0:
            return []
        import jax.numpy as jnp

        from kuzu.data.loader import next_bucket
        from kuzu.pipeline.device_pages import device_crops

        boxes = np.asarray(boxes, np.float32)
        degenerate = (boxes[:, 2] - boxes[:, 0] < 1) | (
            boxes[:, 3] - boxes[:, 1] < 1
        )
        nb = next_bucket(n, min_bucket=_bucket_floor(self.recognizer))
        idx_p = np.zeros((nb,), np.int32)
        idx_p[:n] = np.asarray(page_idx, np.int32)
        box_p = np.tile(np.array([0, 0, 2, 2], np.float32), (nb, 1))
        box_p[:n] = np.where(degenerate[:, None], [0, 0, 2, 2], boxes)
        h, w = self.recognizer.image_size
        images = device_crops(
            pages_dev, jnp.asarray(idx_p), jnp.asarray(box_p),
            out_h=int(h), out_w=int(w),
        )
        texts = self._decode_crop_batch(images, n)
        return ["" if degenerate[i] else t for i, t in enumerate(texts)]

    def _decode_crop_batch(self, images, n: int) -> list[str]:
        """Decode a device-resident letterboxed crop batch (first n real)."""
        import jax.numpy as jnp

        from kuzu.models.trocr import generate

        tok = self.recognizer.tokenizer
        if getattr(self, "rec_task", "recognize") == "ctc":
            if self.decode == "beam_lm":
                raise ValueError(
                    "decode='beam_lm' reranks AR beam candidates; the CTC "
                    "recognizer decodes greedily (use decode='greedy')"
                )
            (seqs, lens), _ = self.recognizer._fwd(
                self.recognizer.variables, images
            )
            seqs, lens = np.asarray(seqs)[:n], np.asarray(lens)[:n]
            return [tok.decode(s[:m]) for s, m in zip(seqs, lens)]
        if self.decode == "beam_lm":
            # n-best reranking: beam candidates rescored by the char-LM's
            # masked pseudo-log-likelihood (the reference's LM-rescoring
            # recipe, P25 ``lm_demo`` rerank) — the LM corrects transcripts
            # instead of only annotating them
            assert self.lm is not None, "decode='beam_lm' needs an LM"
            from kuzu.models.trocr import beam_generate

            tokens, norm = beam_generate(
                self.recognizer.model,
                self.recognizer.params,
                images,
                max_len=self.recognizer.model.max_len,
                bos_id=tok.bos_id,
                eos_id=tok.eos_id,
                num_beams=self.num_beams,
                return_nbest=True,
            )
            tokens = np.asarray(tokens)[:n]  # (n, K, T)
            norm = np.asarray(norm)[:n]  # (n, K)
            K = tokens.shape[1]
            cand = [
                tok.batch_decode(tokens[i]) for i in range(n)
            ]  # n lists of K texts
            flat = [t for group in cand for t in group]
            pll = np.asarray(self.rescore_texts(flat)).reshape(n, K)
            final = norm + self.lm_weight * pll
            best = final.argmax(1)
            return [cand[i][int(best[i])] for i in range(n)]
        out = generate(
            self.recognizer.model,
            self.recognizer.params,
            images,
            max_len=self.recognizer.model.max_len,
            bos_id=tok.bos_id,
            eos_id=tok.eos_id,
            decode=self.decode,
            num_beams=self.num_beams,
        )
        return tok.batch_decode(np.asarray(out)[:n])

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
        return canvas  # uint8; TrOCR normalizes on-device (ops.images)

    def rescore_texts(self, texts: list[str]) -> list[float]:
        """Masked pseudo-log-likelihood per text via the char-LM.

        ALL texts score in ONE jitted program: a ``lax.scan`` over positions
        masks position p for every text simultaneously and accumulates the
        per-text log-prob — no per-text Python dispatch (the reference loops
        texts through its MLM one at a time, P23/P25). Text count pads to a
        static bucket so repeat calls reuse the compiled program.
        """
        assert self.lm is not None, "no LM configured"
        if not self.lm.ready:
            self.lm._setup()
        import jax
        import jax.numpy as jnp

        tok = self.lm.tokenizer
        if not texts:
            return []
        max_len = self.lm.max_len
        ids = np.stack([tok.encode(t, max_length=max_len) for t in texts])
        lens = (ids != tok.pad_id).sum(1).astype(np.int32)
        # bucket the SEQUENCE length too: the scan masks one position per
        # step, so trailing pad columns cost a full MLM forward each.
        # Column texts run ~15-20 chars; cutting 128 -> 32 drops both the
        # scan trip count and the per-forward attention width (~10x less
        # work), while the (batch, length) bucket pair keeps compiles
        # reusable across calls.
        from kuzu.data.loader import next_bucket as _nb

        L = min(_nb(int(lens.max()), min_bucket=16), max_len)
        ids = ids[:, :L]

        fn = getattr(self, "_rescore_fn", None)
        if fn is None:
            import optax

            model, mask_id, pad_id = self.lm.model, tok.mask_id, tok.pad_id

            def _pll(params, ids, lens):
                attn = (ids != pad_id).astype(jnp.float32)

                def body(acc, p):
                    masked = ids.at[:, p].set(
                        jnp.where(ids[:, p] != pad_id, mask_id, ids[:, p])
                    )
                    logits = model.apply({"params": params}, masked, attn)
                    lp = -optax.softmax_cross_entropy_with_integer_labels(
                        logits[:, p], ids[:, p]
                    )
                    valid = ((p >= 1) & (p < lens - 1)).astype(jnp.float32)
                    return acc + lp * valid, None

                total, _ = jax.lax.scan(
                    body, jnp.zeros(ids.shape[0], jnp.float32),
                    jnp.arange(ids.shape[1]),
                )
                denom = jnp.maximum(lens - 2, 1).astype(jnp.float32)
                return total / denom

            fn = self._rescore_fn = jax.jit(_pll)

        # pad text count to a static bucket (8/16/32/..., dp-divisible) for
        # shape reuse
        from kuzu.data.loader import next_bucket

        t = len(texts)
        tp = next_bucket(t, min_bucket=_bucket_floor(self.lm))
        ids_p = np.zeros((tp, ids.shape[1]), ids.dtype)
        ids_p[:t] = ids
        lens_p = np.zeros((tp,), np.int32)
        lens_p[:t] = lens
        scores = np.asarray(
            fn(self.lm.params, self.lm._put(ids_p), self.lm._put(lens_p))
        )
        return [float(scores[i]) if lens[i] > 2 else 0.0 for i in range(t)]

    # ------------------------------------------------ ship-once device path
    def _detect_pages_device(
        self, predictor, pages_dev, hw, imgsz: int | None = None
    ) -> list[dict]:
        """Full-page detection over a device-resident uint8 page batch:
        letterbox ON DEVICE + the predictor's fused forward in one jit
        (cached per (shape, imgsz)); boxes unscale to page pixels on host
        exactly like DetectPredictor._predict_frames. ``imgsz`` overrides
        the predictor's input side (the anchor-free decode derives its
        grids from the actual map shapes, so any size lowers cleanly)."""
        import jax

        from kuzu.pipeline.device_pages import device_letterbox

        if not predictor.ready:
            predictor._setup()
        imgsz = int(imgsz or predictor.imgsz)
        key = ("pages", tuple(pages_dev.shape), imgsz)
        cache = getattr(self, "_dev_fwd_cache", None)
        if cache is None:
            cache = self._dev_fwd_cache = {}
        fwd = cache.get(key)
        if fwd is None:
            fwd = cache[key] = jax.jit(
                lambda v, p: predictor._fwd_jit(
                    v, device_letterbox(p, imgsz)[0]
                )
            )
        out = {
            k: np.asarray(v)
            for k, v in fwd(predictor.variables, pages_dev).items()
        }
        h, w = hw
        gain = min(imgsz / h, imgsz / w)
        nw, nh = max(int(round(w * gain)), 1), max(int(round(h * gain)), 1)
        px, py = (imgsz - nw) // 2, (imgsz - nh) // 2
        dets = []
        for i in range(len(out["boxes"])):
            v = out["valid"][i].astype(bool)
            b = (out["boxes"][i][v] - [px, py, px, py]) / gain
            b[:, [0, 2]] = b[:, [0, 2]].clip(0, w)
            b[:, [1, 3]] = b[:, [1, 3]].clip(0, h)
            dets.append(
                {
                    "boxes": b,
                    "scores": out["scores"][i][v],
                    "classes": out["classes"][i][v],
                }
            )
        return dets

    def _detect_tiles_device(self, pages_dev, hw):
        """Char detection over on-device overlap tiles of the resident
        page batch (one jit: tile extraction + fused forward). Returns
        (padded NMS out over B*T tiles, single-page tile metas)."""
        import jax

        from kuzu.pipeline.device_pages import device_tiles, tile_bounds_px

        predictor = self.char_det
        imgsz = predictor.imgsz
        key = ("tiles", tuple(pages_dev.shape), imgsz, self.tile_grid)
        cache = getattr(self, "_dev_fwd_cache", None)
        if cache is None:
            cache = self._dev_fwd_cache = {}
        fwd = cache.get(key)
        if fwd is None:
            grid, overlap = self.tile_grid, self.tile_overlap

            def f(v, p):
                tiles, _ = device_tiles(p, grid, overlap, imgsz)
                return predictor._fwd_jit(v, tiles)

            fwd = cache[key] = jax.jit(f)
        out = {
            k: np.asarray(v)
            for k, v in fwd(predictor.variables, pages_dev).items()
        }
        # metas identical across pages (shared geometry); recompute host-side
        h, w = hw
        metas = []
        for px1, py1, px2, py2 in tile_bounds_px(h, w, self.tile_grid, self.tile_overlap):
            th, tw = py2 - py1, px2 - px1
            gain = min(imgsz / th, imgsz / tw)
            nw2, nh2 = max(int(round(tw * gain)), 1), max(int(round(th * gain)), 1)
            metas.append(
                {
                    "origin": (px1, py1),
                    "gain": gain,
                    "pad": ((imgsz - nw2) // 2, (imgsz - nh2) // 2),
                }
            )
        return out, metas

    # --------------------------------------------------------------- e2e
    def process_page(self, image_path: str | Path) -> dict[str, Any]:
        """One page through the cascade. With ``tile_grid > 1`` this is the
        batched production path for a single page (full-page char det →
        column refinement/orphan recovery → batched recognize); otherwise
        the reference-shaped sequential flow (column det → crop → per-column
        char det, ``inference.py:94-118``) which has no full-page char map
        to refine against."""
        if self.tile_grid > 1:
            return self._process_pages_tiled([image_path])[0]
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
            if len(boxes):
                # reference shape: char detection inside each column crop,
                # coords mapped back to the page (inference.py:94-118)
                per_col = self.detect_chars_in_columns(image, boxes)
                for col, ch in zip(result["columns"], per_col):
                    col["chars"] = {
                        "boxes": ch["boxes"].tolist(),
                        "scores": ch["scores"].tolist(),
                    }
                all_b = [c["boxes"] for c in per_col if len(c["boxes"])]
                all_s = [c["scores"] for c in per_col if len(c["scores"])]
                result["characters"] = {
                    "boxes": np.concatenate(all_b).tolist() if all_b else [],
                    "scores": np.concatenate(all_s).tolist() if all_s else [],
                }
            else:
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
            return self._process_pages_tiled(image_paths)
        assert self.column_det is not None, "no column model configured"
        detections = [
            self._dedup(d) for d in self.column_det(list(image_paths))
        ]  # one batched forward
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
            if self.char_det is not None and len(boxes):
                per_col = self.detect_chars_in_columns(image, boxes)
                for col, ch in zip(result["columns"], per_col):
                    col["chars"] = {
                        "boxes": ch["boxes"].tolist(),
                        "scores": ch["scores"].tolist(),
                    }
            results.append(result)
        if self.recognizer is not None and all_crops:
            texts = self.recognize_crops(all_crops)  # one batched generate
            # ONE jitted rescore for every column of every page (per-page
            # calls were one dispatch + one bucket pad each)
            scores = (
                self.rescore_texts(texts)
                if self.lm is not None and self.lm_mode != "off"
                else None
            )
            for result, (lo, hi) in zip(results, crop_spans):
                page_texts = texts[lo:hi]
                for col, t in zip(result["columns"], page_texts):
                    col["text"] = t
                result["text"] = "\n".join(page_texts)
                if scores is not None:
                    for col, s in zip(result["columns"], scores[lo:hi]):
                        col["lm_score"] = s
        return results

    def _process_pages_tiled(self, image_paths: list[str | Path]) -> list[dict]:
        """Batched production cascade for high-resolution pages.

        The production character detector is trained on overlap tiles
        (reference quadrant pipeline, ``character_detection.yaml:37-43``)
        and the app predicts with ``max_det=2000``
        (``yolo_inference_app.py:103``). Here every stage stays batched:
        one full-page forward for columns (columns are large — no tiling
        needed at 640), ONE forward over *all pages' tiles* for characters
        (merged per page with cross-tile NMS), one batched generate for all
        column crops, one jitted LM rescore."""
        import cv2
        import jax.numpy as jnp

        from kuzu.data.loader import next_bucket
        from kuzu.pipeline.tiling import (
            merge_tile_detections_pages,
            tile_image,
        )

        assert self.column_det is not None, "no column model configured"
        images = [
            cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB)
            for p in image_paths
        ]
        # ship-once fast path: equal-shape pages cross the tunnel ONCE as
        # raw uint8; the column letterbox, the char tiles, and the
        # recognizer crops all derive on device (device_pages.py — the
        # production cascade was transfer-bound at ~50 MB/s with a 1:1
        # host-RAM leak per byte shipped)
        ship_once = (
            self.ship_once
            and self.dp == 0
            and len({im.shape for im in images}) == 1
        )
        pages_dev = None
        if ship_once:
            import jax

            b = len(images)
            nb = next_bucket(b, min_bucket=1)
            stack = np.stack(images)
            if nb > b:
                stack = np.concatenate(
                    [stack, np.zeros_like(stack[:1]).repeat(nb - b, 0)]
                )
            h0, w0 = stack.shape[1:3]
            if self.transport == "yc" and h0 % 4 == 0 and w0 % 4 == 0:
                from kuzu.pipeline.device_pages import pack_yc, unpack_yc

                unpack = getattr(self, "_unpack_jit", None)
                if unpack is None:
                    unpack = self._unpack_jit = jax.jit(unpack_yc)
                y, c = pack_yc(stack)
                pages_dev = unpack(jax.device_put(y), jax.device_put(c))
            else:
                pages_dev = jax.device_put(stack)
            col_dets = [
                self._dedup(d)
                for d in self._detect_pages_device(
                    self.column_det, pages_dev, images[0].shape[:2],
                    imgsz=self.col_imgsz,
                )[:b]
            ]
        else:
            col_dets = [
                self._dedup(d) for d in self.column_det(list(image_paths))
            ]  # batched full pages

        # characters: all pages' tiles through one forward
        char_pages: list[dict] | None = None
        if self.char_det is not None:
            if not self.char_det.ready:
                self.char_det._setup()
            if ship_once:
                out, metas = self._detect_tiles_device(
                    pages_dev, images[0].shape[:2]
                )
                t = len(metas)
                spans = [(i * t, (i + 1) * t) for i in range(len(images))]
                metas_all = metas * len(images)
            else:
                tiles_all, metas_all, spans = [], [], []
                for img in images:
                    tiles, metas = tile_image(
                        img, grid=self.tile_grid, overlap=self.tile_overlap,
                        tile_size=self.char_det.imgsz,
                    )
                    spans.append((len(tiles_all), len(tiles_all) + len(tiles)))
                    tiles_all.extend(tiles)
                    metas_all.extend(metas)
                stack = np.stack(tiles_all)
                pad = next_bucket(
                    len(stack), min_bucket=_bucket_floor(self.char_det)
                ) - len(stack)
                if pad:
                    # zeros_like(stack[:1]).repeat: stack[:pad] yields at
                    # most len(stack) rows and under-pads when pad >
                    # len(stack)
                    stack = np.concatenate(
                        [stack, np.zeros_like(stack[:1]).repeat(pad, 0)]
                    )
                out = self.char_det._fwd(stack)
                out = {k: np.asarray(v) for k, v in out.items()}
            # cross-tile NMS for ALL pages in one device call (a per-page
            # dispatch costs a fixed tunnel round-trip each)
            char_pages = merge_tile_detections_pages(
                [
                    [
                        {
                            k: out[k][i]
                            for k in ("boxes", "scores", "classes", "valid")
                        }
                        for i in range(lo, hi)
                    ]
                    for lo, hi in spans
                ],
                [metas_all[lo:hi] for lo, hi in spans],
                page_shapes=[img.shape[:2] for img in images],
                max_det=self.max_det,
            )
            if self.col_refine:
                # snap each column to its char support; refined duplicates
                # collapse onto the same segment, so dedup again
                for pi, det in enumerate(col_dets):
                    ph, pw = images[pi].shape[:2]
                    boxes = np.asarray(det["boxes"])
                    cb = np.asarray(char_pages[pi]["boxes"])
                    if len(boxes):
                        ref, ok = refine_columns_by_chars(boxes, cb)
                        # char-union +- pad can step past the page edge
                        ref[:, [0, 2]] = ref[:, [0, 2]].clip(0, pw)
                        ref[:, [1, 3]] = ref[:, [1, 3]].clip(0, ph)
                        det = self._dedup(
                            {
                                "boxes": ref[ok],
                                "scores": np.asarray(det["scores"])[ok],
                                "classes": np.asarray(det["classes"])[ok],
                            }
                        )
                    if self.col_recover and len(cb):
                        # char segments no column claims become columns —
                        # the column head can miss a segment outright while
                        # the char head still reads every glyph in it
                        ob, osc = columns_from_orphan_chars(
                            cb,
                            np.asarray(char_pages[pi]["scores"]),
                            np.asarray(det["boxes"]),
                        )
                        if len(ob):
                            ob[:, [0, 2]] = ob[:, [0, 2]].clip(0, pw)
                            ob[:, [1, 3]] = ob[:, [1, 3]].clip(0, ph)
                            det = self._dedup(
                                {
                                    "boxes": np.concatenate(
                                        [np.asarray(det["boxes"]), ob]
                                    ),
                                    "scores": np.concatenate(
                                        [np.asarray(det["scores"]), osc]
                                    ),
                                    "classes": np.concatenate(
                                        [
                                            np.asarray(det["classes"]),
                                            np.zeros(len(ob), np.int32),
                                        ]
                                    ),
                                }
                            )
                    col_dets[pi] = det

        results: list[dict] = []
        all_crops: list[np.ndarray] = []
        crop_spans: list[tuple[int, int]] = []
        for pi, (path, image, det) in enumerate(
            zip(image_paths, images, col_dets)
        ):
            order = sort_columns_right_to_left(np.asarray(det["boxes"]))
            boxes = np.asarray(det["boxes"])[order]
            scores = np.asarray(det["scores"])[order]
            result: dict[str, Any] = {
                "image": str(path),
                "columns": [
                    {"box": b.tolist(), "score": float(s)}
                    for b, s in zip(boxes, scores)
                ],
            }
            if char_pages is not None:
                chars = char_pages[pi]
                result["characters"] = {
                    "boxes": chars["boxes"].tolist(),
                    "scores": chars["scores"].tolist(),
                }
                # per-column assignment by center containment (reading order)
                if len(boxes):
                    cx = (chars["boxes"][:, 0] + chars["boxes"][:, 2]) / 2
                    cy = (chars["boxes"][:, 1] + chars["boxes"][:, 3]) / 2
                    for col, cb in zip(result["columns"], boxes):
                        inside = (
                            (cx >= cb[0]) & (cx <= cb[2])
                            & (cy >= cb[1]) & (cy <= cb[3])
                        )
                        cb_boxes = chars["boxes"][inside]
                        cb_scores = chars["scores"][inside]
                        top = np.argsort(
                            cb_boxes[:, 1] + cb_boxes[:, 3]
                        )  # top -> bottom
                        col["chars"] = {
                            "boxes": cb_boxes[top].tolist(),
                            "scores": cb_scores[top].tolist(),
                        }
            if self.recognizer is not None:
                if ship_once:
                    bounds = self._column_bounds(image.shape, boxes)
                    crop_spans.append(
                        (len(all_crops), len(all_crops) + len(bounds))
                    )
                    all_crops.extend((pi, bd) for bd in bounds)
                else:
                    crops = self.crop_columns(image, boxes)
                    crop_spans.append(
                        (len(all_crops), len(all_crops) + len(crops))
                    )
                    all_crops.extend(crops)
            else:
                crop_spans.append((0, 0))
            results.append(result)
        if self.recognizer is not None and all_crops:
            if ship_once:
                texts = self.recognize_boxes_device(
                    pages_dev,
                    [pi for pi, _ in all_crops],
                    [bd for _, bd in all_crops],
                )
            else:
                texts = self.recognize_crops(all_crops)
            scores = (
                self.rescore_texts(texts)
                if self.lm is not None and self.lm_mode != "off"
                else None
            )
            for result, (lo, hi) in zip(results, crop_spans):
                page_texts = texts[lo:hi]
                for col, t in zip(result["columns"], page_texts):
                    col["text"] = t
                result["text"] = "\n".join(page_texts)
                if scores is not None:
                    for col, s in zip(result["columns"], scores[lo:hi]):
                        col["lm_score"] = s
        return results

    def save_result(self, result: dict, out_path: str | Path) -> None:
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        with open(out_path, "w") as f:
            yaml.safe_dump(result, f, allow_unicode=True, sort_keys=False)
