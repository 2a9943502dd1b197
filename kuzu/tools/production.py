"""Production-regime harness: dense pages, real vocabulary, full cascade.

Round-2 VERDICT item 1 — everything quality-related so far ran on tiny
synthetic sets; the reference's *production* regime is dense pages (the web
app predicts with ``max_det=2000``, ``scripts/yolo_inference_app.py:103``),
a ~4.8k-char vocabulary (``/root/reference/data/unicode_translation.csv``,
4,783 rows) and 128-token column transcriptions. This module builds that
regime synthetically and drives the full production configuration through
training, evaluation, the cascade benchmark, and the one real sample page in
the environment (``/root/reference/data/examples/sample.jpg``).

Glyphs are procedural (no CJK font exists in this image): each codepoint
renders as a *deterministic* brush-stroke pattern seeded by its code, so the
mapping glyph→char is learnable at the real vocabulary scale and the
pipeline runs at the real density — the stand-in is the glyph *shapes*, not
the regime (density, vocab size, column structure, reading order, pipeline
semantics are all production-faithful).

Commands (``python -m kuzu.tools.production <cmd> k=v ...``):
  synth    build the dense-page dataset suite under root=runs/production
  train    train col/char/rec/lm at production config (stage=all|col|char|rec|lm)
  quality  dense-page detection mAP@max_det=2000 + recognizer CER
  bench    cascade pages/s at the production configuration
  profile  differential per-stage timing of the production cascade
  sample   run the cascade on the real sample page -> YAML + viz
  real     score column detection on the hand-labeled real sample page
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

VOCAB_CSV = Path("/root/reference/data/unicode_translation.csv")
SAMPLE_PAGE = Path("/root/reference/data/examples/sample.jpg")

PAGE = 1280  # synthetic page side (reference pages are high-res scans)


# ------------------------------------------------------------------ vocab


def load_vocab(csv_path: Path = VOCAB_CSV) -> list[str]:
    """The real 4,783-char kuzushiji vocabulary (reference P15 ``Vocab`` is
    CSV-driven, ``src/utils/tokenizer.py:27``)."""
    if not csv_path.exists():
        raise FileNotFoundError(
            f"vocabulary csv not found: {csv_path} (reference data asset)"
        )
    chars = []
    for line in csv_path.read_text(encoding="utf-8").splitlines()[1:]:
        uni = line.split(",")[0].strip()
        if uni.startswith("U+"):
            chars.append(chr(int(uni[2:], 16)))
    return chars


def production_tokenizer():
    from kuzu.data.tokenizer import SPECIALS, CharTokenizer

    vocab = load_vocab()
    # NFKC-off: the historical vocab distinguishes variants NFKC would fold
    return CharTokenizer(
        vocab={
            **{t: i for i, t in enumerate(SPECIALS)},
            **{c: i + len(SPECIALS) for i, c in enumerate(dict.fromkeys(vocab))},
        },
        nfkc=False,
    )


# ------------------------------------------------------------ glyph render


def _glyph_strokes(codepoint: int) -> list:
    """Deterministic stroke set for one codepoint (unit square coords)."""
    r = np.random.default_rng(codepoint * 2654435761 % 2**32)
    strokes = []
    for _ in range(int(r.integers(2, 6))):
        pts = r.random((int(r.integers(2, 5)), 2)) * 0.9 + 0.05
        strokes.append((pts, float(r.random() * 0.12 + 0.05)))
    return strokes


_STROKE_CACHE: dict[int, list] = {}


def draw_glyph(d, ch: str, x: int, y: int, w: int, h: int, rng, ink=(40, 30, 25)):
    cp = ord(ch)
    strokes = _STROKE_CACHE.get(cp)
    if strokes is None:
        strokes = _STROKE_CACHE[cp] = _glyph_strokes(cp)
    jx, jy = rng.normal(0, 0.015, 2)
    shade = int(rng.integers(0, 30))
    col = tuple(min(255, c + shade) for c in ink)
    for pts, width in strokes:
        px = [(x + (p[0] + jx) * w, y + (p[1] + jy) * h) for p in pts]
        d.line(px, fill=col, width=max(1, int(width * w)))


# ------------------------------------------------------- page degradation


def _real_margin_textures(patch: int = 160) -> list[np.ndarray]:
    """Paper-texture patches sampled from the real sample page's margins
    (the only real kuzushiji pixels in this environment) — the synthetic
    renderer multiplies them in as background so detector/recognizer train
    on realistic paper instead of flat RGB (round-3 real-page domain gap)."""
    if not SAMPLE_PAGE.exists():
        return []
    import cv2

    img = cv2.cvtColor(cv2.imread(str(SAMPLE_PAGE)), cv2.COLOR_BGR2RGB)
    h, w = img.shape[:2]
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).astype(np.float32)
    cands = []
    for y in range(0, h - patch, patch // 2):
        for x in range(0, w - patch, patch // 2):
            g = gray[y : y + patch, x : x + patch]
            m = float(g.mean())
            if m < 120:  # binding shadow / black blotch — not paper
                continue
            cands.append((float(g.std()), y, x))
    cands.sort()
    out = []
    for _, y, x in cands[:8]:  # the 8 most uniform = blank paper
        p = img[y : y + patch, x : x + patch].astype(np.float32)
        # normalize by the SCALAR mean: keeps the warm paper color cast
        # (the real page is tan; the synth base is gray-green)
        out.append(p / max(p.mean(), 1.0))
    return out


_TEXTURES: list[np.ndarray] | None = None


def degrade_page(img, rng, strength: float = 1.0):
    """Historical-document degradation on a rendered PIL page: real-margin
    paper texture, low-frequency tone field, ink bleed (edge blur), stains,
    and sensor grain. Geometry-free — boxes stay valid. ``strength=0`` is
    the identity (the round-3 regime)."""
    if strength <= 0:
        return img
    import cv2
    from PIL import Image

    global _TEXTURES
    if _TEXTURES is None:
        _TEXTURES = _real_margin_textures()
    a = np.asarray(img).astype(np.float32)
    h, w = a.shape[:2]
    # real paper texture, tiled at a random scale
    if _TEXTURES and rng.random() < 0.9 * strength:
        tex = _TEXTURES[int(rng.integers(len(_TEXTURES)))]
        scale = float(rng.uniform(0.7, 1.6))
        tw = max(32, int(tex.shape[1] * scale))
        tex = cv2.resize(tex, (tw, tw), interpolation=cv2.INTER_LINEAR)
        reps = (h // tw + 2, w // tw + 2)
        field = np.tile(tex, (reps[0], reps[1], 1))[:h, :w]
        blend = float(rng.uniform(0.25, 0.7)) * strength
        a = a * (1.0 - blend + blend * field)
    # low-frequency tone field (uneven lighting / aging)
    g = rng.normal(1.0, 0.05 * strength, (8, 8)).astype(np.float32)
    g = cv2.resize(g, (w, h), interpolation=cv2.INTER_CUBIC)
    a *= g[..., None]
    # ink bleed: soft blur spreads stroke edges
    if rng.random() < 0.7 * strength:
        a = cv2.GaussianBlur(a, (0, 0), float(rng.uniform(0.4, 1.0)))
    # stains / foxing blotches
    for _ in range(int(rng.integers(0, 4))):
        mask = np.zeros((h, w), np.float32)
        cx, cy = int(rng.integers(w)), int(rng.integers(h))
        ax, ay = int(rng.integers(20, 140)), int(rng.integers(20, 140))
        cv2.ellipse(
            mask, (cx, cy), (ax, ay), float(rng.uniform(0, 180)), 0, 360,
            1.0, -1,
        )
        mask = cv2.GaussianBlur(mask, (0, 0), ax / 3 + 1)
        tint = rng.uniform(0.82, 0.96)
        a = a * (1.0 - mask[..., None] * (1.0 - tint))
    # grain
    a += rng.normal(0, 2.5 * strength, a.shape).astype(np.float32)
    return Image.fromarray(np.clip(a, 0, 255).astype(np.uint8))


# ------------------------------------------------------------- page synth


class MarkovText:
    """Seeded bigram text model over the real vocabulary: Zipf unigram
    base + a sparse per-char successor table.

    Real kuzushiji text has strong sequential structure (that is why the
    reference pretrains a char-LM and rescores with it, P23/P25). The v2
    harness drew characters i.i.d.-Zipf, which capped the LM at the
    unigram prior (masked_acc 0.19) and made rescoring meaningless; a
    bigram chain makes the LM learnable while keeping enough entropy that
    recognition still has to read the glyphs."""

    def __init__(self, n_chars: int, rng, k: int = 6, alpha: float = 0.85,
                 zipf: float = 1.1):
        ranks = rng.permutation(n_chars)
        p = 1.0 / (np.argsort(ranks) + 1.0) ** zipf
        self.p = p / p.sum()
        # k successors per char, themselves Zipf-drawn; geometric weights
        self.succ = rng.choice(n_chars, size=(n_chars, k), p=self.p)
        w = 0.5 ** np.arange(k)
        self.w = w / w.sum()
        self.alpha = alpha
        self._cdf = np.cumsum(self.p)
        self._wcdf = np.cumsum(self.w)

    def _base(self, rng) -> int:
        return int(np.searchsorted(self._cdf, rng.random()))

    def line(self, rng, length: int) -> list[int]:
        out = [self._base(rng)]
        for _ in range(length - 1):
            if rng.random() < self.alpha:
                j = int(np.searchsorted(self._wcdf, rng.random()))
                out.append(int(self.succ[out[-1], j]))
            else:
                out.append(self._base(rng))
        return out


def synth_corpus(tok, n_lines: int, max_len: int, rng) -> list[str]:
    """Markov-structured text over the real vocabulary."""
    chars = [c for c in tok.vocab if len(c) == 1]
    mk = MarkovText(len(chars), rng)
    lines = []
    for _ in range(n_lines):
        ln = int(rng.integers(max_len // 3, max_len))
        lines.append("".join(chars[i] for i in mk.line(rng, ln)))
    return lines


def synth_dense_pages(
    root: Path,
    n_train: int = 48,
    n_val: int = 12,
    page: int = PAGE,
    seed: int = 0,
    extra_cols: int = 6000,
    text_alpha: float = 0.5,
    degrade: float = 1.0,
    col_extra_pages: int = 0,
) -> dict:
    """Build the production dataset suite: dense pages (≥800 glyphs/page),
    page-level char labels (nc=1), column labels, tiled char-detect set,
    column_info.csv for the recognizer, and an LM corpus — the offline ETL
    the reference runs via P19/P20 (data_preprocessing + prepare_yolo_*)."""
    import yaml
    from PIL import Image, ImageDraw

    from kuzu.tools.yolo_prep import build_tiled_dataset

    tok = production_tokenizer()
    rng = np.random.default_rng(seed)
    chars = [c for c in tok.vocab if len(c) == 1]
    # alpha tunes the bigram strength. 0.85 made the chain SO predictable
    # that teacher-forced TrOCR training satisfied itself from the text
    # prior alone and never bootstrapped cross-attention (both v3 runs
    # plateaued at train token_acc ~0.43 = exactly the causal-prediction
    # ceiling of the chain, with val CER ~1.0). 0.5 keeps the LM learnable
    # (masked ceiling ~0.4) while making the image the dominant signal.
    mk = MarkovText(len(chars), rng, alpha=text_alpha)

    root = Path(root)
    csv_rows = ["column_image,original_image,box_in_original,unicode_ids"]
    corpus: dict[str, list[str]] = {"train": [], "val": []}
    stats = {"glyphs_per_page": []}
    for split, n in (("train", n_train), ("val", n_val)):
        for sub in ("char/images", "char/labels", "col/images", "col/labels"):
            (root / sub / split).mkdir(parents=True, exist_ok=True)
        (root / "columns" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            bg = 220 + int(rng.integers(0, 28))
            img = Image.new("RGB", (page, page), (bg, bg - 5, bg - 18))
            d = ImageDraw.Draw(img)
            char_rows, col_rows = [], []
            pending_crops = []  # crop AFTER degradation (recognizer sees it)
            n_cols = int(rng.integers(12, 20))
            # kuzushiji reading order: columns right -> left
            xs = np.linspace(0.95, 0.05, n_cols) * page
            glyphs = 0
            for ci, cx in enumerate(xs):
                cw = int(rng.integers(14, 24))  # column width ~ char size
                y = int(rng.integers(24, 70))
                seg = 0
                while y < page - 80:
                    # columns run as 1-3 vertical SEGMENTS per x position
                    # (paragraph breaks) — also keeps each column box within
                    # the DFL head's representable extent (ltrb <= reg_max-1
                    # grid units at stride 32: a full-page 1200 px column at
                    # 640 train size exceeds it and cannot be regressed; the
                    # reference Detect head has the same reg_max=16 ceiling)
                    seg_end = min(
                        y + int(rng.integers(280, 680)), page - 20
                    )
                    col_chars, col_boxes = [], []
                    seg_text = [chars[i] for i in mk.line(rng, 80)]
                    while y < seg_end:
                        ch = seg_text[len(col_chars)]
                        w = cw + int(rng.integers(-3, 4))
                        h = int(w * rng.uniform(0.9, 1.4))
                        x = int(cx - w / 2 + rng.integers(-3, 4))
                        x = max(0, min(page - w - 1, x))
                        if y + h > seg_end:
                            break
                        draw_glyph(d, ch, x, y, w, h, rng)
                        char_rows.append(
                            f"0 {(x + w / 2) / page:.6f} {(y + h / 2) / page:.6f} "
                            f"{w / page:.6f} {h / page:.6f}"
                        )
                        col_chars.append(ch)
                        col_boxes.append((x, y, x + w, y + h))
                        y += h + int(rng.integers(1, 6))
                    y += int(rng.integers(50, 110))  # inter-segment gap
                    glyphs += len(col_chars)
                    if len(col_chars) < 2:
                        continue
                    bx = np.array(col_boxes)
                    x1, y1 = bx[:, 0].min() - 4, bx[:, 1].min() - 4
                    x2, y2 = bx[:, 2].max() + 4, bx[:, 3].max() + 4
                    col_rows.append(
                        f"0 {(x1 + x2) / 2 / page:.6f} {(y1 + y2) / 2 / page:.6f} "
                        f"{(x2 - x1) / page:.6f} {(y2 - y1) / page:.6f}"
                    )
                    # column crop for the recognizer (P19 output schema) —
                    # deferred until after page degradation
                    pending_crops.append(
                        (int(x1), int(y1), int(x2), int(y2), ci, seg, col_chars)
                    )
                    seg += 1
            img = degrade_page(img, rng, strength=degrade)
            for x1, y1, x2, y2, ci, seg, col_chars in pending_crops:
                crop = img.crop((x1, y1, x2, y2))
                cpth = root / "columns" / split / f"p{i}c{ci}s{seg}.png"
                crop.save(cpth)
                uni = " ".join(f"U+{ord(c):04X}" for c in col_chars)
                csv_rows.append(
                    f"{cpth.relative_to(root)},{split}/p{i}.jpg,"
                    f"\"{x1},{y1},{x2},{y2}\",{uni}"
                )
                corpus[split].append("".join(col_chars))
            img.save(root / "char/images" / split / f"p{i}.jpg", quality=92)
            (root / "char/labels" / split / f"p{i}.txt").write_text(
                "\n".join(char_rows)
            )
            img.save(root / "col/images" / split / f"p{i}.jpg", quality=92)
            (root / "col/labels" / split / f"p{i}.txt").write_text(
                "\n".join(col_rows)
            )
            stats["glyphs_per_page"].append(glyphs)
    # standalone train-only column strips: TrOCR trains from scratch here
    # (the reference starts from pretrained VisionEncoderDecoder weights,
    # ``src/models/trocr_model.py``; zero-egress forbids that), so the
    # recognizer needs far more supervised columns than 60 pages yield —
    # v2's ~2k train columns memorized (train acc 0.89, val CER 0.93).
    # Inserted right after the csv header so the ColumnInfoDataset in-file
    # split keeps val/test purely page-derived.
    extra_rows: list[str] = []
    if extra_cols:
        xdir = root / "columns" / "extra"
        xdir.mkdir(parents=True, exist_ok=True)
        for i in range(extra_cols):
            cw = int(rng.integers(15, 22))
            # short columns included deliberately: with 2-7 chars there is
            # almost no text context, so the image is the only signal —
            # they bootstrap cross-attention before the LM shortcut can win
            n_ch = int(rng.integers(2, 36))
            text = [chars[j] for j in mk.line(rng, n_ch)]
            W = cw + 16
            bg = 225 + int(rng.integers(0, 20))
            # generous canvas, crop to content after drawing
            canvas = Image.new("RGB", (W, n_ch * 34 + 24), (bg, bg - 5, bg - 18))
            d = ImageDraw.Draw(canvas)
            y, boxes = 12, []
            for ch in text:
                w = cw + int(rng.integers(-3, 4))
                h = int(w * rng.uniform(0.9, 1.4))
                x = max(0, min(W - w - 1, (W - w) // 2 + int(rng.integers(-3, 4))))
                draw_glyph(d, ch, x, y, w, h, rng)
                boxes.append((x, y, x + w, y + h))
                y += h + int(rng.integers(1, 6))
            bx = np.array(boxes)
            crop = canvas.crop((0, 0, W, min(canvas.height, int(bx[:, 3].max()) + 12)))
            crop = degrade_page(crop, rng, strength=degrade)
            cpth = xdir / f"x{i}.png"
            crop.save(cpth)
            uni = " ".join(f"U+{ord(c):04X}" for c in text)
            extra_rows.append(
                f"{cpth.relative_to(root)},extra,\"0,0,{crop.width},{crop.height}\",{uni}"
            )
            corpus["train"].append("".join(text))
    csv_rows[1:1] = extra_rows

    # column-detector-only extra pages (train split): the column head was
    # the weakest production stage (mAP50 0.89 on 48 train pages) — pages
    # are cheap, so widen its layout/degradation coverage without paying
    # the char-label / crop / corpus cost
    for i in range(col_extra_pages):
        bg = 218 + int(rng.integers(0, 30))
        img = Image.new("RGB", (page, page), (bg, bg - 5, bg - 18))
        d = ImageDraw.Draw(img)
        col_rows = []
        n_cols = int(rng.integers(10, 22))
        xs = np.linspace(0.95, 0.05, n_cols) * page
        for cx in xs:
            cw = int(rng.integers(13, 26))
            y = int(rng.integers(20, 90))
            while y < page - 80:
                seg_end = min(y + int(rng.integers(220, 720)), page - 20)
                col_boxes = []
                seg_text = [chars[j] for j in mk.line(rng, 80)]
                k = 0
                while y < seg_end:
                    w = cw + int(rng.integers(-3, 4))
                    h = int(w * rng.uniform(0.9, 1.4))
                    x = max(0, min(page - w - 1, int(cx - w / 2 + rng.integers(-3, 4))))
                    if y + h > seg_end:
                        break
                    draw_glyph(d, seg_text[k], x, y, w, h, rng)
                    col_boxes.append((x, y, x + w, y + h))
                    y += h + int(rng.integers(1, 6))
                    k += 1
                y += int(rng.integers(40, 130))
                if len(col_boxes) < 2:
                    continue
                bx = np.array(col_boxes)
                x1, y1 = bx[:, 0].min() - 4, bx[:, 1].min() - 4
                x2, y2 = bx[:, 2].max() + 4, bx[:, 3].max() + 4
                col_rows.append(
                    f"0 {(x1 + x2) / 2 / page:.6f} {(y1 + y2) / 2 / page:.6f} "
                    f"{(x2 - x1) / page:.6f} {(y2 - y1) / page:.6f}"
                )
        img = degrade_page(img, rng, strength=degrade)
        img.save(root / "col/images/train" / f"x{i}.jpg", quality=92)
        (root / "col/labels/train" / f"x{i}.txt").write_text("\n".join(col_rows))

    for name in ("char", "col"):
        (root / name / "dataset.yaml").write_text(
            yaml.safe_dump(
                {"path": ".", "train": "images/train", "val": "images/val",
                 "nc": 1, "names": {0: "char" if name == "char" else "column"}}
            )
        )
    # 2x2 15%-overlap tiling of the char set (reference quadrant pipeline,
    # P18): the 640-px detector sees ~736-px tiles of the 1280-px page
    build_tiled_dataset(
        root / "char" / "dataset.yaml", root / "char_tiled", grid=2,
        overlap=0.15,
    )
    (root / "column_info.csv").write_text("\n".join(csv_rows), encoding="utf-8")
    (root / "corpus").mkdir(exist_ok=True)
    for split in ("train", "val"):
        (root / "corpus" / f"{split}.txt").write_text(
            "\n".join(corpus[split]), encoding="utf-8"
        )
    tok.save(root / "tokenizer.json")
    gp = np.array(stats["glyphs_per_page"])
    meta = {
        "pages": int(gp.size),
        "glyphs_per_page_mean": float(gp.mean()),
        "glyphs_per_page_max": int(gp.max()),
        "vocab": len(tok),
        "columns": len(csv_rows) - 1,
        "extra_columns": len(extra_rows),
        "col_extra_pages": col_extra_pages,
        "degrade": degrade,
        "text_model": "markov-bigram",
    }
    (root / "meta.json").write_text(json.dumps(meta, indent=2))
    print(json.dumps(meta))
    return meta


# ------------------------------------------------------------------ train


def train_stage(root: Path, stage: str, **overrides) -> dict:
    """Train one production component on the device."""
    from kuzu.api.model import Model

    root = Path(root)
    results = {}
    if stage in ("col", "all"):
        m = Model("yolov12s", task="detect")
        # columns train at the native 1280 page size: at 640 a ~16 px-wide
        # column becomes 8 px — under-resolved for stride-8 anchors (one
        # anchor column inside) and the detector plateaued at mAP50 0.69.
        # reg_max=32 doubles the DFL extent ceiling: at the default 16,
        # stride-16 anchors cap box height at 2*16*16=512 px and the v2 run
        # systematically truncated taller column segments (pred heights
        # capped ~512, every 500-655 px GT unmatched; mAP50 0.69 plateau)
        results["col"] = dict(
            m.train(
                data=str(root / "col" / "dataset.yaml"),
                imgsz=1280, epochs=int(overrides.get("col_epochs", 40)),
                batch=4, dtype="bfloat16", max_boxes=64, max_det=96,
                reg_max=32, resume=bool(overrides.get("col_resume", 0)),
                project=str(root / "runs"), name="col", exist_ok=True,
                workers=2, cache_images="ram",
            )
        )
    if stage in ("char", "all"):
        m = Model("yolov12-p2x", task="detect")
        results["char"] = dict(
            m.train(
                data=str(root / "char_tiled" / "dataset.yaml"),
                imgsz=640, epochs=int(overrides.get("char_epochs", 60)),
                # remat off: with the flash VJP in the graph the step fits in
                # 11.4 GB and runs 178 vs 231-310 ms/step (r4_step2.py A/B).
                batch=8, dtype="bfloat16", remat=False,
                max_boxes=400, max_det=2000, conf=0.25,
                resume=bool(overrides.get("char_resume", 0)),
                project=str(root / "runs"), name="char", exist_ok=True,
                workers=2, cache_images="ram",
            )
        )
    if stage in ("lm", "all"):
        m = Model("charmlm", task="lm")
        results["lm"] = dict(
            m.train(
                data=str(root / "corpus"),
                tokenizer=str(root / "tokenizer.json"),
                epochs=int(overrides.get("lm_epochs", 30)), batch=64,
                max_length=128, dim=256, depth=6, heads=8, lr0=3e-4,
                optimizer="adamw", dtype="bfloat16",
                project=str(root / "runs"), name="lm", exist_ok=True,
                workers=2,
            )
        )
    if stage == "ctc":
        # alternative recognizer family: CTC CRNN on the SAME columns the AR
        # TrOCR trains on — monotonic image alignment, no text-prior shortcut
        # (reference ocr_lightning path, ``scripts/ocr_model.py:108``)
        m = Model("crnn", task="ctc")
        results["ctc"] = dict(
            m.train(
                data=str(root / "column_info.csv"),
                tokenizer=str(root / "tokenizer.json"),
                imgsz=[1024, 64], epochs=int(overrides.get("ctc_epochs", 30)),
                batch=16, max_label_length=128, dtype="bfloat16",
                optimizer="adamw", lr0=3e-4, warmup_epochs=1.0,
                resume=bool(overrides.get("ctc_resume", 0)),
                project=str(root / "runs"), name="ctc", exist_ok=True,
                workers=2, cache_images="ram",
            )
        )
    if stage in ("rec", "all"):
        m = Model("trocr", task="recognize")
        kw = {}
        lm_run = root / "runs" / "lm" / "lm"
        if lm_run.exists():
            kw["decoder_init"] = str(lm_run)  # pretrained-decoder recipe
        results["rec"] = dict(
            m.train(
                data=str(root / "column_info.csv"),
                tokenizer=str(root / "tokenizer.json"),
                imgsz=[1024, 64], epochs=int(overrides.get("rec_epochs", 60)),
                batch=16, max_label_length=128, dtype="bfloat16",
                # explicit: the YOLO SGD auto-rule stalls from-scratch
                # transformers (v2/v3 plateaued at val CER ~0.9)
                optimizer="adamw", lr0=3e-4, warmup_epochs=1.0,
                # anti-collapse pair (round-3 diagnosis: tf_acc climbs, CER
                # 0.87 — exposure bias + ungrounded cross-attention): joint
                # CTC+attention on the encoder + scheduled sampling
                ctc_weight=float(overrides.get("ctc_weight", 0.3)),
                ss_prob=float(overrides.get("ss_prob", 0.25)),
                # wall-clock budget (hours): BaseTrainer stops after the
                # first epoch that crosses it, keeping best/last checkpoints
                time=float(overrides.get("rec_time_h", 0)) or None,
                resume=bool(overrides.get("rec_resume", 0)),
                project=str(root / "runs"), name="rec", exist_ok=True,
                workers=2, cache_images="ram", **kw,
            )
        )
    print(json.dumps({k: _jsonable(v) for k, v in results.items()}))
    return results


def _jsonable(d):
    return {k: _jsonable_v(v) for k, v in d.items()}


def _jsonable_v(v):
    if isinstance(v, (bool, str)) or v is None:
        return v
    if isinstance(v, (int, float, np.integer, np.floating)):
        return float(v)
    if isinstance(v, dict):
        return _jsonable(v)
    if isinstance(v, (list, tuple)):
        return [_jsonable_v(x) for x in v]
    return str(v)


# ------------------------------------------------------------------ bench


def production_pipeline(
    root: Path,
    decode: str = "greedy",
    dp: int = 0,
    rec: str = "rec",
    col_conf: float = 0.002,
    lm_mode: str = "annotate",
    transport: str = "rgb",
    col_imgsz: int = 0,
):
    """``rec`` picks the recognizer family: ``rec`` = the AR TrOCR run,
    ``ctc`` = the CTC CRNN run trained on the same columns (the cascade
    routes by the run dir's args.yaml task)."""
    from kuzu.pipeline.cascade import KuzushijiPipeline

    root = Path(root)
    rec_dir = (
        root / "runs" / "ctc" / "ctc"
        if rec == "ctc"
        else root / "runs" / "recognize" / "rec"
    )
    return KuzushijiPipeline(
        column_model=root / "runs" / "detect" / "col",
        char_model=root / "runs" / "detect" / "char",
        recognizer=rec_dir,
        lm=root / "runs" / "lm" / "lm",
        tile_grid=2,
        conf=0.25,
        # column stage: low conf + same-region dedup. Swept on the dense
        # val pages (probe_col_match/probe_col_miss, PERFORMANCE.md):
        # conf 0.25 -> 291/334 columns matched + 37 duplicate reads;
        # 0.05 + dedup -> 317/3; 0.002 + dedup -> 331/8 (well-localized
        # columns score as low as 0.002 — dedup handles the junk).
        col_conf=col_conf,
        decode=decode,
        max_det=2000,
        dp=dp,  # multi-chip serving (v5e-8): shard every stage's batch
        lm_mode=lm_mode,
        transport=transport,
        col_imgsz=col_imgsz or None,
    )


def bench(
    root: Path, pages: int = 16, reps: int = 3, dp: int = 0, rec: str = "rec",
    lm_mode: str | None = None, transport: str = "rgb", col_imgsz: int = 0,
) -> dict:
    """Production-configuration cascade pages/s (yolov12x-P2P5 char det with
    2x2 tiling + full-size TrOCR + LM rescoring), on the val pages.
    ``dp=N`` serves every stage sharded over an N-chip mesh. The LM stage
    defaults OFF for greedy recognizers (it cannot change a greedy text —
    measured 0.67 s / 12 pages of pure annotation cost; pass
    lm_mode=annotate to keep the per-column lm_score)."""
    root = Path(root)
    if lm_mode is None:
        lm_mode = "off"  # greedy production decode: annotation only
    pipe = production_pipeline(
        root, dp=int(dp), rec=rec, lm_mode=lm_mode, transport=transport,
        col_imgsz=int(col_imgsz),
    )
    paths = sorted((root / "char/images/val").glob("*.jpg"))[:pages]
    assert paths, "run synth + train first"
    # warmup (compiles)
    pipe.process_pages(paths[:2])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = pipe.process_pages(paths)
        times.append(time.perf_counter() - t0)
    best = min(times)
    n_chars = sum(len(p.get("text", "").replace("\n", "")) for p in out)
    n_det = sum(len(p.get("characters", {}).get("boxes", [])) for p in out)
    res = {
        "pages": len(paths),
        "pages_per_s": len(paths) / best,
        "s_per_page": best / len(paths),
        "chars_read": int(n_chars),
        "chars_detected": int(n_det),
        "decode": pipe.decode,
        "max_det": pipe.max_det,
        "lm_mode": pipe.lm_mode,
    }
    print(json.dumps(res))
    return res


def profile(
    root: Path, pages: int = 16, reps: int = 2, dp: int = 0, rec: str = "rec",
    transport: str = "rgb", col_imgsz: int = 0,
) -> dict:
    """Differential stage timing of the production cascade: re-run
    ``process_pages`` with trailing stages successively disabled and report
    per-stage seconds. Differences of end-to-end timings survive the axon
    tunnel (no ``block_until_ready`` across it) and exercise exactly the
    production code path, so the split is what the user actually pays."""
    root = Path(root)
    pipe = production_pipeline(
        root, dp=int(dp), rec=rec, transport=transport, col_imgsz=int(col_imgsz)
    )
    paths = sorted((root / "char/images/val").glob("*.jpg"))[:pages]
    assert paths, "run synth + train first"

    def timed():
        pipe.process_pages(paths)  # warm the page-count bucket (compiles)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            pipe.process_pages(paths)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_all = timed()
    lm, pipe.lm = pipe.lm, None
    t_nolm = timed()
    rec, pipe.recognizer = pipe.recognizer, None
    t_det = timed()
    char, pipe.char_det = pipe.char_det, None
    t_col = timed()
    pipe.lm, pipe.recognizer, pipe.char_det = lm, rec, char
    res = {
        "pages": len(paths),
        "total_s": t_all,
        "pages_per_s": len(paths) / t_all,
        "column_det_s": t_col,
        "char_det_s": t_det - t_col,
        "recognize_s": t_nolm - t_det,
        "lm_rescore_s": t_all - t_nolm,
    }
    print(json.dumps(res))
    return res


def quality(
    root: Path, rec: str = "rec", col_conf: float = 0.002,
    transport: str = "rgb", col_imgsz: int = 0,
) -> dict:
    """Dense-regime quality: char-detector mAP on full 1280-px val pages
    through the tiled path at max_det=2000, plus recognizer CER on held-out
    columns (the metrics scripts/evaluation.py reports)."""
    import cv2

    from kuzu.core.metrics import DetMetrics, character_error_rate
    from kuzu.data.tokenizer import CharTokenizer

    root = Path(root)
    pipe = production_pipeline(
        root, rec=rec, col_conf=col_conf, transport=transport,
        col_imgsz=int(col_imgsz),
    )
    dm = DetMetrics()
    for pth in sorted((root / "char/images/val").glob("*.jpg")):
        det = pipe.detect_chars(pth)
        lab = np.loadtxt(
            str(root / "char/labels/val" / (pth.stem + ".txt")), ndmin=2
        )
        img = cv2.imread(str(pth))
        h, w = img.shape[:2]
        gt = np.stack(
            [
                (lab[:, 1] - lab[:, 3] / 2) * w,
                (lab[:, 2] - lab[:, 4] / 2) * h,
                (lab[:, 1] + lab[:, 3] / 2) * w,
                (lab[:, 2] + lab[:, 4] / 2) * h,
            ],
            axis=1,
        )
        dm.update(
            det["boxes"], det["scores"], det["classes"],
            np.ones(len(det["boxes"]), bool),
            gt, lab[:, 0], np.ones(len(gt), bool),
        )
    det_m = dm.compute()

    # recognizer CER on the csv's held-out split
    from kuzu.data.ocr_datasets import ColumnInfoDataset

    tok = CharTokenizer.load(root / "tokenizer.json")
    ds = ColumnInfoDataset(
        root / "column_info.csv", tok, split="test", image_size=(1024, 64),
        max_length=128,
    )
    texts = ds.texts()[:64]
    crops = [cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB)
             for p, _ in ds.items[:64]]
    preds = pipe.recognize_crops(crops)
    cer = character_error_rate(preds, texts)
    res = {
        "det_map50": float(det_m["map50"]),
        "det_map": float(det_m["map"]),
        "det_precision": float(np.mean(det_m["precision"])),
        "det_recall": float(np.mean(det_m["recall"])),
        "rec_cer": cer,
        "max_det": 2000,
    }
    if pipe.lm is not None and getattr(pipe, "rec_task", "recognize") != "ctc":
        # does LM n-best reranking actually correct transcripts?
        # (CTC decodes greedily — no beam candidates to rerank)
        pipe.decode = "beam_lm"
        res["rec_cer_beam_lm"] = character_error_rate(
            pipe.recognize_crops(crops), texts
        )
        pipe.decode = "greedy"
    res.update(e2e_page_quality(root, pipe))
    if pipe.lm is not None and getattr(pipe, "rec_task", "recognize") != "ctc":
        # the LM-rescore stage's measured e2e contribution (VERDICT r3-5):
        # full cascade with beam_lm reranking vs the greedy run above
        pipe.decode = "beam_lm"
        res["e2e_cer_beam_lm"] = e2e_page_quality(root, pipe)["e2e_cer"]
        res["e2e_lm_delta_cer"] = res["e2e_cer"] - res["e2e_cer_beam_lm"]
        pipe.decode = "greedy"
    print(json.dumps(res))
    return res


def e2e_page_quality(root: Path, pipe, max_pages: int = 8) -> dict:
    """End-to-end page→text CER — the north-star metric: full cascade on
    val pages, predicted columns matched to GT columns at IoU ≥ 0.5,
    corpus CER = (edits over matched + full deletion cost of missed GT +
    full insertion cost of spurious columns) / total GT chars. Mirrors the
    reference's whole-pipeline evaluation (``scripts/evaluation.py``)."""
    from kuzu.core.metrics import box_iou_np, levenshtein
    from kuzu.data.ocr_datasets import decode_unicode_ids

    root = Path(root)
    gt_by_page: dict[str, list[tuple[np.ndarray, str]]] = {}
    header, *rows = (root / "column_info.csv").read_text(
        encoding="utf-8"
    ).splitlines()
    for r in rows:
        col_img, orig, rest = r.split(",", 2)
        box_s, uni = rest.rsplit(",", 1)
        if not orig.startswith("val/"):
            continue
        box = np.array([float(x) for x in box_s.strip('"').split(",")])
        gt_by_page.setdefault(orig.split("/", 1)[1], []).append(
            (box, decode_unicode_ids(uni))
        )

    pages = sorted(gt_by_page)[:max_pages]
    paths = [root / "col/images/val" / p for p in pages]
    results = pipe.process_pages(paths)
    edits = gt_chars = matched = n_gt = n_spurious = 0
    m_edits = m_chars = miss_chars = spur_chars = 0
    for page, res in zip(pages, results):
        gt = gt_by_page[page]
        gt_boxes = np.stack([b for b, _ in gt])
        pred = res["columns"]
        n_gt += len(gt)
        gt_chars += sum(len(t) for _, t in gt)
        if not pred:
            edits += sum(len(t) for _, t in gt)
            continue
        pb = np.array([c["box"] for c in pred])
        iou = box_iou_np(gt_boxes, pb)  # (G, P)
        used = np.zeros(len(pred), bool)
        taken = np.zeros(len(gt), bool)
        # greedy best-IoU matching
        for _ in range(min(len(gt), len(pred))):
            g, p = np.unravel_index(np.argmax(iou), iou.shape)
            if iou[g, p] < 0.5:
                break
            iou[g, :] = -1
            iou[:, p] = -1
            used[p] = taken[g] = True
            matched += 1
            e = levenshtein(pred[p].get("text", ""), gt[g][1])
            edits += e
            m_edits += e
            m_chars += len(gt[g][1])
        miss = sum(len(t) for (_, t), tk in zip(gt, taken) if not tk)
        edits += miss
        miss_chars += miss
        spurious = [c for c, u in zip(pred, used) if not u]
        n_spurious += len(spurious)
        spur = sum(len(c.get("text", "")) for c in spurious)
        edits += spur
        spur_chars += spur
    return {
        "e2e_cer": edits / max(gt_chars, 1),
        "e2e_columns_matched": matched,
        "e2e_columns_gt": n_gt,
        "e2e_columns_spurious": n_spurious,
        "e2e_pages": len(pages),
        # error budget: where the edits come from (all /gt_chars except
        # matched_cer, which is /matched-gt-chars — recognition quality
        # on *detected* crops, directly comparable to rec_cer on GT crops)
        "e2e_matched_cer": m_edits / max(m_chars, 1),
        "e2e_missed_frac": miss_chars / max(gt_chars, 1),
        "e2e_spurious_frac": spur_chars / max(gt_chars, 1),
    }


def sample(root: Path, out_dir: Path | None = None, rec: str = "rec") -> dict:
    """Run the production cascade on the one real page in the environment
    (``/root/reference/data/examples/sample.jpg``) and persist YAML +
    visualization — the reference's ``scripts/inference.py`` output
    contract (``:120-136``)."""
    root = Path(root)
    out_dir = Path(out_dir or root / "sample_out")
    out_dir.mkdir(parents=True, exist_ok=True)
    if not SAMPLE_PAGE.exists():
        raise FileNotFoundError(SAMPLE_PAGE)
    pipe = production_pipeline(root, rec=rec)
    res = pipe.process_pages([SAMPLE_PAGE])[0]
    pipe.save_result(res, out_dir / "sample.yaml")
    _visualize(SAMPLE_PAGE, res, out_dir / "sample_viz.jpg")
    summary = {
        "columns": int(len(res["columns"])),
        "chars": int(len(res.get("characters", {}).get("boxes", []))),
        "texts": [c.get("text", "") for c in res["columns"][:3]],
        "out": str(out_dir),
    }
    print(json.dumps(summary, ensure_ascii=False))
    return summary


REAL_GT = Path(__file__).resolve().parents[2] / "data/real_page/sample_gt.json"
CHAR_GT = Path(__file__).resolve().parents[2] / "data/real_page/char_gt.json"


def wildcard_cer(ref: str, hyp: str, wildcard: str = "〓") -> float:
    """Levenshtein CER where a wildcard ref char matches ANY one hyp char.

    The round-5 real-page char GT (data/real_page/char_gt.json) marks
    low-confidence hand readings as wildcards; this keeps them in the
    alignment (they still consume a hypothesis char) without charging the
    recognizer for the annotator's uncertainty — a lower-bound CER, with
    the trusted-glyph count reported alongside."""
    g, h = len(ref), len(hyp)
    d = np.zeros((g + 1, h + 1), np.int32)
    d[:, 0] = np.arange(g + 1)
    d[0, :] = np.arange(h + 1)
    for i in range(1, g + 1):
        for j in range(1, h + 1):
            sub = 0 if (ref[i - 1] == wildcard or ref[i - 1] == hyp[j - 1]) else 1
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1, d[i - 1, j - 1] + sub)
    return float(d[g, h]) / max(g, 1)


def _char_level_eval(res: dict, pred: list, pb: np.ndarray) -> dict:
    """Score the cascade's char boxes + read text against the hand-labeled
    char GT columns (reference char-GT semantics:
    ``scripts/data_preprocessing.py:26-330`` — per-column char boxes +
    unicode transcription)."""
    from kuzu.core.metrics import box_iou_np

    cg = json.loads(CHAR_GT.read_text())
    cb = np.asarray(
        res.get("characters", {}).get("boxes", []), np.float32
    ).reshape(-1, 4)
    per_col = {}
    tot = {"gt": 0, "m50": 0, "m25": 0, "pred": 0, "cer_num": 0.0, "ref_len": 0}
    for name, spec in cg["columns"].items():
        col_box = np.array(spec["box"], np.float32)
        gt_glyphs = np.array([gl["box"] for gl in spec["glyphs"]], np.float32)
        pad = 15.0
        if len(cb):
            cx = (cb[:, 0] + cb[:, 2]) / 2
            cy = (cb[:, 1] + cb[:, 3]) / 2
            inside = (
                (cx >= col_box[0] - pad)
                & (cx <= col_box[2] + pad)
                & (cy >= col_box[1] - pad)
                & (cy <= col_box[3] + pad)
            )
            pin = cb[inside]
        else:
            pin = np.zeros((0, 4), np.float32)
        matched, _, _ = greedy_iou_match(gt_glyphs, pin, (0.5, 0.25))
        ref_text = "".join(
            gl["text"] if gl["conf"] != "low" else "〓"
            for gl in spec["glyphs"]
        )
        hyp_text = ""
        if len(pb):
            ious = box_iou_np(col_box[None], pb)[0]
            j = int(np.argmax(ious))
            if ious[j] >= 0.25:
                hyp_text = pred[j].get("text", "")
        cer = wildcard_cer(ref_text, hyp_text)
        per_col[name] = {
            "gt_glyphs": int(len(gt_glyphs)),
            "pred_in_col": int(len(pin)),
            "char_recall@0.5": matched[0.5] / max(len(gt_glyphs), 1),
            "char_recall@0.25": matched[0.25] / max(len(gt_glyphs), 1),
            "char_precision@0.5": matched[0.5] / max(len(pin), 1),
            "trusted_glyphs": sum(
                1 for gl in spec["glyphs"] if gl["conf"] != "low"
            ),
            "cer_wildcard": round(cer, 4),
            "hyp_len": len(hyp_text),
        }
        tot["gt"] += len(gt_glyphs)
        tot["m50"] += matched[0.5]
        tot["m25"] += matched[0.25]
        tot["pred"] += len(pin)
        tot["cer_num"] += cer * len(ref_text)
        tot["ref_len"] += len(ref_text)
    per_col["overall"] = {
        "char_recall@0.5": tot["m50"] / max(tot["gt"], 1),
        "char_recall@0.25": tot["m25"] / max(tot["gt"], 1),
        "char_precision@0.5": tot["m50"] / max(tot["pred"], 1),
        "cer_wildcard": round(tot["cer_num"] / max(tot["ref_len"], 1), 4),
        "gt_glyphs": tot["gt"],
    }
    return per_col


def greedy_iou_match(
    gt_boxes: np.ndarray,  # (G, 4) xyxy
    pred_boxes: np.ndarray,  # (P, 4) xyxy
    thresholds: tuple[float, ...] = (0.5, 0.25),
) -> tuple[dict, np.ndarray, np.ndarray]:
    """Greedy one-to-one IoU matching (reference semantics:
    ``engine/validator.py:222`` — globally-best pair first, each GT and
    each prediction consumed at most once per threshold).

    Returns (matched counts per threshold, used mask for predictions at
    thresholds[0], best-IoU per GT)."""
    from kuzu.core.metrics import box_iou_np

    matched = {float(t): 0 for t in thresholds}
    used = np.zeros(len(pred_boxes), bool)
    per_gt = np.zeros(len(gt_boxes), np.float32)
    if len(pred_boxes) and len(gt_boxes):
        iou = box_iou_np(
            np.asarray(gt_boxes, np.float32), np.asarray(pred_boxes, np.float32)
        )  # (G, P)
        per_gt = iou.max(axis=1)
        for thr in thresholds:
            m = iou.copy()
            for _ in range(min(len(gt_boxes), len(pred_boxes))):
                g, p = np.unravel_index(np.argmax(m), m.shape)
                if m[g, p] < thr:
                    break
                m[g, :] = -1
                m[:, p] = -1
                matched[float(thr)] += 1
                if thr == thresholds[0]:
                    used[p] = True
    return matched, used, per_gt


def real(root: Path, rec: str = "rec", out_dir: Path | None = None) -> dict:
    """First REAL-kuzushiji quality numbers (round-4 VERDICT item 4): run
    the cascade's column stage on the hand-labeled sample page
    (``data/real_page/sample_gt.json`` — 8 columns + title, labeled with
    the methodology recorded there) and score column detection against it.
    The reference's entire purpose is real kuzushiji
    (``scripts/data_loader.py:16``); this is the one labeled real page in
    the environment."""
    root = Path(root)
    gt_spec = json.loads(REAL_GT.read_text())
    gt_boxes = np.array(list(gt_spec["columns"].values()), np.float32)
    gt_names = list(gt_spec["columns"])
    pipe = production_pipeline(root, rec=rec)
    res = pipe.process_pages([SAMPLE_PAGE])[0]
    pred = res["columns"]
    out = {"gt_columns": len(gt_boxes), "pred_columns": len(pred)}
    pb = np.array([c["box"] for c in pred], np.float32).reshape(-1, 4)
    matched, used, best = greedy_iou_match(gt_boxes, pb, (0.5, 0.25))
    per_gt = {n: float(best[i]) for i, n in enumerate(gt_names)} if pred else {}
    out.update(
        {
            "col_recall@0.5": matched[0.5] / len(gt_boxes),
            "col_recall@0.25": matched[0.25] / len(gt_boxes),
            "col_precision@0.5": matched[0.5] / max(len(pred), 1),
            "spurious": int(len(pred) - matched[0.5]),
            "per_gt_best_iou": per_gt,
            "chars_detected": int(
                len(res.get("characters", {}).get("boxes", []))
            ),
            "chars_read": sum(len(c.get("text", "")) for c in pred),
        }
    )
    if CHAR_GT.exists():
        out["char_level"] = _char_level_eval(res, pred, pb)
    out_dir = Path(out_dir or root / "real_out")
    out_dir.mkdir(parents=True, exist_ok=True)
    import cv2

    img = cv2.imread(str(SAMPLE_PAGE))
    for b in gt_boxes.astype(int):
        cv2.rectangle(img, (b[0], b[1]), (b[2], b[3]), (255, 0, 0), 6)
    for c, u in zip(pred, used):
        x1, y1, x2, y2 = (int(v) for v in c["box"])
        cv2.rectangle(img, (x1, y1), (x2, y2), (0, 160, 0) if u else (0, 0, 220), 4)
    if CHAR_GT.exists():
        cg = json.loads(CHAR_GT.read_text())
        for spec in cg["columns"].values():
            for gl in spec["glyphs"]:
                b = [int(v) for v in gl["box"]]
                cv2.rectangle(img, (b[0], b[1]), (b[2], b[3]), (255, 160, 0), 2)
        for b in np.asarray(
            res.get("characters", {}).get("boxes", []), np.float32
        ).reshape(-1, 4).astype(int):
            cv2.rectangle(img, (b[0], b[1]), (b[2], b[3]), (0, 0, 220), 1)
    cv2.imwrite(str(out_dir / "real_eval.jpg"), img)
    (out_dir / "real_eval.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))
    return out


def _visualize(page_path: Path, res: dict, out: Path) -> None:
    import cv2

    img = cv2.imread(str(page_path))
    for col in res["columns"]:
        x1, y1, x2, y2 = (int(v) for v in col["box"])
        cv2.rectangle(img, (x1, y1), (x2, y2), (0, 160, 0), 3)
    for box in res.get("characters", {}).get("boxes", []):
        x1, y1, x2, y2 = (int(v) for v in box)
        cv2.rectangle(img, (x1, y1), (x2, y2), (0, 0, 220), 1)
    cv2.imwrite(str(out), img)


# ----------------------------------------------------------------- driver


def _kv(args):
    out = {}
    for a in args:
        k, _, v = a.partition("=")
        try:
            out[k] = json.loads(v)
        except json.JSONDecodeError:
            out[k] = v
    return out


def main(argv=None):
    from kuzu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return
    cmd, kv = argv[0], _kv(argv[1:])
    root = Path(kv.pop("root", "runs/production"))
    if cmd == "synth":
        summary = synth_dense_pages(root, **kv)
    elif cmd == "train":
        summary = train_stage(root, str(kv.pop("stage", "all")), **kv)
    elif cmd == "bench":
        summary = bench(root, **kv)
    elif cmd == "profile":
        summary = profile(root, **kv)
    elif cmd == "quality":
        summary = quality(root, **kv)
    elif cmd == "sample":
        summary = sample(root, kv.pop("out", None), **kv)
    elif cmd == "real":
        summary = real(root, **kv)
    else:
        raise SystemExit(f"unknown command {cmd}")
    # Durable ledger: chain logs and checkpoints live in the untracked
    # runs/ tree, which dies with the container (it happened mid-round-4).
    # Every stage summary also lands in the git-tracked results/ ledger so
    # measured numbers survive host recycling even when weights don't.
    try:
        import os

        ledger_dir = os.environ.get("KUZU_RESULTS_DIR") or str(
            Path(__file__).resolve().parents[2] / "results"
        )
        ledger = Path(ledger_dir) / "production.jsonl"
        ledger.parent.mkdir(parents=True, exist_ok=True)
        row = {"cmd": cmd, "root": str(root), "ts": time.time()}
        row.update({k: _jsonable_v(v) for k, v in (summary or {}).items()})
        with ledger.open("a", encoding="utf-8") as f:
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
    except Exception as e:  # noqa: BLE001 — the ledger must never break a stage
        print(f"[ledger] skipped: {type(e).__name__}: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
