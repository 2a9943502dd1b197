"""Full-cascade integration: page -> column detect -> crop -> recognize -> LM.

The flagship pipeline (reference ``scripts/inference.py``) driven end-to-end
with tiny models trained on synthetic pages in this test module.
"""

import numpy as np
import pytest
import yaml
from PIL import Image, ImageDraw

CHAR_COLORS = {"a": (0, 0, 0), "b": (180, 0, 0), "c": (0, 0, 180)}
COLUMN_TEXTS = [["abc", "bca"], ["cab", "acb"]]


def _page(texts, size=192):
    """A page with one dark vertical column per text, right to left."""
    img = Image.new("RGB", (size, size), (250, 247, 240))
    d = ImageDraw.Draw(img)
    cols = []
    for ci, text in enumerate(texts):
        x = size - 60 - ci * 80  # right to left
        y0, col_h = 10, 20 + len(text) * 45
        d.rectangle([x - 4, y0 - 4, x + 36, y0 + col_h], outline=(120, 120, 110), width=2)
        for j, ch in enumerate(text):
            d.rectangle([x, y0 + 6 + j * 45, x + 32, y0 + 40 + j * 45],
                        fill=CHAR_COLORS[ch])
        cols.append((x - 4, y0 - 4, x + 36, y0 + col_h))
    return img, cols


@pytest.fixture(scope="module")
def pipeline_runs(tmp_path_factory):
    root = tmp_path_factory.mktemp("cascade")
    # -------- column detection dataset (pages with column boxes)
    for split, n in (("train", 12), ("val", 4)):
        (root / "det/images" / split).mkdir(parents=True)
        (root / "det/labels" / split).mkdir(parents=True)
        rng = np.random.default_rng(0 if split == "train" else 1)
        for i in range(n):
            texts = COLUMN_TEXTS[i % 2]
            img, cols = _page(texts)
            img.save(root / "det/images" / split / f"{i}.jpg")
            lines = []
            for x1, y1, x2, y2 in cols:
                lines.append(
                    f"0 {(x1+x2)/2/192:.5f} {(y1+y2)/2/192:.5f} "
                    f"{(x2-x1)/192:.5f} {(y2-y1)/192:.5f}"
                )
            (root / "det/labels" / split / f"{i}.txt").write_text("\n".join(lines))
    (root / "det/dataset.yaml").write_text(
        yaml.safe_dump({"path": ".", "train": "images/train", "val": "images/val",
                        "names": {0: "column"}, "nc": 1})
    )
    # -------- recognizer dataset (column crops -> text)
    all_texts = [t for pair in COLUMN_TEXTS for t in pair]
    for split, reps in (("train", 6), ("val", 1)):
        for sub in ("images", "labels"):
            (root / "ocr" / split / sub / "b").mkdir(parents=True)
        k = 0
        for _ in range(reps):
            for t in all_texts:
                img = Image.new("RGB", (40, 160), (250, 247, 240))
                d = ImageDraw.Draw(img)
                for j, ch in enumerate(t):
                    d.rectangle([4, 10 + j * 45, 36, 44 + j * 45], fill=CHAR_COLORS[ch])
                img.save(root / "ocr" / split / "images" / "b" / f"{k}.png")
                (root / "ocr" / split / "labels" / "b" / f"{k}.txt").write_text(t)
                k += 1
    # -------- LM corpus
    (root / "lm").mkdir()
    (root / "lm/train.txt").write_text("\n".join(all_texts * 6))

    from kuzu.core.config import load_config
    from kuzu.tasks.detect import DetectTrainer
    from kuzu.tasks.lm import LMTrainer
    from kuzu.tasks.recognize import RecognizeTrainer

    det_cfg = load_config(overrides=dict(
        task="detect", model="yolov12n", data=str(root / "det/dataset.yaml"),
        epochs=2, batch=4, imgsz=96, max_boxes=8, workers=0, dtype="float32",
        mosaic=0.0, close_mosaic=0, optimizer="adamw", lr0=0.002,
        warmup_epochs=0.0, project=str(root / "runs"), name="det",
        exist_ok=True, val_batches=1,
    ))
    det_trainer = DetectTrainer(det_cfg)
    det_trainer.train()

    rec_cfg = load_config(overrides=dict(
        task="recognize", data=str(root / "ocr"), epochs=2, batch=6,
        imgsz=[160, 40], patch=8, enc_dim=32, enc_depth=1, enc_heads=2,
        dec_dim=32, dec_depth=1, dec_heads=2, max_label_length=8,
        optimizer="adamw", lr0=0.002, warmup_epochs=0.0, workers=0,
        dtype="float32", project=str(root / "runs"), name="rec", exist_ok=True,
    ))
    rec_trainer = RecognizeTrainer(rec_cfg)
    rec_trainer.train()

    lm_cfg = load_config(overrides=dict(
        task="lm", data=str(root / "lm"), epochs=1, batch=8, max_length=8,
        dim=32, depth=1, heads=2, optimizer="adamw", warmup_epochs=0.0,
        workers=0, dtype="float32", project=str(root / "runs"), name="lm",
        exist_ok=True,
    ))
    LMTrainer(lm_cfg).train()

    page, cols = _page(COLUMN_TEXTS[0])
    page_path = root / "test_page.jpg"
    page.save(page_path)
    return {
        "det": det_trainer.save_dir,
        "rec": rec_trainer.save_dir,
        "lm": root / "runs/lm/lm",
        "page": page_path,
        "gt_cols": cols,
    }


def test_cascade_end_to_end(pipeline_runs):
    from kuzu.pipeline.cascade import KuzushijiPipeline

    pipe = KuzushijiPipeline(
        column_model=pipeline_runs["det"],
        recognizer=pipeline_runs["rec"],
        lm=pipeline_runs["lm"],
        conf=0.001,
    )
    result = pipe.process_page(pipeline_runs["page"])
    assert result["image"].endswith("test_page.jpg")
    assert isinstance(result["columns"], list)
    # every detected column has a text and an LM score
    for col in result["columns"]:
        assert "box" in col and "score" in col
        assert "text" in col
        if result["columns"]:
            assert "lm_score" in col
    assert "text" in result
    # save + reload yaml roundtrip
    out = pipeline_runs["page"].parent / "result.yaml"
    pipe.save_result(result, out)
    import yaml as _yaml

    back = _yaml.safe_load(out.read_text())
    assert back["image"] == result["image"]


def test_cascade_tiled_detection(pipeline_runs):
    from kuzu.pipeline.cascade import KuzushijiPipeline

    # tiling applies to the *character* stage (columns are page-scale and
    # always detect full-page — tiling would fragment them)
    pipe = KuzushijiPipeline(
        char_model=pipeline_runs["det"], conf=0.001, tile_grid=2
    )
    dets = pipe.detect_chars(pipeline_runs["page"])
    assert dets["boxes"].shape[1] == 4
    # merged page-frame boxes stay within the page
    if len(dets["boxes"]):
        assert (dets["boxes"] >= -1).all() and (dets["boxes"] <= 193).all()


def test_cascade_column_ordering():
    from kuzu.pipeline.cascade import sort_columns_right_to_left

    boxes = np.array([[10.0, 0, 40, 100], [150, 0, 180, 100], [80, 0, 110, 100]])
    order = sort_columns_right_to_left(boxes)
    np.testing.assert_array_equal(order, [1, 2, 0])


def test_column_dedup_suppresses_same_region():
    """A partial-height duplicate of a tall column survives box-IoU NMS
    (corner IoU ~0.4) but must not be read twice; distinct vertical
    segments of the same x-band must BOTH survive (union-merge would
    destroy them — measured on the production val pages)."""
    from kuzu.pipeline.cascade import dedup_columns

    boxes = np.array(
        [
            [100.0, 0, 140, 400],  # tall column, high conf
            [102.0, 20, 141, 180],  # partial-height duplicate -> dropped
            [100.0, 420, 140, 600],  # separate lower segment -> kept
            [300.0, 0, 340, 400],  # different column -> kept
        ]
    )
    scores = np.array([0.9, 0.3, 0.8, 0.7])
    keep = dedup_columns(boxes, scores)
    np.testing.assert_array_equal(keep, [0, 2, 3])
    # score order decides the survivor: flip confidences and the partial
    # box wins over the tall one
    keep2 = dedup_columns(boxes, np.array([0.2, 0.9, 0.8, 0.7]))
    assert 1 in keep2 and 0 not in keep2


def test_refine_columns_by_chars():
    """A partial-height column box snaps to its full char segment; the
    snap stops at the inter-segment gap; unsupported columns drop; two
    partials over one segment collapse to the same box (then dedup)."""
    from kuzu.pipeline.cascade import dedup_columns, refine_columns_by_chars

    seg1 = [(100.0, y, 130.0, y + 20) for y in range(10, 200, 24)]
    seg2 = [(100.0, y, 130.0, y + 20) for y in range(290, 432, 24)]
    chars = np.array(seg1 + seg2)
    cols = np.array(
        [
            [98.0, 5, 132, 120],  # partial over segment 1
            [98.0, 285, 132, 430],  # covers segment 2
            [300.0, 10, 340, 200],  # no char support
            [98.0, 90, 132, 200],  # second partial over segment 1
        ]
    )
    ref, keep = refine_columns_by_chars(cols, chars)
    assert keep.tolist() == [True, True, False, True]
    np.testing.assert_allclose(ref[0], [96, 6, 134, 202])  # full segment 1
    assert ref[0][3] < 285  # does not cross the inter-segment gap
    np.testing.assert_allclose(ref[1], [96, 286, 134, 434])
    np.testing.assert_allclose(ref[3], ref[0])  # same segment, same box
    k = dedup_columns(ref[keep], np.array([0.9, 0.8, 0.3]))
    assert len(k) == 2  # the collapsed duplicate is suppressed


def test_columns_from_orphan_chars():
    """Char segments outside every kept column become columns (score =
    mean char score); chars already claimed, lone chars, and neighbours in
    a different x-band stay out."""
    from kuzu.pipeline.cascade import columns_from_orphan_chars

    claimed = [(100.0, y, 130.0, y + 20) for y in range(10, 200, 24)]
    missed = [(200.0, y, 228.0, y + 20) for y in range(10, 150, 24)]
    lone = [(300.0, 10, 330.0, 30)]  # min_chars=2 filters it
    chars = np.array(claimed + missed + lone)
    scores = np.concatenate(
        [np.full(len(claimed), 0.9), np.full(len(missed), 0.8), [0.7]]
    )
    cols = np.array([[96.0, 6, 134, 202]])  # claims the first band only
    ob, osc = columns_from_orphan_chars(chars, scores, cols)
    assert ob.shape == (1, 4)
    # covers the missed band's char union +-4
    np.testing.assert_allclose(ob[0], [196, 6, 232, 154])
    np.testing.assert_allclose(osc, [0.8])
    # nothing orphaned -> empty
    ob2, _ = columns_from_orphan_chars(
        np.array(claimed), np.full(len(claimed), 0.9), cols
    )
    assert len(ob2) == 0


def test_pipeline_dedup_wired(pipeline_runs):
    """col_dedup drops duplicate column reads end-to-end: with dedup off a
    conf-0.001 detector emits overlapping boxes; on, every surviving pair
    fails the same-region rule."""
    from kuzu.pipeline.cascade import KuzushijiPipeline, dedup_columns

    pipe = KuzushijiPipeline(
        column_model=pipeline_runs["det"], conf=0.001, col_dedup=True
    )
    det = pipe.detect_columns(pipeline_runs["page"])
    n = len(det["boxes"])
    if n > 1:
        keep = dedup_columns(np.asarray(det["boxes"]), np.asarray(det["scores"]))
        assert len(keep) == n  # already deduped -> idempotent
    off = KuzushijiPipeline(
        column_model=pipeline_runs["det"], conf=0.001, col_dedup=False
    )
    det_off = off.detect_columns(pipeline_runs["page"])
    assert len(det_off["boxes"]) >= n


def test_process_page_tiled_equals_batched(pipeline_runs):
    """With tile_grid>1 the single-page API routes through the batched
    production path (refinement + orphan recovery included)."""
    from kuzu.pipeline.cascade import KuzushijiPipeline

    pipe = KuzushijiPipeline(
        column_model=pipeline_runs["det"],
        char_model=pipeline_runs["det"],
        recognizer=pipeline_runs["rec"],
        conf=0.001,
        tile_grid=2,
    )
    single = pipe.process_page(pipeline_runs["page"])
    batched = pipe.process_pages([pipeline_runs["page"]])[0]
    assert single.get("text") == batched.get("text")
    assert len(single["columns"]) == len(batched["columns"])
    for a, b in zip(single["columns"], batched["columns"]):
        np.testing.assert_allclose(a["box"], b["box"])


def test_cascade_batched_pages(pipeline_runs, tmp_path):
    from kuzu.pipeline.cascade import KuzushijiPipeline

    pipe = KuzushijiPipeline(
        column_model=pipeline_runs["det"],
        recognizer=pipeline_runs["rec"],
        conf=0.001,
    )
    pages = [pipeline_runs["page"]] * 3
    out = pipe.process_pages(pages)
    assert len(out) == 3
    for r in out:
        assert "columns" in r and "text" in r
        for col in r["columns"]:
            assert "text" in col
    # batched and single-page paths agree on structure and texts
    single = pipe.process_page(pages[0])
    assert [c["text"] for c in out[0]["columns"]] == [
        c["text"] for c in single["columns"]
    ]


def test_per_column_char_detection(pipeline_runs):
    """Reference-shaped cascade: char detection INSIDE each column crop with
    coords mapped back to the page frame (scripts/inference.py:94-118)."""
    from kuzu.pipeline.cascade import KuzushijiPipeline

    pipe = KuzushijiPipeline(
        column_model=pipeline_runs["det"],
        char_model=pipeline_runs["det"],  # stand-in detector for structure
        conf=0.001,
    )
    result = pipe.process_page(pipeline_runs["page"])
    assert "characters" in result
    assert result["columns"], "no columns detected"
    for col in result["columns"]:
        assert "chars" in col
        boxes = np.asarray(col["chars"]["boxes"], np.float32).reshape(-1, 4)
        # mapped back into the page frame
        assert (boxes >= -1).all() and (boxes[:, [0, 2]] <= 193).all()
        assert (boxes[:, [1, 3]] <= 193).all()
        # reading order: top -> bottom within the column
        centers = (boxes[:, 1] + boxes[:, 3]) / 2
        assert (np.diff(centers) >= -1e-3).all()


def test_batched_rescoring_matches_naive(pipeline_runs):
    """The one-jit batched PLL must equal the per-text masked loop."""
    import jax.numpy as jnp
    import optax

    from kuzu.pipeline.cascade import KuzushijiPipeline

    pipe = KuzushijiPipeline(lm=pipeline_runs["lm"])
    texts = ["abc", "bca", "ab"]
    got = pipe.rescore_texts(texts)
    assert len(got) == len(texts)

    tok = pipe.lm.tokenizer
    for t, g in zip(texts, got):
        ids = tok.encode(t, max_length=pipe.lm.max_len)
        n = int((ids != tok.pad_id).sum())
        if n <= 2:
            assert g == 0.0
            continue
        pos = np.arange(1, n - 1)
        batch = np.tile(ids, (len(pos), 1))
        batch[np.arange(len(pos)), pos] = tok.mask_id
        logits = pipe.lm.model.apply(
            {"params": pipe.lm.params},
            jnp.asarray(batch),
            jnp.asarray((batch != tok.pad_id).astype(np.float32)),
        )
        lp = -optax.softmax_cross_entropy_with_integer_labels(
            logits[np.arange(len(pos)), pos], jnp.asarray(ids[pos])
        )
        expect = float(np.asarray(lp).mean())
        assert abs(g - expect) < 1e-3, (t, g, expect)


def test_cascade_beam_decode(pipeline_runs):
    """decode='beam' flows through the cascade's recognize path."""
    from kuzu.pipeline.cascade import KuzushijiPipeline

    greedy = KuzushijiPipeline(
        column_model=pipeline_runs["det"],
        recognizer=pipeline_runs["rec"],
        conf=0.001,
    )
    beam = KuzushijiPipeline(
        column_model=pipeline_runs["det"],
        recognizer=pipeline_runs["rec"],
        conf=0.001,
        decode="beam",
        num_beams=2,
    )
    rg = greedy.process_page(pipeline_runs["page"])
    rb = beam.process_page(pipeline_runs["page"])
    assert len(rb["columns"]) == len(rg["columns"])
    for col in rb["columns"]:
        assert isinstance(col.get("text", ""), str)


def test_batched_tiled_pages(pipeline_runs):
    """The production multi-page path (tile_grid>1): every stage batched —
    full-page column detect, ONE forward over all pages' tiles for chars
    (merged per page, max_det pass-through), batched recognize."""
    from kuzu.pipeline.cascade import KuzushijiPipeline

    pipe = KuzushijiPipeline(
        column_model=pipeline_runs["det"],
        char_model=pipeline_runs["det"],  # stands in as a char detector
        recognizer=pipeline_runs["rec"],
        conf=0.001,
        tile_grid=2,
        max_det=2000,
    )
    pages = [pipeline_runs["page"]] * 3
    out = pipe.process_pages(pages)
    assert len(out) == 3
    for r in out:
        assert "columns" in r and "characters" in r and "text" in r
        assert len(r["characters"]["boxes"]) <= 2000
        for col in r["columns"]:
            assert "text" in col and "chars" in col
    # merged page-frame char boxes stay inside the page
    b = np.asarray(out[0]["characters"]["boxes"])
    if len(b):
        assert (b >= 0).all() and (b[:, [0, 2]] <= 192).all()


def test_ship_once_matches_host_path(pipeline_runs):
    """Round-4 ship-once transport: the device-derived letterbox/tiles/
    crops path produces the same columns, texts, and char boxes as the
    host path (equal-shape pages; resize kernels differ only in rounding,
    and the toy models are far from decision boundaries)."""
    from kuzu.pipeline.cascade import KuzushijiPipeline

    kw = dict(
        column_model=pipeline_runs["det"],
        char_model=pipeline_runs["det"],
        recognizer=pipeline_runs["rec"],
        conf=0.001,
        tile_grid=2,
        max_det=2000,
    )
    pages = [pipeline_runs["page"]] * 2
    fast = KuzushijiPipeline(**kw, ship_once=True).process_pages(pages)
    host = KuzushijiPipeline(**kw, ship_once=False).process_pages(pages)
    assert len(fast) == len(host) == 2
    for f, h in zip(fast, host):
        assert len(f["columns"]) == len(h["columns"])
        assert [c["text"] for c in f["columns"]] == [
            c["text"] for c in h["columns"]
        ]
        fb = np.asarray(f["characters"]["boxes"])
        hb = np.asarray(h["characters"]["boxes"])
        assert fb.shape == hb.shape
        if len(fb):
            assert np.abs(fb - hb).max() < 2.0
        for fc, hc in zip(f["columns"], h["columns"]):
            assert np.abs(
                np.asarray(fc["box"]) - np.asarray(hc["box"])
            ).max() < 2.0


def test_yc_transport_and_col_imgsz_e2e(pipeline_runs):
    """Round-4 transport flags through the full ship-once path:
    `transport='yc'` (chroma-subsampled tunnel bytes, reconstructed on
    device) must reproduce the RGB path's columns and texts on the toy
    page, and `col_imgsz` must run column detection at a non-train
    letterbox size and still return page-frame boxes."""
    from kuzu.pipeline.cascade import KuzushijiPipeline

    kw = dict(
        column_model=pipeline_runs["det"],
        char_model=pipeline_runs["det"],
        recognizer=pipeline_runs["rec"],
        conf=0.001,
        tile_grid=2,
        max_det=2000,
        ship_once=True,
    )
    pages = [pipeline_runs["page"]] * 2
    rgb = KuzushijiPipeline(**kw).process_pages(pages)
    yc = KuzushijiPipeline(**kw, transport="yc").process_pages(pages)
    assert len(yc) == len(rgb) == 2
    for a, b in zip(yc, rgb):
        assert len(a["columns"]) == len(b["columns"]) > 0
        assert [c["text"] for c in a["columns"]] == [
            c["text"] for c in b["columns"]
        ]
        for ca, cb in zip(a["columns"], b["columns"]):
            assert np.abs(
                np.asarray(ca["box"]) - np.asarray(cb["box"])
            ).max() < 3.0

    # non-train column letterbox size: lowers cleanly, boxes in page frame
    small = KuzushijiPipeline(**kw, col_imgsz=128).process_pages(pages)
    for r in small:
        assert len(r["columns"]) > 0
        for col in r["columns"]:
            x1, y1, x2, y2 = col["box"]
            assert 0 <= x1 < x2 <= 192 and 0 <= y1 < y2 <= 192


def test_beam_lm_rescoring_decodes(pipeline_runs):
    """decode='beam_lm': beam n-best reranked by the char-LM PLL picks a
    transcript per crop (reference P25 rerank recipe); output count and
    type match greedy, and candidates come from the beam set."""
    import cv2

    from kuzu.pipeline.cascade import KuzushijiPipeline

    pipe = KuzushijiPipeline(
        recognizer=pipeline_runs["rec"],
        lm=pipeline_runs["lm"],
        decode="beam_lm",
        num_beams=2,
    )
    img = cv2.cvtColor(cv2.imread(str(pipeline_runs["page"])), cv2.COLOR_BGR2RGB)
    crops = [img[10:150, 20:60], img[10:150, 90:130]]
    texts = pipe.recognize_crops(crops)
    assert len(texts) == 2 and all(isinstance(t, str) for t in texts)

    # no LM configured -> clear error
    bare = KuzushijiPipeline(recognizer=pipeline_runs["rec"], decode="beam_lm")
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="needs an LM"):
        bare.recognize_crops(crops)


def test_cascade_with_ctc_recognizer(pipeline_runs, tmp_path):
    """Pluggable recognizer family: a CTC CRNN run dir drops into the
    cascade in place of the AR TrOCR run (routed by the run's args.yaml)."""
    from kuzu.core.config import load_config
    from kuzu.pipeline.cascade import KuzushijiPipeline
    from kuzu.tasks.ctc import CTCTrainer

    root = pipeline_runs["rec"].parent.parent.parent  # cascade tmp root
    ctc_cfg = load_config(overrides=dict(
        task="ctc", data=str(root / "ocr"), epochs=2, batch=6,
        imgsz=[160, 40], lstm_hidden=32, max_label_length=8,
        optimizer="adamw", lr0=0.002, warmup_epochs=0.0, workers=0,
        dtype="float32", project=str(tmp_path / "runs"), name="ctc",
        exist_ok=True,
    ))
    trainer = CTCTrainer(ctc_cfg)
    trainer.train()

    pipe = KuzushijiPipeline(
        column_model=pipeline_runs["det"],
        recognizer=trainer.save_dir,
        conf=0.001,
    )
    assert pipe.rec_task == "ctc"
    res = pipe.process_page(pipeline_runs["page"])
    assert len(res["columns"]) >= 1
    assert all(isinstance(c.get("text", ""), str) for c in res["columns"])

    import pytest as _pytest

    pipe.decode = "beam_lm"
    with _pytest.raises(ValueError, match="beam_lm"):
        pipe.recognize_crops([np.full((60, 20, 3), 200, np.uint8)])
