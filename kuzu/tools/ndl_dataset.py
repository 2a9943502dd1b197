"""NDL "minna-de-honkoku" dataset tooling.

Capability parity with the vendored ``ndl-minhon-ocrdataset`` (P36):
- ``crop_oneline_dataset``: page images + per-page JSON annotations (list of
  {boundingBox: 4 corner points, text}) -> per-book one-line crops + label
  txts in the layout ``kuzu.data.ocr_datasets.OneLineDataset`` reads
  (reference ``makeonelinedataset{,_multi}.py``);
- ``download_iiif_images``: IIIF image fetcher driven by a metadata CSV
  (reference ``imgdownloader.py``) — gated: raises a clear error in
  zero-egress environments instead of hanging.
"""

from __future__ import annotations

import json
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path


def _quad_to_xyxy(quad: list) -> tuple[int, int, int, int]:
    xs = [p[0] for p in quad]
    ys = [p[1] for p in quad]
    return int(min(xs)), int(min(ys)), int(max(xs)), int(max(ys))


def crop_oneline_dataset(
    img_root: str | Path,
    ann_root: str | Path,
    out_root: str | Path,
    split: str = "train",
    min_size: int = 4,
    workers: int = 4,
) -> int:
    """img_root/{book}/*.jpg + ann_root/{book}/*.json -> one-line layout.

    Output: out_root/{split}/{images,labels}/{book}/{page}_{i}.{png,txt}.
    Returns the number of line crops written.
    """
    import cv2

    img_root, ann_root, out_root = Path(img_root), Path(ann_root), Path(out_root)
    jobs = []
    for book_dir in sorted(p for p in img_root.iterdir() if p.is_dir()):
        book = book_dir.name
        for img_path in sorted(book_dir.glob("*.jpg")) + sorted(
            book_dir.glob("*.png")
        ):
            ann = ann_root / book / (img_path.stem + ".json")
            if ann.exists():
                jobs.append((book, img_path, ann))

    img_out = out_root / split / "images"
    lbl_out = out_root / split / "labels"

    def work(job) -> int:
        book, img_path, ann_path = job
        img = cv2.imread(str(img_path))
        if img is None:
            return 0
        h, w = img.shape[:2]
        try:
            words = json.loads(ann_path.read_text(encoding="utf-8"))
        except (json.JSONDecodeError, UnicodeDecodeError):
            return 0
        (img_out / book).mkdir(parents=True, exist_ok=True)
        (lbl_out / book).mkdir(parents=True, exist_ok=True)
        n = 0
        for i, word in enumerate(words):
            quad = word.get("boundingBox")
            text = (word.get("text") or "").strip()
            if not quad or not text:
                continue
            x1, y1, x2, y2 = _quad_to_xyxy(quad)
            x1, y1 = max(x1, 0), max(y1, 0)
            x2, y2 = min(x2, w), min(y2, h)
            if x2 - x1 < min_size or y2 - y1 < min_size:
                continue
            crop = img[y1:y2, x1:x2]
            stem = f"{img_path.stem}_{i:03d}"
            cv2.imwrite(str(img_out / book / f"{stem}.png"), crop)
            (lbl_out / book / f"{stem}.txt").write_text(text, encoding="utf-8")
            n += 1
        return n

    with ThreadPoolExecutor(workers) as pool:
        return sum(pool.map(work, jobs))


def download_iiif_images(
    metadata_csv: str | Path,
    out_root: str | Path,
    size: str = "full",
    timeout: float = 30.0,
    workers: int = 4,
) -> int:
    """Fetch page images from IIIF endpoints listed in a metadata CSV with
    columns (book, page, url). Network-gated."""
    import urllib.error
    import urllib.request

    import pandas as pd

    df = pd.read_csv(metadata_csv)
    out_root = Path(out_root)

    def fetch(row) -> bool:
        url = str(row["url"])
        if "{size}" in url:
            url = url.replace("{size}", size)
        dst = out_root / str(row["book"]) / f"{row['page']}.jpg"
        dst.parent.mkdir(parents=True, exist_ok=True)
        try:
            with urllib.request.urlopen(url, timeout=timeout) as r:
                dst.write_bytes(r.read())
            return True
        except (urllib.error.URLError, OSError) as e:
            raise RuntimeError(
                f"IIIF download failed ({e}) — this environment may have no "
                "network egress; fetch images externally and use "
                "crop_oneline_dataset on the local copies"
            ) from e

    with ThreadPoolExecutor(workers) as pool:
        return sum(pool.map(fetch, (row for _, row in df.iterrows())))
