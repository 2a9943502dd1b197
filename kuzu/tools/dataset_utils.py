"""Offline dataset housekeeping utilities — the P38 long tail.

Rebuilds the reference's standalone maintenance scripts as one module with a
CLI (``python -m kuzu.tools.dataset_utils <cmd> k=v...``):

  count_pages       per-book page counts, ascending (``scripts/count_pages.py``)
  count_yolo        images/labels/instances per split (``count_yolo_dataset.py``)
  check_images      find corrupt images, parallel (``scripts/check_images.py``)
  split_annotation  split column_info.csv per book id (``split_annotation.py``)
  move_hyphen       quarantine hyphen-named files (``move_hyphen_images.py``)
  char_dict         unicode->id dict from column_info.csv
                    (``create_chracter_dict.py``)
  create_labels     per-column text label files (``scripts/create_labels.py``)
  create_bboxes     per-column bbox JSON files (``create_bounding_boxes.py``)

The network-bound one-offs (``upload_to_hf.py``, ``download_roboflow_data.py``,
``get_year.py`` — a selenium scraper) are out of scope in a zero-egress
environment by design.
"""

from __future__ import annotations

import ast
import json
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

IMG_EXTS = {".jpg", ".jpeg", ".png", ".webp", ".bmp", ".tiff", ".tif", ".gif"}


# ------------------------------------------------------------- count_pages


def count_pages(dataset_dir: str | Path) -> list[tuple[str, int]]:
    """Per-book page counts, ascending (reference ``count_pages.py``: each
    book is a subdirectory; a page is an image file)."""
    dataset_dir = Path(dataset_dir)
    if not dataset_dir.is_dir():
        raise NotADirectoryError(dataset_dir)
    out = []
    for book in sorted(p for p in dataset_dir.iterdir() if p.is_dir()):
        n = sum(
            1
            for f in book.rglob("*")
            if f.is_file() and f.suffix.lower() in IMG_EXTS
        )
        out.append((book.name, n))
    out.sort(key=lambda kv: kv[1])
    for name, n in out:
        print(f"{name}: {n}")
    print(f"total: {sum(n for _, n in out)} pages in {len(out)} books")
    return out


def count_yolo(dataset_yaml: str | Path) -> dict:
    """Images / label files / instances per split (``count_yolo_dataset.py``)."""
    import yaml

    y = Path(dataset_yaml)
    spec = yaml.safe_load(y.read_text())
    base = y.parent / str(spec.get("path", "."))
    out = {}
    for split in ("train", "val", "test"):
        if split not in spec or spec[split] is None:
            continue
        img_dir = (base / spec[split]).resolve()
        lbl_dir = Path(str(img_dir).replace("images", "labels"))
        imgs = [
            f for f in img_dir.glob("*") if f.suffix.lower() in IMG_EXTS
        ] if img_dir.is_dir() else []
        labels = list(lbl_dir.glob("*.txt")) if lbl_dir.is_dir() else []
        inst = sum(
            len([ln for ln in f.read_text().splitlines() if ln.strip()])
            for f in labels
        )
        out[split] = {
            "images": len(imgs), "labels": len(labels), "instances": inst,
        }
    print(json.dumps(out))
    return out


# ------------------------------------------------------------ check_images


def _check_one(path: Path) -> str | None:
    from PIL import Image

    try:
        with Image.open(path) as im:
            im.verify()
        with Image.open(path) as im:  # verify() invalidates the handle
            im.load()
        return None
    except Exception:
        return str(path)


def check_images(root: str | Path, workers: int = 8) -> list[str]:
    """Scan a tree for corrupt images (reference ``check_images.py``:
    PIL verify + full load per file, thread pool)."""
    files = [
        f for f in Path(root).rglob("*")
        if f.is_file() and f.suffix.lower() in IMG_EXTS
    ]
    with ThreadPoolExecutor(max_workers=workers) as ex:
        bad = [r for r in ex.map(_check_one, files) if r]
    print(f"checked {len(files)} images, {len(bad)} corrupt")
    for b in bad:
        print(b)
    return bad


# -------------------------------------------------------- split_annotation


def book_id_from_path(column_image: str) -> str:
    """Book id = the directory component right above the image file
    (reference layout ``.../column_images/{book}/{image}.jpg``)."""
    parts = Path(column_image).parts
    return parts[-2] if len(parts) >= 2 else "unknown"


def split_annotation(
    csv_path: str | Path, out_dir: str | Path
) -> dict[str, int]:
    """Split a column_info.csv into one CSV per book id, keeping the header
    (reference ``split_annotation.py``)."""
    import csv as _csv

    csv_path, out_dir = Path(csv_path), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    with csv_path.open(encoding="utf-8") as f:
        reader = _csv.reader(f)
        header = next(reader)
        rows_by_book: dict[str, list] = {}
        for row in reader:
            rows_by_book.setdefault(book_id_from_path(row[0]), []).append(row)
    counts = {}
    for book, rows in sorted(rows_by_book.items()):
        with (out_dir / f"{book}.csv").open("w", encoding="utf-8", newline="") as f:
            w = _csv.writer(f)
            w.writerow(header)
            w.writerows(rows)
        counts[book] = len(rows)
    print(json.dumps(counts))
    return counts


# ------------------------------------------------------ move_hyphen_images


def move_hyphen_images(
    root: str | Path, dry_run: bool = False, subdir: str = "dataset"
) -> list[tuple[str, str]]:
    """Quarantine files whose basename contains '-' into ``{root}/error/``,
    preserving the structure under ``{root}/{subdir}/`` and suffixing on
    collision (reference ``move_hyphen_images.py``)."""
    root = Path(root)
    src_root = root / subdir
    moves = []
    for f in sorted(src_root.rglob("*")):
        if not (f.is_file() and f.suffix.lower() in IMG_EXTS and "-" in f.stem):
            continue
        rel = f.relative_to(src_root)
        dst = root / "error" / rel
        k = 1
        while dst.exists():
            dst = dst.with_name(f"{dst.stem}_{k}{dst.suffix}")
            k += 1
        moves.append((str(f), str(dst)))
        if not dry_run:
            dst.parent.mkdir(parents=True, exist_ok=True)
            f.rename(dst)
    print(f"{'would move' if dry_run else 'moved'} {len(moves)} files")
    return moves


# ---------------------------------------------------------- char utilities


def _unicode_ids(cell: str) -> list[str]:
    """Accept both serializations: a python list literal (reference) or the
    space-separated form kuzu's ETL writes."""
    cell = cell.strip()
    if cell.startswith("["):
        return [str(u) for u in ast.literal_eval(cell)]
    return cell.split()


def char_dict(csv_path: str | Path, out_json: str | Path | None = None) -> dict:
    """Unicode->id dict over every char in column_info.csv, codepoint-sorted
    (reference ``create_chracter_dict.py``)."""
    import pandas as pd

    df = pd.read_csv(csv_path)
    seen = set()
    for cell in df["unicode_ids"].astype(str):
        seen.update(_unicode_ids(cell))
    ordered = sorted(seen, key=lambda u: int(u[2:], 16))
    mapping = {u: i for i, u in enumerate(ordered)}
    if out_json:
        Path(out_json).write_text(
            json.dumps(mapping, ensure_ascii=False, indent=2), encoding="utf-8"
        )
    print(f"{len(mapping)} unique characters")
    return mapping


def create_labels(csv_path: str | Path, out_dir: str | Path) -> int:
    """Per-column text files ``labels/{book}/{image}.txt`` with the decoded
    transcription (reference ``scripts/create_labels.py``)."""
    import pandas as pd

    from kuzu.data.ocr_datasets import decode_unicode_ids

    df = pd.read_csv(csv_path)
    out_dir = Path(out_dir)
    n = 0
    for _, row in df.iterrows():
        img = str(row["column_image"])
        book = book_id_from_path(img)
        d = out_dir / book
        d.mkdir(parents=True, exist_ok=True)
        text = decode_unicode_ids(" ".join(_unicode_ids(str(row["unicode_ids"]))))
        (d / (Path(img).stem + ".txt")).write_text(text, encoding="utf-8")
        n += 1
    print(f"wrote {n} label files")
    return n


def create_bboxes(csv_path: str | Path, out_dir: str | Path) -> int:
    """Per-column bbox JSON ``bounding_boxes/{book}/{image}.json`` from the
    char_boxes_in_column cell (reference ``create_bounding_boxes.py``)."""
    import pandas as pd

    df = pd.read_csv(csv_path)
    out_dir = Path(out_dir)
    n = 0
    for _, row in df.iterrows():
        img = str(row["column_image"])
        cell = row.get("char_boxes_in_column")
        if cell is None or (isinstance(cell, float)):
            continue
        try:
            boxes = ast.literal_eval(str(cell))
        except (ValueError, SyntaxError):
            continue
        book = book_id_from_path(img)
        d = out_dir / book
        d.mkdir(parents=True, exist_ok=True)
        (d / (Path(img).stem + ".json")).write_text(
            json.dumps(boxes, ensure_ascii=False, indent=4), encoding="utf-8"
        )
        n += 1
    print(f"wrote {n} bbox files")
    return n


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


CMDS = {
    "count_pages": count_pages,
    "count_yolo": count_yolo,
    "check_images": check_images,
    "split_annotation": split_annotation,
    "move_hyphen": move_hyphen_images,
    "char_dict": char_dict,
    "create_labels": create_labels,
    "create_bboxes": create_bboxes,
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] not in CMDS:
        print(__doc__)
        return
    CMDS[argv[0]](**_kv(argv[1:]))


if __name__ == "__main__":
    main()
