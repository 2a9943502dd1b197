import numpy as np

from kuzu.data.loader import DataLoader


class ToyDataset:
    def __init__(self, n=20):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((3,), i, np.float32), "y": np.int32(i)}


def test_loader_batching_and_drop_last():
    dl = DataLoader(ToyDataset(10), batch_size=4, shuffle=False, num_workers=0)
    batches = list(dl)
    assert len(batches) == 2  # drop_last
    assert batches[0]["x"].shape == (4, 3)
    np.testing.assert_array_equal(batches[0]["y"], [0, 1, 2, 3])


def test_loader_seeded_shuffle_deterministic():
    a = DataLoader(ToyDataset(16), 4, shuffle=True, seed=1, num_workers=0)
    b = DataLoader(ToyDataset(16), 4, shuffle=True, seed=1, num_workers=0)
    ya = np.concatenate([bt["y"] for bt in a])
    yb = np.concatenate([bt["y"] for bt in b])
    np.testing.assert_array_equal(ya, yb)
    a.set_epoch(1)
    yc = np.concatenate([bt["y"] for bt in a])
    assert not np.array_equal(ya, yc)  # epoch changes order


def test_loader_threaded_matches_sync():
    sync = DataLoader(ToyDataset(32), 8, shuffle=True, seed=3, num_workers=0)
    thr = DataLoader(ToyDataset(32), 8, shuffle=True, seed=3, num_workers=4)
    ys = np.concatenate([b["y"] for b in sync])
    yt = np.concatenate([b["y"] for b in thr])
    np.testing.assert_array_equal(ys, yt)


def test_loader_worker_error_propagates():
    class Bad(ToyDataset):
        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("corrupt sample")
            return super().__getitem__(i)

    dl = DataLoader(Bad(8), 4, shuffle=False, num_workers=2)
    try:
        list(dl)
        raised = False
    except RuntimeError:
        raised = True
    assert raised


def test_grouped_batches_respect_groups():
    """group_fn batches never mix groups (rect/aspect-grouped batching)."""
    from kuzu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            import numpy as np

            return {"idx": np.array(i)}

    group = lambda i: "a" if i < 6 else "b"
    dl = DataLoader(DS(), 2, shuffle=True, seed=3, num_workers=0, group_fn=group)
    assert len(dl) == 5
    seen = []
    for batch in dl:
        idxs = batch["idx"].tolist()
        keys = {group(i) for i in idxs}
        assert len(keys) == 1  # no mixed-shape batch
        seen.extend(idxs)
    assert sorted(seen) == list(range(10))


def test_rect_dataset_buckets(tmp_path):
    """Tall images land in a non-square, stride-aligned bucket."""
    import numpy as np
    import cv2
    import yaml

    root = tmp_path
    (root / "images/val").mkdir(parents=True)
    (root / "labels/val").mkdir(parents=True)
    # two tall pages, one wide
    for i, (h, w) in enumerate([(200, 100), (200, 100), (100, 200)]):
        cv2.imwrite(str(root / f"images/val/{i}.png"),
                    np.full((h, w, 3), 200, np.uint8))
        (root / f"labels/val/{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    (root / "d.yaml").write_text(yaml.safe_dump(
        {"path": str(root), "train": "images/val", "val": "images/val",
         "nc": 1, "names": {0: "x"}}))
    from kuzu.data.yolo_dataset import YoloDetectionDataset

    ds = YoloDetectionDataset(root / "d.yaml", split="val", imgsz=128,
                              augment=False, rect=True, stride=32)
    k0, k2 = ds.batch_shape_key(0), ds.batch_shape_key(2)
    assert k0 == (128, 64)   # tall: short side 128/2 = 64, stride-aligned
    assert k2 == (64, 128)   # wide
    s = ds[0]
    assert s["image"].shape == (128, 64, 3)
    b = s["gt_boxes"][s["mask_gt"]]
    assert (b >= 0).all() and (b[:, [0, 2]] <= 64).all()


def test_label_cache_roundtrip_and_invalidation(tmp_path):
    """Reference get_labels/cache_labels semantics (data/dataset.py):
    first scan persists labels.cache, matching hash reuses it, touching a
    label file invalidates it."""
    import yaml

    from kuzu.data.yolo_dataset import YoloDetectionDataset

    for split in ("train",):
        (tmp_path / "images" / split).mkdir(parents=True)
        (tmp_path / "labels" / split).mkdir(parents=True)
    import numpy as np
    from PIL import Image

    for i in range(3):
        Image.new("RGB", (32, 32), (200, 200, 200)).save(
            tmp_path / "images/train" / f"{i}.jpg"
        )
        (tmp_path / "labels/train" / f"{i}.txt").write_text(
            f"0 0.5 0.5 0.{2 + i} 0.3\n"
        )
    yml = tmp_path / "dataset.yaml"
    yml.write_text(yaml.safe_dump({
        "path": ".", "train": "images/train", "val": "images/train",
        "names": {0: "x"}, "nc": 1,
    }))

    ds = YoloDetectionDataset(yml, split="train", imgsz=32, max_boxes=4,
                              augment=False)
    cache_file = tmp_path / "labels/train/labels.cache.npz"
    assert cache_file.exists()
    assert len(ds._labels) == 3 and ds._labels[1][0, 3] == np.float32(0.3)

    # warm reload hits the cache (delete a label txt but keep mtimes -> the
    # hash changes, proving the hash actually covers the files)
    ds2 = YoloDetectionDataset(yml, split="train", imgsz=32, max_boxes=4,
                               augment=False)
    assert [len(a) for a in ds2._labels] == [1, 1, 1]

    (tmp_path / "labels/train" / "1.txt").write_text(
        "0 0.5 0.5 0.9 0.9\n0 0.2 0.2 0.1 0.1\n"
    )
    ds3 = YoloDetectionDataset(yml, split="train", imgsz=32, max_boxes=4,
                               augment=False)
    assert len(ds3._labels[1]) == 2  # invalidated + re-scanned

    # cache=False keeps the old per-item path
    ds4 = YoloDetectionDataset(yml, split="train", imgsz=32, max_boxes=4,
                               augment=False, cache=False)
    assert ds4._labels is None
    _, boxes, _ = ds4._load_raw(1)
    assert len(boxes) == 2
