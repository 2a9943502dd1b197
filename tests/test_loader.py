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
