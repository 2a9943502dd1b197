"""Prediction source matrix (reference ``data/loaders.py`` +
``engine/predictor.py:191``): images, arrays, dirs, globs, video files,
bounded streams — all normalized to Frame iterators."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("media")
    rng = np.random.default_rng(0)
    for i in range(3):
        img = rng.integers(0, 255, (48, 64, 3), np.uint8)
        cv2.imwrite(str(root / f"img{i}.png"), img)
    # 6-frame video with a deterministic per-frame fill value
    vw = cv2.VideoWriter(
        str(root / "clip.avi"), cv2.VideoWriter_fourcc(*"MJPG"), 5, (64, 48)
    )
    assert vw.isOpened()
    for i in range(6):
        vw.write(np.full((48, 64, 3), i * 30, np.uint8))
    vw.release()
    return root


def test_image_path_and_array(media_dir):
    from kuzu.data.sources import resolve_source

    frames = list(resolve_source(str(media_dir / "img0.png")))
    assert len(frames) == 1 and frames[0].image.shape == (48, 64, 3)
    arr = np.zeros((10, 12, 3), np.uint8)
    frames = list(resolve_source(arr))
    assert len(frames) == 1 and frames[0].image.shape == (10, 12, 3)
    batch = np.zeros((4, 10, 12, 3), np.uint8)
    assert len(list(resolve_source(batch))) == 4


def test_directory_and_glob(media_dir):
    from kuzu.data.sources import resolve_source

    frames = list(resolve_source(str(media_dir)))
    # 6 video frames ("clip.avi" sorts first) + 3 images
    assert len(frames) == 9
    assert [f.path for f in frames[6:]] == sorted(
        str(media_dir / f"img{i}.png") for i in range(3)
    )
    frames = list(resolve_source(str(media_dir / "*.png")))
    assert len(frames) == 3


def test_video_frames_and_stride(media_dir):
    from kuzu.data.sources import resolve_source

    frames = list(resolve_source(str(media_dir / "clip.avi")))
    assert len(frames) == 6
    assert frames[0].frame_idx == 0 and frames[5].frame_idx == 5
    assert "#frame=3" in frames[3].path
    assert frames[0].meta["total_frames"] == 6
    # MJPG is lossy but flat frames survive: per-frame mean tracks i*30
    means = [f.image.mean() for f in frames]
    assert means == sorted(means) and means[-1] - means[0] > 100
    strided = list(resolve_source(str(media_dir / "clip.avi"), vid_stride=2))
    assert [f.frame_idx for f in strided] == [0, 2, 4]


def test_mixed_list_and_batching(media_dir):
    from kuzu.data.sources import batched_frames, resolve_source

    src = [str(media_dir / "img0.png"), str(media_dir / "clip.avi")]
    frames = resolve_source(src)
    groups = list(batched_frames(frames, batch=4))
    assert [len(g) for g in groups] == [4, 3]


def test_pil_source(media_dir):
    from PIL import Image

    from kuzu.data.sources import resolve_source

    pil = Image.open(media_dir / "img1.png")
    frames = list(resolve_source(pil))
    assert frames[0].image.shape == (48, 64, 3)
