"""Prediction input sources: images, directories, globs, video, streams,
in-memory arrays.

TPU-native rebuild of the reference's source loaders
(``yolov12/ultralytics/data/loaders.py`` LoadImagesAndVideos/LoadStreams/
LoadPilAndNumpy/LoadTensor, 658 LoC; dispatched from
``engine/predictor.py:191`` setup_source): everything normalizes to an
iterator of :class:`Frame` (RGB ndarray + provenance), which the predictor
consumes in power-of-two-bucketed batches so every source shape reuses the
same compiled XLA programs.

Video decode happens on the host (cv2); the device only ever sees fixed
(bucket, H, W, 3) tensors.
"""

from __future__ import annotations

import glob as _glob
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Iterator

import numpy as np

IMG_FORMATS = {"bmp", "dng", "jpeg", "jpg", "mpo", "png", "tif", "tiff", "webp"}
VID_FORMATS = {"asf", "avi", "gif", "m4v", "mkv", "mov", "mp4", "mpeg", "mpg",
               "ts", "wmv", "webm"}


@dataclass
class Frame:
    """One unit of prediction work: an RGB image plus provenance."""

    image: np.ndarray  # (H, W, 3) uint8 RGB
    path: str = ""  # source file (videos: "file.mp4#frame=N")
    frame_idx: int = 0  # index within its video/stream (0 for images)
    stream: bool = False  # True when from a live stream (unbounded)
    meta: dict = field(default_factory=dict)


def _read_image(path: str | Path) -> np.ndarray:
    import cv2

    img = cv2.imread(str(path))
    if img is None:
        raise FileNotFoundError(f"cannot read image: {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def _video_frames(path: str | Path, vid_stride: int = 1) -> Iterator[Frame]:
    """Decode a video file frame by frame (reference LoadImagesAndVideos
    video branch, ``data/loaders.py:300+``)."""
    import cv2

    cap = cv2.VideoCapture(str(path))
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {path}")
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    fps = cap.get(cv2.CAP_PROP_FPS) or 0.0
    idx = 0
    try:
        while True:
            ok = cap.grab()
            if not ok:
                break
            if idx % vid_stride == 0:
                ok, frame = cap.retrieve()
                if not ok:
                    break
                yield Frame(
                    image=frame[..., ::-1].copy(),  # BGR -> RGB
                    path=f"{path}#frame={idx}",
                    frame_idx=idx,
                    meta={"total_frames": total, "fps": fps,
                          "video": str(path)},
                )
            idx += 1
    finally:
        cap.release()


class StreamReader:
    """Background-thread latest-frame reader for live sources (webcam index,
    rtsp/http URL) — reference ``LoadStreams`` (``data/loaders.py:43``):
    a daemon thread drains the capture so the consumer always gets the most
    recent frame instead of a stale buffered one."""

    def __init__(self, source: int | str, max_frames: int | None = None):
        import cv2

        self.cap = cv2.VideoCapture(source)
        if not self.cap.isOpened():
            raise ConnectionError(f"cannot open stream: {source!r}")
        self.source = source
        self.max_frames = max_frames
        self._latest: np.ndarray | None = None
        self._n = 0
        self._stop = False
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._drain, daemon=True)
        self._thread.start()

    def _drain(self):
        while not self._stop and self.cap.isOpened():
            ok, frame = self.cap.read()
            if not ok:
                break
            with self._lock:
                self._latest = frame
                self._n += 1
        self._stop = True

    def frames(self) -> Iterator[Frame]:
        served = 0
        last_served = -1
        while not self._stop or last_served < self._n - 1:
            with self._lock:
                frame, n = self._latest, self._n
            if frame is None or n - 1 == last_served:
                time.sleep(0.005)
                continue
            last_served = n - 1
            yield Frame(
                image=frame[..., ::-1].copy(),
                path=f"{self.source}#frame={last_served}",
                frame_idx=last_served,
                stream=True,
            )
            served += 1
            if self.max_frames is not None and served >= self.max_frames:
                break
        self.close()

    def close(self):
        self._stop = True
        try:
            self.cap.release()
        except Exception:
            pass


def resolve_source(
    source: Any, vid_stride: int = 1, max_frames: int | None = None
) -> Iterator[Frame]:
    """Normalize any prediction source into a Frame iterator.

    Accepted (reference ``engine/predictor.py:191`` source matrix):
    ndarray (HW3 frame or NHW3 batch), PIL image, list/tuple of any of
    these, image path, video path, directory, glob pattern, webcam index
    (int or digit string), stream URL (rtsp/rtmp/http(s) to a video).
    """
    # in-memory arrays -------------------------------------------------
    if hasattr(source, "convert") and hasattr(source, "size"):  # PIL
        yield Frame(image=np.asarray(source.convert("RGB")))
        return
    if isinstance(source, np.ndarray):
        if source.ndim == 3:
            yield Frame(image=source)
        elif source.ndim == 4:
            for i, f in enumerate(source):
                yield Frame(image=f, frame_idx=i)
        else:
            raise ValueError(f"bad source array shape {source.shape}")
        return
    if isinstance(source, (list, tuple)):
        for s in source:
            yield from resolve_source(s, vid_stride, max_frames)
        return
    # webcam index -----------------------------------------------------
    if isinstance(source, int) or (isinstance(source, str) and source.isdigit()):
        yield from StreamReader(int(source), max_frames=max_frames).frames()
        return
    s = str(source)
    low = s.lower()
    if low.startswith(("rtsp://", "rtmp://", "tcp://")):
        yield from StreamReader(s, max_frames=max_frames).frames()
        return
    if low.startswith(("http://", "https://")):
        if low.rsplit(".", 1)[-1] in IMG_FORMATS:
            raise ValueError(
                "remote image URLs need network access (unavailable); "
                "download first and pass the local path"
            )
        yield from StreamReader(s, max_frames=max_frames).frames()
        return
    p = Path(s)
    if p.is_dir():
        files = sorted(
            f for f in p.iterdir()
            if f.suffix.lower().lstrip(".") in IMG_FORMATS | VID_FORMATS
        )
        for f in files:
            yield from resolve_source(f, vid_stride, max_frames)
        return
    if "*" in s:
        for f in sorted(_glob.glob(s)):
            yield from resolve_source(f, vid_stride, max_frames)
        return
    suffix = p.suffix.lower().lstrip(".")
    if suffix in VID_FORMATS:
        yield from _video_frames(p, vid_stride)
        return
    # plain image path (default)
    yield Frame(image=_read_image(p), path=s)


def batched_frames(
    frames: Iterator[Frame], batch: int = 8
) -> Iterator[list[Frame]]:
    """Group frames into host batches of at most ``batch`` (the predictor
    pads each group to a power-of-two bucket on top of this)."""
    buf: list[Frame] = []
    for f in frames:
        buf.append(f)
        if len(buf) >= batch:
            yield buf
            buf = []
    if buf:
        yield buf
