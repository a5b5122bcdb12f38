"""Frame sources for online SLAM: webcam, video file, image folder.

Parity target: reference `must3r/slam/data.py` (`BaseLoader`,
`ImageCollection`, `VideoFile`, webcam `cam:N`, and `AutoMultiLoader`
round-robining multiple streams for multi-agent runs). cv2 is host-side
I/O only -- frames leave here as RGB uint8 numpy arrays.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np


class BaseLoader:
    """Iterator protocol: next_frame() -> (frame RGB uint8 | None, frame_id)."""

    def __init__(self, subsamp: int = 1):
        self.subsamp = max(1, subsamp)
        self.frame_id = -1

    def read(self):
        raise NotImplementedError

    def next_frame(self) -> Tuple[Optional[np.ndarray], int]:
        for _ in range(self.subsamp):
            frame = self.read()
            self.frame_id += 1
            if frame is None:
                return None, self.frame_id
        return frame, self.frame_id

    def __iter__(self):
        while True:
            frame, fid = self.next_frame()
            if frame is None:
                return
            yield frame, fid

    def release(self):
        pass


class ImageCollection(BaseLoader):
    """Preloadable image folder or explicit file list."""

    def __init__(self, source, subsamp: int = 1, preload: bool = False):
        super().__init__(subsamp)
        from must3r_tpu.tools.image import list_images, load_image

        self.paths: List[str] = (list_images(source)
                                 if isinstance(source, str) else list(source))
        self._load = load_image
        self._cursor = 0
        self._cache = ([self._load(p) for p in self.paths]
                       if preload else None)

    def __len__(self):
        return len(self.paths)

    def read(self):
        if self._cursor >= len(self.paths):
            return None
        i = self._cursor
        self._cursor += 1
        return self._cache[i] if self._cache is not None \
            else self._load(self.paths[i])


class VideoFile(BaseLoader):
    """cv2-decoded video file; also handles webcams via 'cam:N'."""

    def __init__(self, source: str, subsamp: int = 1):
        super().__init__(subsamp)
        import cv2

        self._cv2 = cv2
        if isinstance(source, str) and source.startswith("cam:"):
            self.cap = cv2.VideoCapture(int(source.split(":")[1]))
        else:
            self.cap = cv2.VideoCapture(source)
        assert self.cap.isOpened(), f"cannot open {source}"

    def read(self):
        ok, frame = self.cap.read()
        if not ok:
            return None
        return self._cv2.cvtColor(frame, self._cv2.COLOR_BGR2RGB)

    def release(self):
        self.cap.release()


class TumSequence(BaseLoader):
    """TUM RGB-D sequence directory: frames from `rgb.txt`
    (``timestamp path`` lines), frame ids = real float timestamps so
    predicted trajectories associate directly with `groundtruth.txt` for
    the ATE/RPE eval (BASELINE.md SLAM protocol; reference runs
    `slam.py` on these sequences, assets/evals.md:196)."""

    def __init__(self, root: str, subsamp: int = 1):
        super().__init__(subsamp)
        from must3r_tpu.tools.image import load_image

        self.root = root
        self._load = load_image
        self.entries = []           # [(timestamp float, relpath)]
        with open(os.path.join(root, "rgb.txt")) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                ts, rel = line.split()[:2]
                self.entries.append((float(ts), rel))
        self._cursor = 0
        self._last_ts = -1.0

    def __len__(self):
        return len(self.entries)

    @property
    def timestamps(self):
        return [ts for ts, _ in self.entries]

    def read(self):
        if self._cursor >= len(self.entries):
            return None
        ts, rel = self.entries[self._cursor]
        self._cursor += 1
        self._last_ts = ts
        return self._load(os.path.join(self.root, rel))

    def next_frame(self):
        frame = None
        for _ in range(self.subsamp):
            frame = self.read()
            if frame is None:
                return None, self._last_ts
        return frame, self._last_ts


def make_loader(source, subsamp: int = 1) -> BaseLoader:
    """'cam:N' -> webcam; video extension -> VideoFile; TUM sequence dir
    (contains rgb.txt) -> TumSequence; else folder/list."""
    if isinstance(source, str):
        if source.startswith("cam:"):
            return VideoFile(source, subsamp)
        ext = os.path.splitext(source)[1].lower()
        if ext in {".mp4", ".avi", ".mov", ".mkv", ".webm", ".m4v"}:
            return VideoFile(source, subsamp)
        if os.path.isdir(source) and \
                os.path.isfile(os.path.join(source, "rgb.txt")):
            return TumSequence(source, subsamp)
        return ImageCollection(source, subsamp)
    return ImageCollection(source, subsamp)


class AutoMultiLoader(BaseLoader):
    """Round-robin several streams (multi-agent SLAM). next_frame() returns
    (frame, frame_id, cam_id); ends when every stream is exhausted."""

    def __init__(self, sources: Sequence, subsamp: int = 1):
        super().__init__(1)
        self.loaders = [make_loader(s, subsamp) for s in sources]
        self._alive = [True] * len(self.loaders)
        self._turn = 0

    def next_frame(self):
        n = len(self.loaders)
        for _ in range(n):
            cam = self._turn
            self._turn = (self._turn + 1) % n
            if not self._alive[cam]:
                continue
            frame, fid = self.loaders[cam].next_frame()
            if frame is None:
                self._alive[cam] = False
                continue
            return frame, fid, cam
        return None, -1, -1

    def __iter__(self):
        while True:
            frame, fid, cam = self.next_frame()
            if frame is None:
                return
            yield frame, fid, cam

    def release(self):
        for ld in self.loaders:
            ld.release()
