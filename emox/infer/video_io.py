"""Video IO utilities (reference magicanimate/utils/util.py:21-33
save_videos_grid; video.py cv2 reader/writer wrapper;
magicanimate/utils/videoreader.py PyAV reader)."""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np


class VideoReader:
    """cv2-backed reader with dims/fps/length/seek/read (capability parity
    with reference video.py:15-103 Video and videoreader.py:31-156).
    Yields RGB float32 frames in [-1, 1]."""

    def __init__(self, path: str):
        import cv2

        self._cv2 = cv2
        self.cap = cv2.VideoCapture(path)
        if not self.cap.isOpened():
            raise IOError(f"cannot open video {path}")
        self.path = path

    @property
    def fps(self) -> float:
        return float(self.cap.get(self._cv2.CAP_PROP_FPS) or 25.0)

    @property
    def width(self) -> int:
        return int(self.cap.get(self._cv2.CAP_PROP_FRAME_WIDTH))

    @property
    def height(self) -> int:
        return int(self.cap.get(self._cv2.CAP_PROP_FRAME_HEIGHT))

    def __len__(self) -> int:
        return int(self.cap.get(self._cv2.CAP_PROP_FRAME_COUNT))

    def seek(self, frame_index: int) -> None:
        self.cap.set(self._cv2.CAP_PROP_POS_FRAMES, frame_index)

    def read(self) -> Optional[np.ndarray]:
        ok, frame = self.cap.read()
        if not ok:
            return None
        rgb = self._cv2.cvtColor(frame, self._cv2.COLOR_BGR2RGB)
        return rgb.astype(np.float32) / 127.5 - 1.0

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            f = self.read()
            if f is None:
                return
            yield f

    def close(self) -> None:
        self.cap.release()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def frames_to_uint8(frames: np.ndarray) -> np.ndarray:
    """[-1, 1] float frames -> uint8."""
    return np.clip((np.asarray(frames, np.float32) + 1.0) * 127.5, 0, 255).astype(np.uint8)


def save_video(frames: np.ndarray, path: str, fps: float = 25.0, wav: Optional[np.ndarray] = None, sample_rate: int = 16000) -> str:
    """[T, H, W, 3] float in [-1,1] or uint8 -> .mp4 (imageio/ffmpeg) or .npz
    fallback; mux audio when ffmpeg is available and wav is given."""
    arr = frames if frames.dtype == np.uint8 else frames_to_uint8(frames)
    if path.endswith(".npz"):
        np.savez_compressed(path, frames=arr, fps=fps)
        return path
    try:
        import imageio.v3 as iio

        iio.imwrite(path, arr, fps=fps, plugin="FFMPEG")
    except Exception:
        try:
            import cv2

            h, w = arr.shape[1:3]
            vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
            for f in arr:
                vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
            vw.release()
        except Exception:
            path = path.rsplit(".", 1)[0] + ".npz"
            np.savez_compressed(path, frames=arr, fps=fps)
            return path
    if wav is not None:
        import subprocess, os

        wav_path = path + ".wav.tmp"
        try:
            _write_wav(wav_path, np.asarray(wav), sample_rate)
            muxed = path.rsplit(".", 1)[0] + "_audio.mp4"
            subprocess.run(
                ["ffmpeg", "-v", "quiet", "-y", "-i", path, "-i", wav_path, "-c:v", "copy", "-c:a", "aac", muxed],
                check=True,
            )
            os.replace(muxed, path)
        except (OSError, subprocess.CalledProcessError):
            pass
        finally:
            if os.path.exists(wav_path):
                os.remove(wav_path)
    return path


def _write_wav(path: str, wav: np.ndarray, sample_rate: int) -> None:
    import struct, wave

    pcm = np.clip(wav, -1, 1)
    pcm16 = (pcm * 32767).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm16.tobytes())
