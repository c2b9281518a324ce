"""Stitch overlay PNGs into an MP4.

Counterpart of reference ``video.py`` (video.py:1-31): sort the PNGs in a
folder, write ``video/output.mp4`` with the mp4v codec at 30 fps.
"""

from __future__ import annotations

from pathlib import Path

import cv2


def stitch_video(
    frames_dir: str | Path,
    output_path: str | Path = "video/output.mp4",
    fps: int = 30,
) -> str:
    frames_dir = Path(frames_dir)
    files = sorted(frames_dir.glob("*.png"))
    if not files:
        raise FileNotFoundError(f"No PNG frames in {frames_dir}")
    first = cv2.imread(str(files[0]))
    h, w = first.shape[:2]
    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    writer = cv2.VideoWriter(
        str(output_path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for f in files:
        img = cv2.imread(str(f))
        if img is None:
            continue
        if img.shape[:2] != (h, w):
            img = cv2.resize(img, (w, h))
        writer.write(img)
    writer.release()
    print(f"Video saved to {output_path} ({len(files)} frames @ {fps} fps)")
    return str(output_path)


def frames_to_video(
    frames,
    output_path: str | Path,
    fps: int = 30,
    rgb: bool = True,
) -> str:
    """Write an in-memory frame stack (N, H, W, 3) to an MP4 (counterpart of
    reference ``save_rgb_frames_to_video``, utils.py:639-667).

    Accepts uint8 [0, 255] or float [0, 1] frames; ``rgb=True`` (the
    reference's contract) converts to the BGR order cv2 expects.
    """
    import numpy as np

    frames = np.asarray(frames)
    if frames.ndim != 4 or frames.shape[-1] != 3:
        raise ValueError(f"expected (N, H, W, 3) frames, got {frames.shape}")
    if frames.dtype != np.uint8:
        scale = 255.0 if float(frames.max(initial=0.0)) <= 1.0 else 1.0
        frames = np.clip(frames * scale, 0, 255).astype(np.uint8)

    n, h, w, _ = frames.shape
    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    writer = cv2.VideoWriter(
        str(output_path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for frame in frames:
        writer.write(frame[:, :, ::-1] if rgb else frame)
    writer.release()
    print(f"Video saved to {output_path} ({n} frames @ {fps} fps)")
    return str(output_path)
