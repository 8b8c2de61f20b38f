"""Step 1-2: video assets and frame extraction.

Reference: ``scripts/video_process/download_youtube.py`` (yt_dlp, gated
here — no network egress) and ``scripts/video_process/
extract_rawframes.py:6-25`` (ffmpeg @1fps to ``raw_frames/{vid}/%04d.jpg``).
"""
from __future__ import annotations

import json
import logging
import shutil
import subprocess
from pathlib import Path
from typing import Iterable, List, Optional

logger = logging.getLogger(__name__)


def load_video_ids(path) -> List[str]:
    """Video id list (one per line or JSON array)."""
    p = Path(path)
    text = p.read_text()
    if p.suffix == ".json":
        return list(json.loads(text))
    return [line.strip() for line in text.splitlines() if line.strip()]


def download_videos(video_ids: Iterable[str], out_dir, *,
                    allow_download: bool = False) -> List[str]:
    """Gated yt_dlp download.  In this environment downloads are disabled;
    the function validates which videos are already present."""
    out_dir = Path(out_dir)
    present, missing = [], []
    for vid in video_ids:
        hits = list(out_dir.glob(f"{vid}.*"))
        (present if hits else missing).append(vid)
    if missing and allow_download:
        try:
            import yt_dlp  # noqa
        except ImportError as e:
            raise RuntimeError("yt_dlp unavailable in this image") from e
        raise NotImplementedError(
            "network egress is disabled; run on a machine with access")
    if missing:
        logger.warning("%d videos missing locally (downloads disabled)",
                       len(missing))
    return present


def extract_frames(video_path, out_dir, fps: int = 1,
                   ffmpeg: Optional[str] = None) -> int:
    """Extract frames at ``fps`` into ``out_dir/%04d.jpg``
    (reference extract_rawframes.py:6-25).  Returns the frame count."""
    ffmpeg = ffmpeg or shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError("ffmpeg not found on PATH")
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    cmd = [ffmpeg, "-y", "-i", str(video_path), "-vf", f"fps={fps}",
           "-q:v", "2", str(out_dir / "%04d.jpg"),
           "-loglevel", "error"]
    subprocess.run(cmd, check=True)
    return len(list(out_dir.glob("*.jpg")))


def extract_all(videos_dir, frames_dir, fps: int = 1) -> int:
    """Extract every video under videos_dir into frames_dir/{vid}/."""
    total = 0
    for video in sorted(Path(videos_dir).iterdir()):
        if video.suffix.lower() not in (".mp4", ".mkv", ".webm"):
            continue
        total += extract_frames(video, Path(frames_dir) / video.stem,
                                fps=fps)
    return total
