"""Extract frames at 1 fps from downloaded videos (pipeline step 2;
reference scripts/video_process/extract_rawframes.py).

    python scripts/extract_frames.py --videos data/videos \
        --out data/YouTube-VLN/raw_frames
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from youtube_vln_tpu.pipeline.frames import extract_all


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--videos", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--fps", default=1, type=int)
    a = p.parse_args(argv)
    n = extract_all(a.videos, a.out, fps=a.fps)
    print(f"extracted {n} frames -> {a.out}")


if __name__ == "__main__":
    main()
