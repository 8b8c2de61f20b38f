"""Step 5: indoor / person frame filters.

The reference runs two filter models offline — a WideResNet-18 Places365
indoor/outdoor classifier (``filter_outdoor_resnet_place365.py``) and a
Mask-RCNN person detector (``filter_outdoor_maskrcnn_coco.py``) — and later
drops frames that fail either filter plus CLIP-caption 'person' frames
(``build_dataset.py``).  The classifiers are pluggable scorers here (their
weights are external assets in the reference too); this module implements
the decision logic and the artifact formats the downstream steps read.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Sequence

import numpy as np

# Places365 indoor/outdoor: the reference keeps a frame when the classifier
# votes indoor (io <= the indoor/outdoor boundary).  Scorers here return
# P(indoor) directly.
INDOOR_THRESHOLD = 0.5


def indoor_filter(frames: Sequence[int], indoor_scores: Sequence[float],
                  threshold: float = INDOOR_THRESHOLD) -> List[int]:
    return [f for f, s in zip(frames, indoor_scores) if s >= threshold]


def person_filter(frames: Sequence[int], person_scores: Sequence[float],
                  threshold: float = 0.5) -> List[int]:
    """Frames REJECTED for containing people."""
    return [f for f, s in zip(frames, person_scores) if s >= threshold]


def write_indoor_tsv(out_dir, video_id: str, indoor_frames: Sequence[int]
                     ) -> Path:
    """indoor.tsv in the layout build_dataset reads
    (reference build_dataset.py:109-115: video_id\\tframe_id rows)."""
    d = Path(out_dir) / video_id
    d.mkdir(parents=True, exist_ok=True)
    path = d / "indoor.tsv"
    with open(path, "w") as f:
        for fid in indoor_frames:
            f.write(f"{video_id}\t{fid}\n")
    return path


def write_maskrcnn_filters(out_dir, video_id: str,
                           indoor_frames: Sequence[int],
                           person_frames: Sequence[int]) -> Path:
    """The Mask-RCNN filter artifact (reference stores an .npy dict with
    indoor_locs/person_locs, build_dataset.py:101-107; we use JSON)."""
    d = Path(out_dir) / video_id
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"{video_id}.json"
    payload = {
        "indoor_locs": ["%04d.jpg" % f for f in indoor_frames],
        "person_locs": ["%04d.jpg" % f for f in person_frames],
    }
    with open(path, "w") as f:
        json.dump(payload, f)
    return path


def load_maskrcnn_filters(path) -> Dict[str, List[str]]:
    p = Path(path)
    if p.suffix == ".npy":
        return np.load(p, allow_pickle=True)[()]
    with open(p) as f:
        return json.load(f)


def frame_passes(frame_id: int, *, indoor_resnet: Sequence[int],
                 maskrcnn: Dict[str, List[str]],
                 caption: str) -> bool:
    """Combined filter decision (reference build_dataset.py:100-135):
    keep a frame iff the Places365 filter voted indoor, Mask-RCNN voted
    indoor, Mask-RCNN saw no person, and the CLIP caption's object is not
    'person'."""
    name = "%04d.jpg" % frame_id
    if indoor_resnet is not None and frame_id not in indoor_resnet:
        return False
    if maskrcnn is not None:
        if name not in maskrcnn.get("indoor_locs", []):
            return False
        if name in maskrcnn.get("person_locs", []):
            return False
    if caption and caption.split(" with ")[-1] == "person":
        return False
    return True
