"""Beam re-ranking inference (the test.py path).

Matches reference ``test.py:144-192``: score every ranked path per
instruction with the ranking head, argmax -> trajectory, fall back to the
beam-0 start viewpoint when the argmax lands on a padded row.
"""
from __future__ import annotations

import json
from typing import List, Tuple

import jax
import numpy as np

from ..config import LilyConfig
from ..data.loader import Loader, device_prefetch
from ..models import lily_forward
from ..parallel.train_step import _flatten_candidates, expand_beam_steps
from ..training.losses import pad_packed


def build_score_step(cfg: LilyConfig):
    def step(params, batch):
        flat = _flatten_candidates(expand_beam_steps(batch))
        outputs = lily_forward(
            params, cfg, flat["instr_tokens"], flat["image_features"],
            flat["image_locations"], token_type_ids=flat["segment_ids"],
            attention_mask=flat["instr_mask"],
            image_attention_mask=flat["image_mask"], train=False)
        bs, nc = batch["opt_mask"].shape
        return pad_packed(outputs["ranking"].reshape(bs, nc),
                          batch["opt_mask"])
    return jax.jit(step)


def eval_epoch(params, cfg: LilyConfig, loader: Loader,
               random_testing: bool = False, seed: int = 0,
               prefetch: int = 2) -> List[Tuple[str, List[float]]]:
    """Returns [(instr_id, [beam scores])] (reference test.py:144-166)."""
    step = build_score_step(cfg)
    rng = np.random.default_rng(seed)
    all_scores: List[Tuple[str, List[float]]] = []
    pending = []

    # instr_id is loader metadata: capture it HOST-side before the device
    # transfer.  Reading batch["instr_id"] back after device_put is a
    # per-batch D2H round trip that forces the whole dispatch backlog
    # synchronously (on axon only readback forces execution), defeating
    # the deferred-readback `pending` pipeline below.
    ids_fifo: List[List[str]] = []

    def strip_ids(it):
        for b in it:
            ids_fifo.append([f"{int(a)}_{int(x)}" for a, x in
                             np.asarray(b["instr_id"])])
            yield {k: v for k, v in b.items() if k != "instr_id"}

    for batch in device_prefetch(strip_ids(iter(loader)), depth=prefetch):
        instr_ids = ids_fifo.pop(0)
        if random_testing:
            logits = rng.random(batch["opt_mask"].shape)
            pending.append((instr_ids, logits))
        else:
            pending.append((instr_ids, step(params, batch)))
    for instr_ids, logits in pending:
        logits = np.asarray(logits)
        for iid, row in zip(instr_ids, logits):
            all_scores.append((iid, [float(x) for x in row]))
    return all_scores


def convert_scores(all_scores, beam_path, add_exploration_path=False):
    """argmax beam -> trajectory (reference test.py:169-192)."""
    with open(beam_path) as f:
        beam_data = json.load(f)
    beams_by_id = {item["instr_id"]: item["ranked_paths"]
                   for item in beam_data}
    exploration_by_id = {}
    if add_exploration_path:
        exploration_by_id = {
            item["instr_id"]: [[vp] for vp in item["exploration_path"]]
            for item in beam_data}

    output = []
    for instr_id, scores in all_scores:
        idx = int(np.argmax(scores))
        beams = beams_by_id[instr_id]
        trajectory = []
        if add_exploration_path:
            trajectory += exploration_by_id[instr_id]
        if idx >= len(beams):
            # perturbation rows: fake a wrong destination by stopping at the
            # start viewpoint (test.py:186-188)
            trajectory = [beams[0][0]]
        else:
            trajectory += beams[idx]
        output.append({"instr_id": instr_id, "trajectory": trajectory})
    return output
