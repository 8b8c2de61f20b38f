"""Serving throughput: the test.py beam re-ranking path on the real chip.

Measures beams scored per second through the jitted ranking step
(evaluation/beam_eval.py:build_score_step — encoder forward + ranking
head + pad_packed) at the R2R eval geometry: 30 beams per instruction,
60 instruction tokens, 808 visual tokens.  Reference protocol is
batch_size=1 (one instruction per dispatch, test.py:46-49); the batched
row exists because scores are per-instruction independent, so a server
can batch instructions freely.

axon-safe: distinct input values every dispatch, pipelined, all results
read back at the end.  Prints one JSON line.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def build_eval_batch(cfg, bs, nc, s_t, s_v, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "instr_tokens": rng.integers(1, cfg.vocab_size,
                                     (bs, nc, s_t)).astype(np.int32),
        "instr_mask": np.ones((bs, nc, s_t), np.int32),
        "segment_ids": np.zeros((bs, nc, s_t), np.int32),
        "image_features": rng.normal(
            size=(bs, nc, s_v, 2048)).astype(np.float32),
        "image_locations": rng.random((bs, nc, s_v, 12)).astype(np.float32),
        "image_mask": np.ones((bs, nc, s_v), np.int32),
        "opt_mask": np.ones((bs, nc), bool),
    }


def main():
    import jax
    import jax.numpy as jnp

    from youtube_vln_tpu.config import lily_base_config
    from youtube_vln_tpu.evaluation.beam_eval import build_score_step
    from youtube_vln_tpu.models import init_lily_params

    cfg = lily_base_config(ranking=True, traj_judge=False,
                           masked_vision=False, masked_language=False,
                           compute_dtype="bfloat16",
                           use_pallas_attention=True)
    params = jax.device_put(init_lily_params(jax.random.PRNGKey(0), cfg))
    step = build_score_step(cfg)

    nc, s_t, s_v = 30, 60, 808
    results = {}
    for bs in (1, 8):
        batch = jax.device_put(build_eval_batch(cfg, bs, nc, s_t, s_v))
        # multiplicative jitter: a relative 1e-6 perturbation survives f32
        # rounding at every magnitude, so each dispatch is bitwise-distinct
        # and axon cannot memoize it (an additive 1e-12 would be absorbed
        # for O(1)-magnitude features)
        jitter = jax.jit(lambda b, key: {
            **b, "image_features": b["image_features"]
            * (1.0 + jax.random.uniform(key, (), jnp.float32) * 1e-6)})

        # warmup: compile + force a readback
        out = step(params, jitter(batch, jax.random.PRNGKey(999)))
        float(np.asarray(out).ravel()[0])

        n = 12
        t0 = time.perf_counter()
        outs = [step(params, jitter(batch, jax.random.PRNGKey(i)))
                for i in range(n)]
        for o in outs:
            float(np.asarray(o).ravel()[0])
        dt = (time.perf_counter() - t0) / n
        results[f"bs{bs}"] = {
            "ms_per_dispatch": round(dt * 1000, 1),
            "beams_per_s": round(bs * nc / dt, 1),
            "instructions_per_s": round(bs / dt, 2),
        }

    print(json.dumps({
        "metric": "serving_beams_per_s_per_chip",
        "value": results["bs1"]["beams_per_s"],
        "unit": "beams/s/chip",
        "detail": {"geometry": [nc, s_t, s_v],
                   "device": str(jax.devices()[0]), **results},
    }))


if __name__ == "__main__":
    main()
