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


def build_dedup_eval_batch(cfg, bs, nc, s_t, n_u, L, boxes, seed=0):
    """Synthetic --dedup_beam_steps transport at the eval geometry: n_u
    unique (viewpoint, heading, step) pano blocks + a [nc, L] gather index
    per instruction (datasets.py:_dedup_step_features).  io_dtype-f16
    features like the real loader."""
    rng = np.random.default_rng(seed)
    dense = build_eval_batch(cfg, bs, nc, s_t, L * boxes, seed=seed)
    return {
        "instr_tokens": dense["instr_tokens"],
        "instr_mask": dense["instr_mask"],
        "segment_ids": dense["segment_ids"],
        "uniq_step_features": rng.normal(
            size=(bs, n_u, boxes, 2048)).astype(np.float16),
        "uniq_step_locations": rng.random(
            (bs, n_u, boxes, 12)).astype(np.float32),
        "uniq_step_mask": np.ones((bs, n_u, boxes), np.int32),
        "step_index": rng.integers(0, n_u,
                                   (bs, nc, L)).astype(np.int32),
        "opt_mask": np.ones((bs, nc), bool),
    }


def _visual_bytes(batch):
    return sum(v.nbytes for k, v in batch.items()
               if k.startswith(("image_", "uniq_step_", "step_index")))


def make_jitter(feat_key, feat_dtype):
    """Per-dispatch multiplicative perturbation of ``batch[feat_key]``
    that is GUARANTEED bitwise-distinct across dispatch indices.

    axon memoizes identical-input dispatches (CLAUDE.md gotcha), so every
    timed dispatch must carry distinct input bits.  A scalar uniform draw
    times a small epsilon does NOT achieve that: ``1.0 + uniform*eps``
    quantizes at 1.0 to ~2 representable factors in f16 (eps=1e-3) and
    ~8 in f32 (eps=1e-6) — INCLUDING exactly 1.0, which leaves the batch
    bitwise identical to the unjittered one.  Instead the factor is
    ``1 + (i+1)*STEP`` with STEP >= 1 ulp of the feature dtype at 1.0:
    consecutive dispatch indices map to strictly increasing representable
    factors (never exactly 1.0), so every dispatch is distinct by
    construction.  The perturbation stays numerically negligible for
    timing (<=4% of feature magnitude over a 36-dispatch run in f16,
    <<1e-4 in f32)."""
    import jax
    import jax.numpy as jnp

    step = 2.0 ** -10 if feat_dtype == jnp.float16 else 2.0 ** -20

    def _jitter(b, i):
        factor = (1.0 + (i.astype(jnp.float32) + 1.0) * step)
        return {**b, feat_key: b[feat_key] * factor.astype(feat_dtype)}

    return jax.jit(_jitter)


def time_dispatch_windows(fn, params, dbatch, jitter, n_disp=12,
                          n_windows=1, warmup_index=100_000):
    """Warmup + ``n_windows`` timed windows of ``n_disp`` pipelined
    dispatches each; every window is closed by reading back ALL results
    (on axon only readback forces execution — ``block_until_ready`` does
    not).  ``fn(params, batch)`` may be a jitted function or an AOT
    ``lower().compile()`` executable.  Dispatch indices are globally
    unique across warmup and windows so no two dispatches share input
    bits.  Returns the per-dispatch seconds of each window."""
    out = fn(params, jitter(dbatch, np.int32(warmup_index)))
    float(np.asarray(out).ravel()[0])
    dts = []
    for w in range(n_windows):
        t0 = time.perf_counter()
        outs = [fn(params, jitter(dbatch, np.int32(w * n_disp + i)))
                for i in range(n_disp)]
        for o in outs:
            float(np.asarray(o).ravel()[0])
        dts.append((time.perf_counter() - t0) / n_disp)
    return dts


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    from youtube_vln_tpu.config import lily_base_config
    from youtube_vln_tpu.evaluation.beam_eval import build_score_step
    from youtube_vln_tpu.models import init_lily_params

    ap = argparse.ArgumentParser()
    ap.add_argument("--dedup", action="store_true",
                    help="also measure the --dedup_beam_steps transport "
                         "(bytes/instruction + dispatch time + score "
                         "parity vs the dense batch)")
    ap.add_argument("--n_unique", type=int, default=120,
                    help="unique step blocks per instruction for --dedup "
                         "(dense slot count is nc*L = 240)")
    ns = ap.parse_args()

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
        jitter = make_jitter("image_features", jnp.float32)

        # AOT-compile ONCE per row and time the compiled executable —
        # the jit call-time cache and lower().compile() do NOT share
        # entries, so mixing the two pays a second full XLA compile
        compiled = step.lower(params, batch).compile()

        dt = time_dispatch_windows(compiled, params, batch, jitter)[0]
        results[f"bs{bs}"] = {
            "ms_per_dispatch": round(dt * 1000, 1),
            "beams_per_s": round(bs * nc / dt, 1),
            "instructions_per_s": round(bs / dt, 2),
        }
        # forward-path MFU from XLA's own cost model (v5e bf16 peak
        # 197 TF/s).  Same caveat as bench.py: cost_analysis counts the
        # optimized HLO and EXCLUDES pallas_call bodies (custom calls are
        # opaque), so with the fused attention kernels selected this is a
        # LOWER bound; the kernel flops are ~4*bh*s_q*s_kv*d per layer.
        try:
            cost = compiled.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            if cost and cost.get("flops", 0) > 0:
                results[f"bs{bs}"]["mfu_xla_lower_bound"] = round(
                    float(cost["flops"]) / dt / 197e12, 3)
        except Exception as e:  # noqa: BLE001 - analysis is best-effort
            print(f"# cost_analysis unavailable: {e}", file=sys.stderr)

    if ns.dedup:
        L, boxes = 8, s_v // 8
        dense = build_eval_batch(cfg, 1, nc, s_t, s_v, seed=5)
        dd = build_dedup_eval_batch(cfg, 1, nc, s_t, ns.n_unique, L, boxes,
                                    seed=5)
        # score parity: host-expand the dedup batch into a dense batch and
        # require identical scores through the same jitted scorer
        idx = dd["step_index"][0]
        exp = {**dd}
        exp["image_features"] = dd["uniq_step_features"][:, idx.reshape(-1)
                                ].reshape(1, nc, L * boxes, 2048)
        exp["image_locations"] = dd["uniq_step_locations"][
            :, idx.reshape(-1)].reshape(1, nc, L * boxes, 12)
        exp["image_mask"] = dd["uniq_step_mask"][:, idx.reshape(-1)
                            ].reshape(1, nc, L * boxes)
        for k in ("uniq_step_features", "uniq_step_locations",
                  "uniq_step_mask", "step_index"):
            del exp[k]
        s_dense = np.asarray(step(params, jax.device_put(exp)))
        s_dedup = np.asarray(step(params, jax.device_put(dd)))
        max_err = float(np.abs(s_dense - s_dedup).max())
        assert max_err < 1e-2, max_err   # bf16 forward; exact on f32

        ddev = jax.device_put(dd)
        jitter_d = make_jitter("uniq_step_features", jnp.float16)
        # AOT like the dense rows: the jit call path adds per-dispatch
        # Python/pytree overhead that would bias the dense-vs-dedup
        # comparison.  (Costs one extra compile — the jit cache used by
        # the parity checks above and lower().compile() do NOT share
        # entries — but an honest comparison is worth ~40 s of compile.)
        compiled_d = step.lower(params, ddev).compile()
        dt = time_dispatch_windows(compiled_d, params, ddev, jitter_d)[0]
        # byte comparison on equal footing: the real loader ships f16
        # features either way (io_dtype), locations/masks as emitted
        dense_b = _visual_bytes({**dense, "image_features":
                                 dense["image_features"].astype(np.float16)})
        dd_b = _visual_bytes(dd)
        results["dedup_bs1"] = {
            "ms_per_dispatch": round(dt * 1000, 1),
            "beams_per_s": round(nc / dt, 1),
            "n_unique": ns.n_unique,
            "visual_bytes_per_instruction_dense": dense_b,
            "visual_bytes_per_instruction_dedup": dd_b,
            "transport_saving": round(1.0 - dd_b / dense_b, 3),
            "score_parity_max_err": max_err,
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
