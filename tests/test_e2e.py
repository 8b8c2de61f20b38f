"""End-to-end entry-point tests on synthetic fixtures (CPU).

Covers the full reference workflow: pretrain -> fine-tune -> beam eval ->
metrics, all through the real CLI surfaces.
"""
import json
import os
from pathlib import Path

import numpy as np
import pytest

from youtube_vln_tpu.data import fixtures as F


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data_dir = root / "data"
    paths = F.build_full_fixture(data_dir)
    paths["root"] = str(root)
    return paths


GEOM = ["--max_instruction_length", "32", "--max_path_length", "4",
        "--max_num_boxes", "5", "--min_path_length", "3",
        "--min_captioned", "2", "--max_captioned", "4",
        "--num_beams", "4", "--num_beams_train", "3",
        "--compute_dtype", "float32", "--num_epochs", "2",
        "--learning_rate", "1e-4", "--batch_size", "2", "--num_workers", "0"]


def require(env, key, producer):
    """This module is an intentional workflow chain (pretrain -> train ->
    eval); downstream tests consume upstream artifacts via the module
    fixture.  Under `-k` selection or reordering the producer may not have
    run — skip loudly instead of KeyError-ing."""
    if key not in env:
        pytest.skip(f"needs {key!r} from {producer} — run the full module")
    return env[key]


def common_flags(env):
    return GEOM + [
        "--data_dir", env["data_dir"],
        "--bert_tokenizer", env["vocab_path"],
        "--config_file", env["config_file"],
        "--from_pretrained", "",
        "--output_dir", str(Path(env["root"]) / "result"),
        "--img_feature", env["pano_store"],
        "--ytb_feature", env["ytb_store"],
        "--skeleton_path", env["skeleton_path"],
    ]


def test_pretrain_entry(env):
    from conftest import load_entry
    pretrain = load_entry('pretrain')
    best = pretrain.main(common_flags(env) + [
        "--pre_dataset", "ytb", "--prefix", "merge+",
        "--masked_vision", "--masked_language", "--ranking", "--traj_judge",
        "--save_epochs", "1", "--save_name", "pre"])
    assert "ranking" in best and 0.0 <= best["ranking"] <= 1.0
    result_dir = Path(env["root"]) / "result" / "pre"
    ckpts = list(result_dir.glob("data/*.bin"))
    assert any("best_ranking" in c.name for c in ckpts)
    env["pretrained"] = str(next(c for c in ckpts if c.stem == "1"))


def test_checkpoint_loads_in_reference(env):
    """The .bin written by pretrain must load into the reference PyTorch
    model without errors."""
    from conftest import import_reference_vilbert
    ref = import_reference_vilbert()
    import sys
    sys.path.insert(0, "/root/reference")
    from types import SimpleNamespace
    from lily import Lily

    args = SimpleNamespace(model_name="vilbert", ranking=True,
                           traj_judge=True, masked_vision=True,
                           masked_language=True)
    cfg_json = json.load(open(env["config_file"]))
    ref_cfg = ref.BertConfig(**{k: tuple(v) if isinstance(v, list) else v
                                for k, v in cfg_json.items()})
    ref_cfg.args = args
    model = Lily(ref_cfg)

    import torch
    payload = torch.load(require(env, "pretrained", "test_pretrain_entry"),
                         map_location="cpu",
                         weights_only=False)
    missing, unexpected = model.load_state_dict(payload["model_state_dict"],
                                                strict=False)
    assert not missing, missing[:4]
    assert not unexpected, unexpected[:4]


def test_train_entry(env):
    from conftest import load_entry
    train = load_entry('train')
    best_seen, best_unseen = train.main(common_flags(env) + [
        "--ranking", "--shuffle_visual_features", "--save_name", "ft",
        "--from_pretrained", require(env, "pretrained", "test_pretrain_entry")])
    assert 0.0 <= best_seen <= 1.0 and 0.0 <= best_unseen <= 1.0
    ckpts = list((Path(env["root"]) / "result" / "ft" / "data").glob("*.bin"))
    assert any("best_unseen" in c.name for c in ckpts)
    env["finetuned"] = str(next(c for c in ckpts
                                if "best_unseen" in c.name))


def test_test_entry_and_metrics(env):
    from conftest import load_entry
    test_entry = load_entry('test')
    results_path = test_entry.main(common_flags(env) + [
        "--split", "val_unseen", "--save_name", "ev",
        "--from_pretrained", require(env, "finetuned", "test_train_entry")])
    results = json.load(open(results_path))
    assert len(results) > 0
    assert all("instr_id" in r and "trajectory" in r for r in results)

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "calc", Path(__file__).resolve().parent.parent / "scripts"
        / "calculate_metrics.py")
    calc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(calc)
    summary = calc.main([results_path, "--data_dir", env["data_dir"],
                         "--split", "val_unseen"])
    assert set(summary) == {"length", "nav_error", "oracle_success_rate",
                            "success_rate", "spl"}
    assert summary["spl"] <= summary["success_rate"] <= 1.0
    env["ev_results"] = results_path


def test_test_entry_dedup_beam_steps(env):
    """The step-dedup eval transport (DEFAULT since r5) through the full
    test.py CLI must reproduce a --no_dedup_beam_steps (reference-shaped
    dense) run bit-exactly: the loader ships unique (viewpoint, heading,
    step) blocks + a gather index, the in-graph expand feeds the encoder
    identical inputs (f32 here), and padded beams are -inf either way
    (losses.pad_packed), so scores AND trajectories are equal."""
    from conftest import load_entry
    finetuned = require(env, "finetuned", "test_train_entry")
    dedup = require(env, "ev_results", "test_test_entry_and_metrics")
    test_entry = load_entry('test')
    results_path = test_entry.main(common_flags(env) + [
        "--split", "val_unseen", "--save_name", "evdd",
        "--no_dedup_beam_steps", "--from_pretrained", finetuned])
    dense_dir, dedup_dir = (Path(results_path).parent,
                            Path(dedup).parent)
    for name in ("_scores_val_unseen.json", "_results_val_unseen.json"):
        with open(dense_dir / name) as f:
            dense = json.load(f)
        with open(dedup_dir / name) as f:
            dedup = json.load(f)
        assert dedup == dense, name


def test_northstar_rehearsal(env):
    """scripts/northstar.py — the real-data-day one-command chain
    (convert -> test.py -> calculate_metrics -> verdict) — must run green
    on fixtures: same checkpoint as the default eval run, expected values
    taken from that run's own metrics, so the rehearsal must land within
    a hair's tolerance and report PASS."""
    import importlib.util

    finetuned = require(env, "finetuned", "test_train_entry")
    prior = require(env, "ev_results", "test_test_entry_and_metrics")
    repo = Path(__file__).resolve().parent.parent

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    calc = load("calc_ns", repo / "scripts" / "calculate_metrics.py")
    expected = calc.main([prior, "--data_dir", env["data_dir"],
                          "--split", "val_unseen"])

    northstar = load("northstar", repo / "scripts" / "northstar.py")
    out = northstar.main([
        "--data_dir", env["data_dir"],
        "--img_feature", env["pano_store"],
        "--from_pretrained", finetuned,
        "--config_file", env["config_file"],
        "--bert_tokenizer", env["vocab_path"],
        "--output_dir", str(Path(env["root"]) / "result"),
        "--save_name", "northstar",
        "--split", "val_unseen",
        "--expected_sr", str(expected["success_rate"]),
        "--expected_spl", str(expected["spl"]),
        "--tolerance_pts", "0.01",   # same ckpt + deterministic f32 eval
        "--extra"] + GEOM)
    assert out["northstar"] == "PASS", out
    assert out["comparison"]["success_rate"]["within_tolerance"]
    assert out["comparison"]["spl"]["within_tolerance"]
    assert out["metrics"]["spl"] <= out["metrics"]["success_rate"]


def test_random_testing_floor(env):
    """--random_testing gives the chance-level ablation
    (reference test.py:153-154)."""
    from conftest import load_entry
    test_entry = load_entry('test')
    results_path = test_entry.main(common_flags(env) + [
        "--split", "val_unseen", "--save_name", "rnd",
        "--random_testing"])
    results = json.load(open(results_path))
    assert len(results) > 0


def test_resume(env):
    """--resume restores optimizer/epoch and continues
    (reference vilbert_init.py:44-70)."""
    from conftest import load_entry
    pretrain = load_entry('pretrain')
    best = pretrain.main(common_flags(env) + [
        "--pre_dataset", "ytb", "--prefix", "merge+", "--ranking",
        "--save_name", "res", "--save_epochs", "1", "--resume",
        "--from_pretrained", require(env, "pretrained", "test_pretrain_entry")])
    # resumed at epoch 2 with num_epochs=2 -> no training epochs run, but
    # the entry completes and returns the best dict
    assert "ranking" in best


def test_dedup_candidates_entry(env):
    """--dedup_candidates --sparse_vision_targets through the full
    pretrain CLI (dedup transport + in-graph expansion end to end)."""
    from conftest import load_entry
    pretrain = load_entry('pretrain')
    best = pretrain.main(common_flags(env) + [
        "--pre_dataset", "ytb", "--prefix", "merge+",
        "--masked_vision", "--masked_language", "--ranking",
        "--sparse_vision_targets", "--dedup_candidates",
        "--save_name", "dedup", "--save_epochs", "1"])
    assert "ranking" in best and 0.0 <= best["ranking"] <= 1.0


def test_orbax_checkpoints_entry_and_resume(env):
    """--orbax_checkpoints saves sharded checkpoints from the engine (no
    host-0 gather, no torch format) and --resume restores from the
    .orbax directory (VERDICT r2 item 4)."""
    from conftest import load_entry
    from youtube_vln_tpu.training import checkpoint as ckpt
    pretrain = load_entry('pretrain')
    best = pretrain.main(common_flags(env) + [
        "--pre_dataset", "ytb", "--prefix", "merge+", "--ranking",
        "--save_name", "orb", "--save_epochs", "1", "--orbax_checkpoints"])
    assert "ranking" in best
    result_dir = Path(env["root"]) / "result" / "orb"
    orbax_dirs = sorted((result_dir / "data").glob("*.orbax"))
    assert orbax_dirs, "no .orbax checkpoints written"
    target = next(d for d in orbax_dirs if d.name == "1.orbax")
    assert ckpt.is_orbax_checkpoint(target)

    best2 = pretrain.main(common_flags(env) + [
        "--pre_dataset", "ytb", "--prefix", "merge+", "--ranking",
        "--save_name", "orb_res", "--save_epochs", "1", "--resume",
        "--orbax_checkpoints", "--from_pretrained", str(target)])
    # resumed at epoch 2 with num_epochs=2 -> loop exits immediately but
    # the restore path (sharded template, step/epoch) ran
    assert "ranking" in best2


def test_profile_dir_writes_traces(env, tmp_path):
    """--profile_dir produces jax.profiler trace files (SURVEY §5: the
    reference has no tracing; this must not crash on short epochs)."""
    from conftest import load_entry
    pretrain = load_entry('pretrain')
    prof = tmp_path / "prof"
    pretrain.main(common_flags(env) + [
        "--pre_dataset", "ytb", "--prefix", "merge+", "--ranking",
        "--save_name", "prof", "--num_epochs", "1",
        "--profile_dir", str(prof)])
    traces = list(prof.rglob("*.trace.json.gz")) + \
        list(prof.rglob("*.xplane.pb"))
    assert traces, list(prof.rglob("*"))


def test_pretrain_bnb_entry(env):
    """BnB pretraining path (--pre_dataset bnb, Concatenate instructions)."""
    from conftest import load_entry
    pretrain = load_entry('pretrain')
    flags = [f for f in common_flags(env)]
    # swap the ytb feature store for the bnb one, drop the skeleton
    i = flags.index("--ytb_feature")
    flags[i:i + 2] = []
    i = flags.index("--skeleton_path")
    flags[i + 1] = ""
    best = pretrain.main(flags + [
        "--pre_dataset", "bnb",
        "--bnb_feature", str(Path(env["data_dir"]) / "YouTube-VLN" / "bnb"
                             / "bnb_features.vlnstore"),
        "--ranking", "--masked_language", "--save_name", "bnb_pre",
        "--num_epochs", "1"])
    assert "ranking" in best


def test_default_from_pretrained_sentinel(env):
    """Without --from_pretrained the CLI defaults to the reference's HF
    model-name sentinel 'bert-base-uncased'; the engine must init from
    scratch instead of torch.load-ing the literal string (the reference
    would download those weights; this environment has no egress)."""
    from conftest import load_entry
    pretrain = load_entry('pretrain')
    flags = [f for f in common_flags(env) if f != ""]
    flags.remove("--from_pretrained")
    best = pretrain.main(flags + [
        "--pre_dataset", "ytb", "--prefix", "merge+", "--ranking",
        "--num_epochs", "1", "--save_name", "sentinel"])
    assert "ranking" in best


def test_compilation_cache_flag(tmp_path):
    """--compilation_cache_dir must reach RunConfig and wire jax's
    persistent compilation cache (cheap pin: the flag plumbing and the
    config-update path, not an actual flagship compile)."""
    import jax
    from youtube_vln_tpu.utils.cli import parse_run_config
    from youtube_vln_tpu.training.engine import maybe_enable_compilation_cache

    cache_dir = tmp_path / "xla_cache"
    _, run_cfg = parse_run_config([
        "--ranking", "--compilation_cache_dir", str(cache_dir)])
    assert run_cfg.compilation_cache_dir == str(cache_dir)

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        maybe_enable_compilation_cache(run_cfg)
        assert jax.config.jax_compilation_cache_dir == str(cache_dir)
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 10.0
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)
