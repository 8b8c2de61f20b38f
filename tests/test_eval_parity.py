"""Cross-stack end-to-end eval parity.

One shared random-init checkpoint, one fixture beam set, BOTH stacks:

  * reference: PanoFeaturesReader (fake lmdb) -> BeamDataset ->
    DataLoader -> torch Lily -> test.py eval_epoch/convert_scores
    (reference ``test.py:144-192``) -> ``scripts/calculate-metrics.py``
  * ours: the real ``test.py`` CLI entry (PanoFeaturesReader on the
    .vlnstore, beam_eval.eval_epoch/convert_scores) ->
    ``scripts/calculate_metrics.py``

Asserts per-instruction ranking scores within 1e-4, identical selected
trajectories, and identical SR/SPL through BOTH metric scripts (each
stack's results fed to each stack's evaluator).
"""
import importlib.util
import json
import sys
import types
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

import jax

from conftest import REFERENCE_ROOT, import_reference_vilbert, load_entry
import fake_lmdb

from youtube_vln_tpu.data import fixtures as F

GEOM = dict(max_instruction_length=32, max_path_length=4, max_num_boxes=5)


def _our_cfg(config_file):
    from youtube_vln_tpu.config import LilyConfig
    cfg_json = json.load(open(config_file))
    return LilyConfig(**{k: tuple(v) if isinstance(v, list) else v
                         for k, v in cfg_json.items()},
                      compute_dtype="float32", use_pallas_attention=False)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("evalparity")
    data_dir = root / "data"
    paths = F.build_full_fixture(data_dir)
    paths["root"] = str(root)
    paths["pano_lmdb"] = fake_lmdb.store_to_lmdb_pickle(
        paths["pano_store"], root / "pano_lmdb.pkl")

    # one shared checkpoint, written in the reference .bin layout
    from youtube_vln_tpu.models import init_lily_params
    from youtube_vln_tpu.models.torch_io import save_torch_checkpoint
    cfg = _our_cfg(paths["config_file"])
    params = init_lily_params(jax.random.PRNGKey(7), cfg)
    ckpt = root / "shared.bin"
    save_torch_checkpoint(str(ckpt), params, cfg, extra={"epoch": 0})
    paths["ckpt"] = str(ckpt)
    return paths


def _run_ours(env):
    """Our stack through the real CLI entry; returns (scores, results)."""
    test_entry = load_entry("test")
    flags = [
        "--max_instruction_length", str(GEOM["max_instruction_length"]),
        "--max_path_length", str(GEOM["max_path_length"]),
        "--max_num_boxes", str(GEOM["max_num_boxes"]),
        "--num_beams", "4", "--compute_dtype", "float32", "--num_workers",
        "0", "--data_dir", env["data_dir"],
        "--bert_tokenizer", env["vocab_path"],
        "--config_file", env["config_file"],
        "--img_feature", env["pano_store"],
        "--output_dir", str(Path(env["root"]) / "result"),
        "--from_pretrained", env["ckpt"],
        "--split", "val_unseen", "--save_name", "parity",
    ]
    results_path = test_entry.main(flags)
    scores_path = Path(results_path).parent / "_scores_val_unseen.json"
    scores = {iid: s for iid, s in json.load(open(scores_path))}
    results = json.load(open(results_path))
    return scores, results


def _run_reference(env, monkeypatch):
    """The reference PyTorch eval loop, verbatim components."""
    import torch

    # import the real transformers/requests stack BEFORE the conftest
    # installs its bare "requests" stub for the reference's file_utils
    try:
        import requests  # noqa: F401
    except ImportError:
        pass
    from transformers import BertTokenizer

    import_reference_vilbert()        # sys.path + boto3/requests stubs
    fake_lmdb.install()
    # the reference targets python 3.6: restore inspect.ArgSpec (removed in
    # 3.11; dead import at all_dataset.py:1)
    import collections
    import inspect
    if not hasattr(inspect, "ArgSpec"):
        inspect.ArgSpec = collections.namedtuple(
            "ArgSpec", "args varargs keywords defaults")
    sys.modules.setdefault("pyfiglet", types.ModuleType("pyfiglet"))
    sys.modules["pyfiglet"].figlet_format = lambda *a, **k: ""
    if "argtyped" not in sys.modules:   # gen_instructions4train.py:7
        argtyped = types.ModuleType("argtyped")

        class _Arguments:
            def __init_subclass__(cls, **kwargs):
                pass

        argtyped.Arguments = _Arguments
        sys.modules["argtyped"] = argtyped
    # relative data/ paths inside the reference loaders
    monkeypatch.chdir(env["root"])
    # the reference eval loop calls .cuda(); this box is CPU-only
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=True)

    # drop tokenizer caches our stack may have written so the reference
    # tokenizes independently
    for p in Path(env["data_dir"], "task").glob("*_tokenized_*.json"):
        p.unlink()

    tokenizer = BertTokenizer(vocab_file=env["vocab_path"])

    from utils.dataset.features_reader import PanoFeaturesReader
    from utils.dataset.dataset_init import load_BeamDataset
    reader = PanoFeaturesReader(env["pano_lmdb"])

    args = SimpleNamespace(
        batch_size=1, gradient_accumulation_steps=1, num_beams=1,
        num_beams_train=4, ranking=True, traj_judge=False,
        not_traj_judge_data=False, num_negatives=2,
        masked_vision=False, masked_language=False,
        shuffle_visual_features=False, random_testing=False,
        r2r_prefix="", beam_prefix="", num_workers=0, **GEOM)
    dataset = load_BeamDataset("val_unseen", args, tokenizer, reader,
                               default_gpu=True, Train=False)
    from torch.utils.data import DataLoader
    loader = DataLoader(dataset, shuffle=False, batch_size=1, num_workers=0)

    # reference Lily with the shared checkpoint
    ref = sys.modules["vilbert.vilbert"]
    from lily import Lily
    cfg_json = json.load(open(env["config_file"]))
    ref_cfg = ref.BertConfig(**{k: tuple(v) if isinstance(v, list) else v
                                for k, v in cfg_json.items()})
    ref_cfg.args = SimpleNamespace(model_name="vilbert", ranking=True,
                                   traj_judge=False, masked_vision=False,
                                   masked_language=False, num_negatives=2)
    model = Lily(ref_cfg)
    payload = torch.load(env["ckpt"], map_location="cpu", weights_only=False)
    missing, unexpected = model.load_state_dict(payload["model_state_dict"],
                                                strict=False)
    assert not missing and not unexpected, (missing[:4], unexpected[:4])
    model.eval()

    # the reference test.py module itself (hyphen-safe file import; the
    # top-level name "test" collides with our entry)
    spec = importlib.util.spec_from_file_location(
        "ref_test_entry", REFERENCE_ROOT / "test.py")
    ref_test = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_test)

    with torch.no_grad():
        ref_scores = ref_test.eval_epoch(model, loader, args)
    ref_results = ref_test.convert_scores(
        ref_scores, f"data/beamsearch/beams_val_unseen.json")
    return {iid: s for iid, s in ref_scores}, ref_results


def _ref_metrics(results_path):
    spec = importlib.util.spec_from_file_location(
        "ref_calc_metrics", REFERENCE_ROOT / "scripts"
        / "calculate-metrics.py")
    calc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(calc)
    ev = calc.Evaluation(["val_unseen"])
    summary, _ = ev.score(str(results_path))
    return summary


def _our_metrics(results_path, data_dir):
    spec = importlib.util.spec_from_file_location(
        "our_calc_metrics", Path(__file__).resolve().parent.parent
        / "scripts" / "calculate_metrics.py")
    calc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(calc)
    return calc.main([str(results_path), "--data_dir", str(data_dir),
                      "--split", "val_unseen"])


def test_eval_parity_cross_stack(env, monkeypatch):
    our_scores, our_results = _run_ours(env)
    ref_scores, ref_results = _run_reference(env, monkeypatch)

    # 1. same instruction coverage, ranking scores within 1e-4
    assert set(our_scores) == set(ref_scores)
    for iid in sorted(ref_scores):
        np.testing.assert_allclose(our_scores[iid], ref_scores[iid],
                                   atol=1e-4, err_msg=iid)

    # 2. identical selected trajectories
    ours_by_id = {r["instr_id"]: r["trajectory"] for r in our_results}
    refs_by_id = {r["instr_id"]: r["trajectory"] for r in ref_results}
    assert ours_by_id == refs_by_id

    # 3. metric-script cross-check: each results file through BOTH
    # evaluators; SR/SPL identical everywhere
    root = Path(env["root"])
    ref_results_path = root / "ref_results_val_unseen.json"
    json.dump(ref_results, open(ref_results_path, "w"))
    our_results_path = root / "our_results_val_unseen.json"
    json.dump(our_results, open(our_results_path, "w"))

    monkeypatch.chdir(env["root"])  # reference evaluator uses data/ paths
    summaries = [
        _ref_metrics(ref_results_path),
        _ref_metrics(our_results_path),
        _our_metrics(ref_results_path, env["data_dir"]),
        _our_metrics(our_results_path, env["data_dir"]),
    ]
    # our script rounds to 4 decimals (like the reference CLI's eval());
    # compare at that precision
    base = summaries[0]
    for s in summaries[1:]:
        for k in ("success_rate", "spl", "oracle_success_rate",
                  "nav_error", "length"):
            assert round(float(s[k]), 4) == round(float(base[k]), 4), \
                (k, s, base)
