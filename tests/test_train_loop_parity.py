"""Cross-stack fine-tune LOOP parity: the reference train.py epoch driven
LIVE against our Engine on the same fixture, same checkpoint, same draws.

Both stacks run ONE fine-tune epoch end to end, in three recipes: R2R
beam re-ranking (the 30RS shape: ranking task + shuffled-visual free
negatives), the combined ranking+traj_judge recipe (same item assembly —
all_dataset.py:593 keeps the judge DATA branch off when ranking is on —
plus the scaled judge loss, utils_init.py:223), and judge-ONLY (the
judge data branch live: positive + shuffle-type-1/2/3 negatives incl.
other-scan step replacements and per-step heading-chain draws,
all_dataset.py:790-877; shuffle_visual_features must be off per the XOR
rule, and the reference skips validation when ranking is off):

  * reference: BeamDataset(Train=True) -> DataLoader ->
    ``utils_init.train_epoch`` (torch Lily + AdamW + WarmupLinearSchedule,
    reference train.py:109-121) then ``utils_init.val_epoch`` on
    val_seen/val_unseen (train.py:135-188)
  * ours: the real ``Engine`` (engine.train_epoch + engine.evaluate) with
    its loader swapped for a shuffle-off one

and must produce the same per-step ``loss/train`` trajectory, the same
val success rates and val losses, and near-identical final parameters.

RNG alignment: our Loader seeds the dataset PER ITEM
(``loader._item_seed`` — so num_workers never changes the data); the
reference draws from the continuous global ``random`` / ``np.random``
streams.  The test aligns them by (a) overriding our dataset's ``reseed``
to hand out ``np.random.RandomState`` (MT19937, the legacy global
generator) instead of PCG64, and (b) wrapping the reference dataset so
each ``__getitem__`` first seeds the global streams with the SAME
per-item seed.  Within one item both sides make identical draw sequences
(positive ``choice``, negative ``choice``, then the shuffler —
all_dataset.py:717-748 vs datasets.py:_select_training_paths), and the
shufflers are draw-for-draw identical at fixture path length
(sampling.py:34-64 keeps the reference's exhaustive behavior for n<=6),
so per-item seeding makes the items bit-identical.

Dropout is zeroed through the config on both sides (plus the reference
Lily's hard-coded fused-pool ``model.dropout`` — lily.py ctor), so the
trajectories are deterministic.
"""
import json
import random
import sys
import types
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

import jax

from conftest import prepare_reference_runtime
import fake_lmdb
from loop_parity_common import (ScalarWriter, assert_final_params_close,
                                assert_params_moved, reference_adamw)

from youtube_vln_tpu.data import fixtures as F
from youtube_vln_tpu.data.loader import Loader, _item_seed

SEED = 123
LR = 1e-3
BS = 2
# non-trivial scale so the combined recipe pins the traj_loss_scale
# wiring: both stacks LOG unscaled per-task losses but BACKPROP the
# scaled sum (utils_init.py:223-228 vs losses.py:compute_task_losses),
# so a wrong scale shows up in the final-params check
TRAJ_SCALE = 0.7
GEOM = dict(max_instruction_length=32, max_path_length=4, max_num_boxes=5)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("trainloop")
    data_dir = root / "data"
    paths = F.build_full_fixture(data_dir)
    paths["root"] = str(root)
    paths["pano_lmdb"] = fake_lmdb.store_to_lmdb_pickle(
        paths["pano_store"], root / "pano_lmdb.pkl")

    # zero-dropout config (deterministic trajectories on both stacks)
    cfg_json = json.load(open(paths["config_file"]))
    cfg_json.update(hidden_dropout_prob=0.0,
                    attention_probs_dropout_prob=0.0,
                    v_hidden_dropout_prob=0.0,
                    v_attention_probs_dropout_prob=0.0)
    nodrop = Path(paths["config_file"]).with_name("tiny_nodrop.json")
    json.dump(cfg_json, open(nodrop, "w"))
    paths["nodrop_config"] = str(nodrop)

    # one shared random-init checkpoint in the reference .bin layout
    from youtube_vln_tpu.config import LilyConfig
    from youtube_vln_tpu.models import init_lily_params
    from youtube_vln_tpu.models.torch_io import save_torch_checkpoint
    cfg = LilyConfig(**{k: tuple(v) if isinstance(v, list) else v
                        for k, v in cfg_json.items()},
                     fusion_dropout_prob=0.0, compute_dtype="float32",
                     use_pallas_attention=False)
    params = init_lily_params(jax.random.PRNGKey(7), cfg)
    ckpt = root / "shared.bin"
    save_torch_checkpoint(str(ckpt), params, cfg, extra={"epoch": 0})
    paths["ckpt"] = str(ckpt)
    paths["cfg"] = cfg
    return paths


def _run_ours(env, recipe):
    import dataclasses

    from youtube_vln_tpu.config import RunConfig
    from youtube_vln_tpu.models.torch_io import params_to_state_dict
    from youtube_vln_tpu.training.engine import Engine

    ranking, traj_judge = recipe != "judge-only", recipe != "ranking"
    args = RunConfig(
        # judge-only fine-tune REQUIRES shuffle off (the XOR rule,
        # utils_init.py:19) — its negatives come from the judge data
        # branch (shuffle types 1-3, other-scan replacements)
        pretrain=False, ranking=ranking, shuffle_visual_features=ranking,
        traj_judge=traj_judge, traj_loss_scale=TRAJ_SCALE,
        num_negatives=2, num_beams=4, num_beams_train=4,
        batch_size=BS, gradient_accumulation_steps=1,
        learning_rate=LR, num_epochs=1, warmup_proportion=0.2,
        cooldown_factor=2.0, weight_decay=1e-2, seed=SEED,
        num_workers=0, compute_dtype="float32",
        io_dtype="float32", use_pallas_attention=False,
        data_dir=env["data_dir"], img_feature=env["pano_store"],
        bert_tokenizer=env["vocab_path"], config_file=env["nodrop_config"],
        from_pretrained=env["ckpt"], **GEOM)
    cfg = dataclasses.replace(env["cfg"], ranking=ranking,
                              traj_judge=traj_judge)
    engine = Engine(args, cfg)
    try:
        # shuffle-off loader with the SAME length (schedule t_total was
        # derived from the original drop_last=True loader at init)
        steps = len(engine.train_loader)
        engine.train_loader = Loader(engine.train_ds, BS, shuffle=False,
                                     seed=SEED, num_workers=0,
                                     drop_last=True)
        assert len(engine.train_loader) == steps

        # per-item reseed with the LEGACY MT19937 generator so the np
        # draws match the reference's global np.random stream
        def _reseed_mt(self, s):
            self.rng.seed(s)
            self.np_rng = np.random.RandomState(s)

        engine.train_ds.reseed = types.MethodType(_reseed_mt,
                                                  engine.train_ds)

        aliased_items = [0]
        if recipe == "judge-only":
            # Replicate the reference's shuffle-type-3 ALIASING BUG
            # (all_dataset.py:849 shallow-copies path_features[0], so all
            # candidates share the inner step lists and end up with
            # IDENTICAL features — see MIGRATION.md).  Our production
            # branch replaces steps per candidate; this shim rebuilds the
            # reference's shared final state so the loop stays
            # draw-for-draw and tensor-for-tensor comparable.
            ds = engine.train_ds
            orig_tj = ds._traj_judge_features

            def tj_aliased(scan_id, heading, selected_paths, vln_index):
                state = ds.rng.getstate()
                shuffle_type = ds.rng.randint(1, 3)
                ds.rng.setstate(state)       # rewind; orig re-draws it
                out = orig_tj(scan_id, heading, selected_paths, vln_index)
                if shuffle_type == 3:
                    aliased_items[0] += 1
                    shared = list(out[0])
                    for neg in out[1:]:      # replacements in draw order
                        for i, st in enumerate(neg):
                            if st is not out[0][i]:
                                shared[i] = st
                    out = [list(shared) for _ in out]
                return out

            ds._traj_judge_features = tj_aliased

        rec = []
        orig = engine._train_step

        def wrapped(state, batch, rng):
            state, m = orig(state, batch, rng)
            rec.append(m)
            return state, m

        engine._train_step = wrapped
        engine.train_epoch(0)
        keys = (["loss/train"] + (["loss/ranking"] if ranking else [])
                + (["loss/traj"] if traj_judge else []))
        series = {k: [float(m[k]) for m in rec] for k in keys}
        # the reference runs validation only when args.ranking
        # (train.py:137)
        val = ({t: engine.evaluate(t) for t in ("val_seen", "val_unseen")}
               if ranking else None)
        if recipe == "judge-only":
            # the shim must have fired or the aliasing parity is vacuous
            assert aliased_items[0] > 0
        sd = params_to_state_dict(
            jax.tree_util.tree_map(np.asarray, engine.state.params), cfg)
        return series, val, sd, steps
    finally:
        engine.close()


def _run_reference(env, monkeypatch, recipe):
    import torch

    ranking, traj_judge = recipe != "judge-only", recipe != "ranking"

    prepare_reference_runtime()   # stubs + real requests + ArgSpec shim
    from transformers import BertTokenizer

    monkeypatch.chdir(env["root"])
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=True)

    # force independent tokenization (our stack cached *_tokenized_*.json)
    for p in Path(env["data_dir"], "task").glob("*_tokenized_*.json"):
        p.unlink()

    tokenizer = BertTokenizer(vocab_file=env["vocab_path"])
    from utils.dataset.features_reader import PanoFeaturesReader
    from utils.dataset.dataset_init import load_BeamDataset
    reader = PanoFeaturesReader(env["pano_lmdb"])

    args = SimpleNamespace(
        batch_size=BS, gradient_accumulation_steps=1,
        num_beams=4, num_beams_train=4, pretrain=False,
        ranking=ranking, traj_judge=traj_judge, not_traj_judge_data=False,
        masked_vision=False, masked_language=False, num_negatives=2,
        shuffle_visual_features=ranking, ground_truth_trajectory=False,
        random_testing=False, r2r_prefix="", beam_prefix="",
        num_workers=0, local_rank=-1, world_size=1,
        skip_all_reduce=True, traj_loss_scale=TRAJ_SCALE, **GEOM)

    train_ds = load_BeamDataset("train", args, tokenizer, reader, True,
                                Train=True)

    class _Seeded(torch.utils.data.Dataset):
        """Seed the global RNG streams per item with the same seeds our
        Loader hands the dataset (loader.py:_item_seed, epoch 0)."""

        def __init__(self, ds):
            self.ds = ds

        def __len__(self):
            return len(self.ds)

        def __getitem__(self, i):
            s = _item_seed(SEED, 0, int(i))
            random.seed(s)
            np.random.seed(s)
            return self.ds[i]

    from torch.utils.data import DataLoader
    train_loader = DataLoader(_Seeded(train_ds), shuffle=False,
                              batch_size=BS, num_workers=0, drop_last=True)
    val_loaders = {
        t: DataLoader(load_BeamDataset(t, args, tokenizer, reader, True,
                                       Train=False),
                      shuffle=False, batch_size=BS, num_workers=0)
        for t in ("val_seen", "val_unseen")} if ranking else {}

    # reference Lily with the shared checkpoint, dropout fully off
    ref = sys.modules["vilbert.vilbert"]
    from lily import Lily
    cfg_json = json.load(open(env["nodrop_config"]))
    ref_cfg = ref.BertConfig(**{k: tuple(v) if isinstance(v, list) else v
                                for k, v in cfg_json.items()})
    ref_cfg.args = SimpleNamespace(model_name="vilbert", ranking=ranking,
                                   traj_judge=traj_judge, masked_vision=False,
                                   masked_language=False, num_negatives=2)
    model = Lily(ref_cfg)
    payload = torch.load(env["ckpt"], map_location="cpu",
                         weights_only=False)
    missing, unexpected = model.load_state_dict(
        payload["model_state_dict"], strict=False)
    assert not missing and not unexpected, (missing[:4], unexpected[:4])
    model.train()
    model.dropout.p = 0.0  # Lily's fused-pool dropout is a literal 0.1

    # optimizer + schedule: the same numbers our make_schedule derives
    # (optimization.py:110-129) fed to the reference classes
    from vilbert.optimization import WarmupLinearSchedule
    opt = reference_adamw(model, LR)
    t_total = float(len(train_loader))         # 1 epoch
    warmup = 0.2 * t_total
    adjusted = warmup + 2.0 * (t_total - warmup)
    sched = WarmupLinearSchedule(opt, warmup_steps=warmup, t_total=adjusted)

    from utils.misc import NoneLogger
    from utils.utils_init import train_epoch, val_epoch

    w = ScalarWriter()
    log = NoneLogger()
    train_epoch(0, model, opt, sched, train_loader, w, True, args, log)
    keys = (["loss/train"] + (["loss/ranking"] if ranking else [])
            + (["loss/traj"] if traj_judge else []))
    ref_series = {k: w.scalars[k] for k in keys}

    srs, vls = {}, {}
    with torch.no_grad():
        for t in val_loaders:
            sr = val_epoch(0, model, t, val_loaders[t], w, True, args, 0,
                           log, "ranking")
            srs[t] = float(sr)
            vls[t] = w.scalars[f"loss/ranking_{t}"][-1]
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    init_sd = {k: np.asarray(v) for k, v in
               payload["model_state_dict"].items()}
    return ref_series, srs, vls, sd, init_sd


@pytest.mark.parametrize("recipe",
                         ["ranking", "ranking+judge", "judge-only"])
def test_finetune_loop_parity(env, monkeypatch, recipe):
    ranking, traj_judge = recipe != "judge-only", recipe != "ranking"
    our_series, our_val, our_sd, steps = _run_ours(env, recipe)
    (ref_series, ref_srs, ref_vls, ref_sd,
     init_sd) = _run_reference(env, monkeypatch, recipe)

    # 1. same step count, same per-step per-task loss trajectories.
    # Documented deviation (MIGRATION.md): a batch whose every ranking
    # target is the -1 ignore index yields CE = NaN in the reference
    # (0/0 normalization; gradients are still zero) and 0.0 here
    # (safe division).  The fixture seed produces exactly one such batch
    # — assert the mapping instead of skipping it, and require the
    # trajectories to re-converge exactly afterwards (they do: both
    # stacks step the optimizer with zero gradients there).  The traj
    # series is NaN-free (its targets don't depend on the ranking
    # target) and must match everywhere.
    assert set(our_series) == set(ref_series)
    assert all(len(s) == steps for s in our_series.values())
    assert all(len(s) == steps for s in ref_series.values())
    assert ref_series["loss/train"][0] > 0.05      # non-vacuous batches
    # judge-only has no ranking CE, hence no NaN-able series
    nan_steps = (np.isnan(np.asarray(ref_series["loss/ranking"]))
                 if ranking else np.zeros(steps, bool))
    for k in our_series:
        ref_arr = np.asarray(ref_series[k])
        our_arr = np.asarray(our_series[k])
        if k == "loss/traj":
            assert not np.isnan(ref_arr).any()
            np.testing.assert_allclose(our_arr, ref_arr, rtol=2e-3,
                                       err_msg=k)
            continue
        np.testing.assert_array_equal(np.isnan(ref_arr), nan_steps, k)
        # at the NaN step ours drops only the ranking term
        expect_nan = (np.asarray(our_series["loss/traj"])[nan_steps]
                      if traj_judge and k == "loss/train" else 0.0)
        np.testing.assert_allclose(our_arr[nan_steps], expect_nan,
                                   rtol=1e-6, err_msg=k)
        np.testing.assert_allclose(
            our_arr[~nan_steps], ref_arr[~nan_steps], rtol=2e-3,
            err_msg=f"{k}: ours={our_arr} ref={ref_arr}")

    # 2. val_epoch: identical success rates, matching val losses (the
    # reference validates only when args.ranking — train.py:137)
    for t in (("val_seen", "val_unseen") if ranking else ()):
        assert abs(our_val[t]["accuracy/ranking"] - ref_srs[t]) < 1e-6, \
            (t, our_val[t], ref_srs[t])
        np.testing.assert_allclose(our_val[t]["loss/ranking"], ref_vls[t],
                                   rtol=2e-3, err_msg=t)

    # 3. final parameters (tolerance rationale: loop_parity_common)
    assert_final_params_close(our_sd, ref_sd)

    # 4. the epoch actually trained: parameters moved from the shared init
    assert_params_moved(ref_sd, init_sd)
