"""Cross-stack PRETRAIN loop parity: the reference train_epoch/test_epoch
driven LIVE against our Engine on the same YTb fixture, checkpoint, and
per-item draws.

Both stacks run ONE pretraining epoch (MLM + MVM + ranking, gradient
accumulation 2) end to end, parametrized over both pretraining dataset
families — YouTube house tours (template-rephrase instructions) and
Airbnb listings (concatenate instructions, tokenized-caption cache) —
plus the negative_style="shuffle_instruction" recipe (image-negatives
become instruction-side, common.py:524-541).

Alignment caveat: the reference's ``random_fill`` mutates its fillers
list IN PLACE across an item's negatives while ours passes a fresh copy
(the documented memoryless-shuffle deviation) — the two only produce
bit-identical items when per-path captionless filler sets are too small
for cumulative shuffling to reorder them, which holds at this fixture's
geometry (the test would fail loudly, not silently, if that changed).

  * reference: YTbDataset -> DataLoader -> ``utils_init.train_epoch``
    (torch Lily + AdamW + WarmupLinearSchedule, reference pretrain.py:113)
    then ``utils_init.test_epoch`` on the frozen testset split
    (pretrain.py:126-138)
  * ours: the real ``Engine`` (engine.train_epoch + engine.evaluate) with
    its loader swapped for a shuffle-off one

and must produce matching per-microbatch task-loss trajectories (ours
logs per OPTIMIZER step, averaged over the accumulation pack — compared
against the pairwise mean of the reference's per-microbatch scalars),
matching testset ranking loss/success-rate, and near-identical final
parameters.

RNG alignment (three independent streams):

  * python ``random`` — trajectory sampling, negatives, template
    insertion, instruction generation.  Our dataset draws from
    ``self.rng`` (an MT19937 ``random.Random``); the reference draws from
    the global ``random`` module.  Per-item seeding aligns them (the
    samplers/generators are exact-sequence parity-pinned by
    tests/test_sampling_parity.py).  One deviation needs compensation:
    the reference BaseDataset.__getitem__ draws
    ``random.choice(self._build_instructions)`` per item
    (all_dataset.py:182) — a 1-element list, but ``_randbelow(1)`` still
    consumes getrandbits(1) until it sees a 0 — so our side burns the
    identical draw right before the item's first instruction (see
    ``_burned`` below).
  * torch — BERT-style token/region masking (common.py:213-300 uses
    torch.rand_like / randint_like).  Our np masking implementations are
    same-draws-equality pinned (tests/test_masking.py) but consume a
    DIFFERENT generator, so for the live loop our dataset's masking hooks
    are swapped for shims that call the reference torch functions
    directly; per-item ``torch.manual_seed`` on both sides makes the
    masks bit-identical.
  * numpy — unused in this recipe (mask_action_rate=0 keeps
    np.random.choice out of randomize_tokens).

Dropout is zeroed through the config on both sides (plus the reference
Lily's hard-coded fused-pool dropout), so the runs are deterministic.
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

SEED = 321
LR = 1e-3
BS = 4           # global batch; accumulation 2 -> microbatch 2
ACCUM = 2
N_VIDEOS = 24    # -> 6 optimizer steps (drop_last packs of 4)
GEOM = dict(max_instruction_length=32, max_path_length=4, max_num_boxes=5)
SAMPLING = dict(min_path_length=3, min_captioned=2, max_captioned=4,
                num_negatives=2)

TINY_CFG = dict(
    vocab_size=256, hidden_size=32, num_hidden_layers=4,
    num_attention_heads=4, intermediate_size=64,
    v_feature_size=2048, v_target_size=1601, v_hidden_size=48,
    v_num_hidden_layers=2, v_num_attention_heads=4,
    v_intermediate_size=48, bi_hidden_size=48, bi_num_attention_heads=4,
    v_biattention_id=[0, 1], t_biattention_id=[2, 3],
    max_position_embeddings=64,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    v_hidden_dropout_prob=0.0, v_attention_probs_dropout_prob=0.0)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("pretrainloop")
    data_dir = root / "data"
    paths = {
        "ytb": dict(F.build_ytb_fixture(data_dir / "YouTube-VLN" / "ytb",
                                        n_videos=N_VIDEOS, seed=0)),
        "bnb": dict(F.build_bnb_fixture(data_dir / "YouTube-VLN" / "bnb",
                                        n_listings=N_VIDEOS, seed=0)),
    }
    paths["root"] = str(root)
    paths["data_dir"] = str(data_dir)
    for kind in ("ytb", "bnb"):
        paths[kind]["lmdb"] = fake_lmdb.store_to_lmdb_pickle(
            paths[kind]["store_path"], root / f"{kind}_lmdb.pkl",
            pano=False)

    # the shuffle_instruction kind reuses the ytb fixture but needs its
    # own frozen testset at the style-prefixed path (dataset_init.py:
    # get_testset_path prepends the negative_style)
    from youtube_vln_tpu.data.datasets import YTbDataset as OurYTb
    from youtube_vln_tpu.data.features_reader import \
        YTbFeaturesReader as OurYTbReader
    from youtube_vln_tpu.data.tokenizer import WordPieceTokenizer
    si = dict(paths["ytb"])
    si_args = F._default_args(skeleton_path=si["skeleton_path"],
                              negative_style="shuffle_instruction")
    si_reader = OurYTbReader(si["store_path"])
    si_ds = OurYTb(args=si_args, caption_path=si["caption_path"],
                   tokenizer=WordPieceTokenizer.from_vocab_file(
                       si["vocab_path"]),
                   features_reader=si_reader, masked_vision=False,
                   masked_language=False, training=True, seed=0)
    si_testset = {vid: list(si_ds.pick_photo_ids(vid))
                  for vid in si_ds.listing_ids}
    si_reader.close()
    si_testset_path = (data_dir / "YouTube-VLN" / "ytb"
                       / "merge+shuffle_instruction_testset.json")
    json.dump(si_testset, open(si_testset_path, "w"))
    si["testset_path"] = str(si_testset_path)
    paths["ytb-shufinstr"] = si

    cfg_path = root / "tiny_nodrop.json"
    json.dump(TINY_CFG, open(cfg_path, "w"))
    paths["nodrop_config"] = str(cfg_path)

    # one shared random-init checkpoint in the reference .bin layout
    from youtube_vln_tpu.config import LilyConfig
    from youtube_vln_tpu.models import init_lily_params
    from youtube_vln_tpu.models.torch_io import save_torch_checkpoint
    cfg = LilyConfig(**{k: tuple(v) if isinstance(v, list) else v
                        for k, v in TINY_CFG.items()},
                     masked_vision=True, masked_language=True,
                     fusion_dropout_prob=0.0, compute_dtype="float32",
                     use_pallas_attention=False)
    params = init_lily_params(jax.random.PRNGKey(11), cfg)
    ckpt = root / "shared.bin"
    save_torch_checkpoint(str(ckpt), params, cfg, extra={"epoch": 0})
    paths["ckpt"] = str(ckpt)
    paths["cfg"] = cfg
    return paths


def _align_rng(ds):
    """Per-item RNG alignment for one of OUR datasets: reseed seeds the
    python stream (matching the reference's global random.seed) and the
    torch stream (consumed by the masking shims), and arms the
    one-per-item burn of the reference's build_instructions choice draw
    (all_dataset.py:182)."""
    import torch

    orig_gen = ds.generate_instruction

    def reseed(self, s):
        self.rng.seed(s)
        torch.manual_seed(s)
        self._burned = False

    def gen(traj):
        if not ds._burned:
            ds.rng.choice([None])    # reference's 1-element random.choice
            ds._burned = True
        return orig_gen(traj)

    ds.reseed = types.MethodType(reseed, ds)
    ds.generate_instruction = gen


def _install_masking_shims(monkeypatch):
    """Back our dataset's masking hooks with the LIVE reference torch
    functions (drawing from the torch global stream seeded per item)."""
    import torch

    ref_common = prepare_reference_runtime()

    import youtube_vln_tpu.data.datasets as D

    def regions_shim(features, probs, mask, rng, copy=True):
        f = torch.from_numpy(np.ascontiguousarray(features, np.float32))
        pr = torch.from_numpy(np.ascontiguousarray(probs, np.float32))
        m = torch.from_numpy(np.ascontiguousarray(mask)).long()
        f2, t, tm = ref_common.randomize_regions(f, pr, m)
        return (f2.numpy().astype(features.dtype),
                t.numpy().astype(probs.dtype),
                tm.numpy().astype(mask.dtype))

    class _VocabDuck:
        def __init__(self, n, mask_id):
            self.n, self.mask_id = n, mask_id

        def __len__(self):
            return self.n

        def __getitem__(self, key):
            assert key == "[MASK]", key
            return self.mask_id

    def tokens_shim(tokens, mask, vocab_size, mask_token_id, rng,
                    mask_action_rate=0.0, action_token_ids=()):
        duck = SimpleNamespace(vocab=_VocabDuck(vocab_size, mask_token_id))
        args = SimpleNamespace(mask_action_rate=mask_action_rate)
        t = torch.from_numpy(np.ascontiguousarray(tokens, np.int64))
        m = torch.from_numpy(np.ascontiguousarray(mask, np.int64))
        t2, tg = ref_common.randomize_tokens(t, m, duck, args)
        return (t2.numpy().astype(tokens.dtype),
                tg.numpy().astype(tokens.dtype))

    monkeypatch.setattr(D, "randomize_regions_np", regions_shim)
    monkeypatch.setattr(D, "randomize_tokens_np", tokens_shim)


def _run_ours(env, kind, monkeypatch):
    from youtube_vln_tpu.config import RunConfig
    from youtube_vln_tpu.models.torch_io import params_to_state_dict
    from youtube_vln_tpu.training.engine import Engine

    _install_masking_shims(monkeypatch)

    fx = env[kind]
    # ytb: "merge+" file prefix + template-rephrase generator; bnb: no
    # prefix, skeleton_path="" selects the Concatenate generator (the
    # same recipe the frozen fixture testset was built with);
    # ytb-shufinstr: ytb files + negative_style=shuffle_instruction
    # (image-negatives become instruction-side, common.py:524-541)
    if kind == "bnb":
        per_kind = dict(pre_dataset="bnb", prefix="",
                        bnb_feature=(fx["store_path"],), skeleton_path="")
    else:
        per_kind = dict(pre_dataset="ytb", prefix="merge+",
                        ytb_feature=(fx["store_path"],),
                        skeleton_path=fx["skeleton_path"])
        if kind == "ytb-shufinstr":
            per_kind["negative_style"] = "shuffle_instruction"
    args = RunConfig(
        pretrain=True, ranking=True,
        masked_vision=True, masked_language=True,
        batch_size=BS, gradient_accumulation_steps=ACCUM,
        learning_rate=LR, num_epochs=1, warmup_proportion=0.2,
        cooldown_factor=2.0, weight_decay=1e-2, seed=SEED,
        num_workers=0, compute_dtype="float32", io_dtype="float32",
        use_pallas_attention=False, sparse_vision_targets=False,
        data_dir=env["data_dir"],
        bert_tokenizer=fx["vocab_path"], config_file=env["nodrop_config"],
        from_pretrained=env["ckpt"], **per_kind, **GEOM, **SAMPLING)
    engine = Engine(args, env["cfg"])
    try:
        steps = len(engine.train_loader)
        engine.train_loader = Loader(engine.train_ds, BS, shuffle=False,
                                     seed=SEED, num_workers=0,
                                     drop_last=True)
        assert len(engine.train_loader) == steps

        _align_rng(engine.train_ds)
        _align_rng(engine.test_ds)

        rec = []
        orig = engine._train_step

        def wrapped(state, batch, rng):
            state, m = orig(state, batch, rng)
            rec.append(m)
            return state, m

        engine._train_step = wrapped
        engine.train_epoch(0)
        keys = ["loss/train", "loss/vision", "loss/language",
                "loss/ranking"]
        series = {k: [float(m[k]) for m in rec] for k in keys}
        test_stats = engine.evaluate("test")
        sd = params_to_state_dict(
            jax.tree_util.tree_map(np.asarray, engine.state.params),
            env["cfg"])
        return series, test_stats, sd, steps
    finally:
        engine.close()


def _run_reference(env, kind, monkeypatch):
    import torch

    prepare_reference_runtime()   # stubs + real requests + ArgSpec shim
    from transformers import BertTokenizer

    monkeypatch.chdir(env["root"])
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=True)

    fx = env[kind]
    tokenizer = BertTokenizer(vocab_file=fx["vocab_path"])
    from utils.dataset.features_reader import (BnBFeaturesReader,
                                               YTbFeaturesReader)
    from utils.dataset.all_dataset import BnBDataset, YTbDataset
    if kind == "bnb":
        reader = BnBFeaturesReader(fx["lmdb"])
        ds_cls, skeleton = BnBDataset, ""
        # force INDEPENDENT tokenization: our run cached
        # bnb_*_tokenized_32.json next to the caption files
        for p in Path(fx["caption_path"]).parent.glob("*_tokenized_*.json"):
            p.unlink()
    else:
        reader = YTbFeaturesReader(fx["lmdb"])
        ds_cls, skeleton = YTbDataset, fx["skeleton_path"]

    args = SimpleNamespace(
        batch_size=BS, gradient_accumulation_steps=ACCUM, pretrain=True,
        ranking=True, traj_judge=False, not_traj_judge_data=False,
        masked_vision=True, masked_language=True,
        negative_style=("shuffle_instruction" if kind == "ytb-shufinstr"
                        else "normal"),
        out_listing=False, no_serial=False,
        random_action=False, mask_action_rate=0.0,
        skeleton_path=skeleton,
        num_workers=0, local_rank=-1, world_size=1,
        skip_all_reduce=True, traj_loss_scale=1.0, **GEOM, **SAMPLING)

    train_ds = ds_cls(
        testset_path={}, args=args, caption_path=fx["caption_path"],
        tokenizer=tokenizer, features_reader=reader,
        masked_vision=True, masked_language=True, training=True,
        separators=("[SEP]",))
    test_ds = ds_cls(
        testset_path={"ranking": fx["testset_path"]}, args=args,
        caption_path=fx["test_caption_path"], tokenizer=tokenizer,
        features_reader=reader, masked_vision=False, masked_language=False,
        training=False, separators=("[SEP]",))

    class _Seeded(torch.utils.data.Dataset):
        """Seed the global RNG streams (python/np/torch) per item with the
        same seeds our Loader hands the dataset (loader._item_seed)."""

        def __init__(self, ds):
            self.ds = ds

        def __len__(self):
            return len(self.ds)

        def __getitem__(self, i):
            s = _item_seed(SEED, 0, int(i))
            random.seed(s)
            np.random.seed(s)
            torch.manual_seed(s)
            return self.ds[i]

    from torch.utils.data import DataLoader
    micro_bs = BS // ACCUM
    train_loader = DataLoader(_Seeded(train_ds), shuffle=False,
                              batch_size=micro_bs, num_workers=0,
                              drop_last=True)
    test_loader = DataLoader(_Seeded(test_ds), shuffle=False,
                             batch_size=micro_bs, num_workers=0)

    # reference Lily with the shared checkpoint, dropout fully off
    ref = sys.modules["vilbert.vilbert"]
    from lily import Lily
    ref_cfg = ref.BertConfig(**{k: tuple(v) if isinstance(v, list) else v
                                for k, v in TINY_CFG.items()})
    ref_cfg.args = SimpleNamespace(model_name="vilbert", ranking=True,
                                   traj_judge=False, masked_vision=True,
                                   masked_language=True,
                                   num_negatives=SAMPLING["num_negatives"])
    model = Lily(ref_cfg)
    payload = torch.load(env["ckpt"], map_location="cpu",
                         weights_only=False)
    missing, unexpected = model.load_state_dict(
        payload["model_state_dict"], strict=False)
    assert not missing and not unexpected, (missing[:4], unexpected[:4])
    model.train()
    model.dropout.p = 0.0  # Lily's fused-pool dropout is a literal 0.1

    # optimizer + schedule: the same numbers our make_schedule derives
    # (optimization.py:110-129; t_total counts OPTIMIZER steps)
    from vilbert.optimization import WarmupLinearSchedule
    opt = reference_adamw(model, LR)
    t_total = float(len(train_loader) // ACCUM)
    warmup = 0.2 * t_total
    adjusted = warmup + 2.0 * (t_total - warmup)
    sched = WarmupLinearSchedule(opt, warmup_steps=warmup, t_total=adjusted)

    from utils.misc import NoneLogger
    from utils.utils_init import train_epoch, test_epoch

    w = ScalarWriter()
    log = NoneLogger()
    train_epoch(0, model, opt, sched, train_loader, w, True, args, log)
    keys = ["loss/train", "loss/vision", "loss/language", "loss/ranking"]
    ref_series = {k: w.scalars[k] for k in keys}

    with torch.no_grad():
        stats = test_epoch(0, model, "test", test_loader, w, True, args, 0,
                           log)
    ranking = stats["ranking"].detach().numpy()
    test_stats = {"loss/ranking": float(ranking[1]),
                  "accuracy/ranking": float(ranking[2])}
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    init_sd = {k: np.asarray(v) for k, v in
               payload["model_state_dict"].items()}
    return ref_series, test_stats, sd, init_sd


@pytest.mark.parametrize("kind", ["ytb", "bnb", "ytb-shufinstr"])
def test_pretrain_loop_parity(env, monkeypatch, kind):
    our_series, our_test, our_sd, steps = _run_ours(env, kind, monkeypatch)
    (ref_series, ref_test, ref_sd,
     init_sd) = _run_reference(env, kind, monkeypatch)

    # 1. per-task loss trajectories: the reference logs one scalar per
    # MICRObatch; ours logs one per OPTIMIZER step, averaged over the
    # accumulation pack (train_step.py microbatch scan) — compare against
    # the pairwise means.  All series must be finite (pretrain ranking
    # targets are always 0; masked counts never hit zero at this size).
    assert set(our_series) == set(ref_series)
    assert steps >= 4                       # a real multi-step epoch
    for k in our_series:
        ours = np.asarray(our_series[k])
        ref = np.asarray(ref_series[k])
        assert len(ours) == steps and len(ref) == steps * ACCUM
        assert not np.isnan(ref).any(), (k, ref)
        assert ref.min() > 0.01, (k, ref)   # every task actually trains
        ref_packed = ref.reshape(steps, ACCUM).mean(axis=1)
        np.testing.assert_allclose(
            ours, ref_packed, rtol=2e-3,
            err_msg=f"{k}: ours={ours} ref={ref_packed}")

    # 2. frozen-testset eval: identical success rate, matching loss
    assert abs(our_test["accuracy/ranking"]
               - ref_test["accuracy/ranking"]) < 1e-6, (our_test, ref_test)
    np.testing.assert_allclose(our_test["loss/ranking"],
                               ref_test["loss/ranking"], rtol=2e-3)

    # 3. final parameters (tolerance rationale: loop_parity_common)
    assert_final_params_close(our_sd, ref_sd)

    # 4. the epoch actually trained: parameters moved from the shared init
    assert_params_moved(ref_sd, init_sd)
