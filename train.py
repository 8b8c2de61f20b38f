"""R2R fine-tuning entry point (reference ``train.py``).

Recipe parity (README.md:123-165):
    python train.py --masked_vision --masked_language --batch_size 12 ...
    python train.py --ranking --shuffle_visual_features --batch_size 16 ...

Epoch loop: train -> periodic save -> val_seen/val_unseen success-rate
validation -> best_seen/best_unseen checkpoints (reference train.py:100-188).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax

from youtube_vln_tpu.training.engine import Engine
from youtube_vln_tpu.training import checkpoint as ckpt
from youtube_vln_tpu.utils.cli import get_parser, args_to_run_config
from youtube_vln_tpu.utils.entry import build_model_config
from youtube_vln_tpu.utils.misc import (dump_config, get_logger,
                                        get_output_dir, save_code_snapshot,
                                        set_seed, NoneLogger)


def main(argv=None):
    parser = get_parser()
    ns = parser.parse_args(argv)
    ns.pretrain = False  # reference train.py:24
    args = args_to_run_config(ns)
    args.validate()

    # multi-host rendezvous BEFORE the first backend-touching jax
    # call: resolves RANK/SLURM/TPU env (reference set_cuda ->
    # init_distributed, utils/distributed.py:37-90) and refuses to
    # degrade to N independent trainings on a pod slice.  No-op on
    # single-process runs and when a test harness already
    # initialized the backend.
    from youtube_vln_tpu.parallel.distributed import initialize
    initialize()
    is_main = jax.process_index() == 0
    set_seed(args.seed, jax.process_index())

    save_folder = get_output_dir(ns)
    logger = NoneLogger()
    writer = None
    # every process needs the save path: --orbax_checkpoints saves are a
    # cross-host COLLECTIVE, so non-main processes must be able to join
    # engine.save (see pretrain.py; path is process-deterministic)
    model_save_path = save_folder.parent / "data"
    if is_main:
        save_folder.mkdir(parents=True, exist_ok=True)
        logger = get_logger(__name__, str(save_folder / "train.log"))
        logger.info(f"Experiment Folder: {save_folder}")
        model_save_path.mkdir(parents=True, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter
            writer = SummaryWriter(
                logdir=str(save_folder.parent / "tb"), flush_secs=30)
        except ImportError:
            pass

    cfg = build_model_config(args)
    if is_main:
        dump_config(save_folder, ns, cfg)
        save_code_snapshot(save_folder)

    engine = Engine(args, cfg, save_folder=model_save_path,
                    run_logger=logger)
    engine.writer = writer

    best_seen = 0.0
    best_unseen = 0.0
    logger.info(f"starting training from epoch {engine.start_epoch}...")
    for epoch in range(engine.start_epoch, args.num_epochs):
        logger.info(f"epoch {epoch}")
        engine.train_epoch(epoch)

        # orbax saves are collective: EVERY process must enter engine.save
        # (host 0 alone would hang at the orbax barrier); .bin stays
        # main-only.  Decisions evaluate identically on every host (epoch
        # arithmetic; eval metrics are in-graph global values).
        saver = is_main or args.orbax_checkpoints
        if saver and (
                (args.save_epochs != -1
                 and (epoch + 1) % args.save_epochs == 0)
                or epoch == args.num_epochs - 1):
            engine.save(str(epoch), epoch)
            if is_main:
                ckpt.delete_checkpoint(model_save_path,
                                       str(epoch - args.save_epochs))

        if not args.skip_val and args.ranking and not args.no_test:
            seen = engine.evaluate("val_seen", epoch).get(
                "accuracy/ranking", 0.0)
            if seen >= best_seen:
                best_seen = seen
                if saver:
                    engine.save("best_seen", epoch)
            unseen = engine.evaluate("val_unseen", epoch).get(
                "accuracy/ranking", 0.0)
            if unseen >= best_unseen:
                best_unseen = unseen
                if saver:
                    engine.save("best_unseen", epoch)
            logger.info(
                f"epoch {epoch} sr_val_seen={seen:.3f} "
                f"(best {best_seen:.3f}) sr_val_unseen={unseen:.3f} "
                f"(best {best_unseen:.3f})")

    if writer is not None:
        writer.close()
    engine.close()
    logger.info("Finish~~~")
    return best_seen, best_unseen


if __name__ == "__main__":
    main()
