"""Beam re-ranking evaluation entry point (reference ``test.py``).

    python test.py --split val_unseen --from_pretrained best_unseen.bin ...

Forces num_beams=1 (disables beam-count filtering), batch_size=1,
ranking=True (reference test.py:46-49); scores ALL ranked paths per
instruction; writes ``{prefix}_scores_{split}.json`` and
``{prefix}_results_{split}.json``.
"""
import json
import sys
from datetime import datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import numpy as np

from youtube_vln_tpu.data.loader import Loader
from youtube_vln_tpu.evaluation.beam_eval import convert_scores, eval_epoch
from youtube_vln_tpu.models import init_lily_params
from youtube_vln_tpu.training import checkpoint as ckpt
from youtube_vln_tpu.training.engine import (load_beam_dataset,
                                             maybe_enable_compilation_cache,
                                             resolve_tokenizer)
from youtube_vln_tpu.data.features_reader import PanoFeaturesReader
from youtube_vln_tpu.utils.cli import get_parser, args_to_run_config
from youtube_vln_tpu.utils.entry import build_model_config
from youtube_vln_tpu.utils.misc import (dump_config, get_logger,
                                        increment_path, set_seed)


def main(argv=None):
    parser = get_parser()
    parser.add_argument("--split", required=True,
                        choices=["train", "val_seen", "val_unseen", "test"])
    parser.add_argument("--random_testing", default=False,
                        action="store_true")
    ns = parser.parse_args(argv)

    # forced arguments (reference test.py:46-49)
    ns.num_beams = 1
    ns.batch_size = 1
    ns.gradient_accumulation_steps = 1
    ns.ranking = True
    args = args_to_run_config(ns)
    # this entry bypasses Engine, so wire the persistent compilation
    # cache here too (the scorer jit is the expensive compile)
    maybe_enable_compilation_cache(args)

    set_seed(args.seed, jax.process_index())

    save_folder = increment_path(
        Path(args.output_dir) / args.save_name,
        sep=f"/test_{ns.split}", note=args.note).resolve()
    save_folder.mkdir(parents=True, exist_ok=True)
    logger = get_logger(__name__, str(save_folder / "test.log"))
    logger.info(f"Test folder: {save_folder}")

    cfg = build_model_config(args)
    cfg.ranking = True
    cfg.masked_language = False
    cfg.masked_vision = False
    dump_config(save_folder, ns, cfg)

    tokenizer = resolve_tokenizer(args)
    reader = PanoFeaturesReader(args.img_feature)
    dataset = load_beam_dataset(ns.split, args, tokenizer, reader,
                                training=False)
    loader = Loader(dataset, batch_size=1, shuffle=False, drop_last=False,
                    num_candidates=dataset.max_beam_count(),
                    with_instr_id=True, prefetch=args.host_prefetch)

    params = init_lily_params(jax.random.PRNGKey(args.seed), cfg)
    if args.from_pretrained and args.from_pretrained != "bert-base-uncased":
        params = jax.tree_util.tree_map(np.asarray, params)
        params, _, _, _ = ckpt.load_checkpoint(args.from_pretrained, cfg,
                                               params)
    logger.info(f'{datetime.now():%Y-%m-%d %H:%M} begin evaluation')

    all_scores = eval_epoch(params, cfg, loader,
                            random_testing=ns.random_testing,
                            seed=args.seed, prefetch=args.host_prefetch)

    scores_path = save_folder / f"{args.r2r_prefix}_scores_{ns.split}.json"
    with open(scores_path, "w") as f:
        json.dump(all_scores, f)
    logger.info(f"saving scores: {scores_path}")

    beam_path = (f"{args.data_dir}/beamsearch/{args.beam_prefix}"
                 f"beams_{ns.split}.json")
    all_results = convert_scores(all_scores, beam_path)
    results_path = save_folder / f"{args.r2r_prefix}_results_{ns.split}.json"
    with open(results_path, "w") as f:
        json.dump(all_results, f)
    logger.info(f"saving results: {results_path}")
    reader.close()
    return str(results_path)


if __name__ == "__main__":
    main()
