"""North-star dress rehearsal: released-checkpoint R2R beam-re-ranking eval.

ONE command chaining the full real-data day workflow (VERDICT r4 #7):

  feature conversion (lmdb -> vlnstore, skipped if already a store)
    -> test.py beam re-ranking on the chosen split
    -> scripts/calculate_metrics.py (SR / SPL / NE / OSR / TL)
    -> comparison vs the expected paper numbers (within --tolerance_pts)

Usage (the day the Matterport data + released checkpoint are reachable —
reference README.md:167-179; paper numbers from arXiv:2307.11984, NOT
recorded in the reference repo, see BASELINE.md):

    python scripts/northstar.py \
        --data_dir data \
        --img_feature data/matterport-ResNet-101-faster-rcnn-genome.lmdb \
        --from_pretrained best_unseen.bin \
        --config_file data/config/bert_base_6_layer_6_connect.json \
        --bert_tokenizer <path/to/vocab.txt> \
        --split val_unseen \
        --expected_sr <paper SR, 0-1> --expected_spl <paper SPL, 0-1>

Prints one JSON line with the measured metrics, the expected values, and
a PASS/FAIL verdict; exits nonzero on FAIL so CI can gate on it.  Without
--expected_* it reports metrics with verdict "NO_EXPECTATION" (useful for
a first look, but NOT a parity claim).

Exercised end-to-end on synthetic fixtures by
tests/test_e2e.py:test_northstar_rehearsal.
"""
import argparse
import importlib.util
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def _load_by_path(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def ensure_store(img_feature: str) -> str:
    """lmdb database -> vlnstore conversion (idempotent); stores pass
    through untouched.  Conversion needs the optional `lmdb` package
    (scripts/convert_lmdb.py; reference features_reader.py:16-66)."""
    p = Path(img_feature)
    looks_lmdb = (p.suffix == ".lmdb"
                  or (p.is_dir() and (p / "data.mdb").exists()))
    if not looks_lmdb:
        return img_feature
    out = p.with_suffix(".vlnstore")
    if out.exists():
        print(f"# northstar: reusing converted store {out}", file=sys.stderr)
        return str(out)
    from youtube_vln_tpu.data.store import convert_lmdb
    print(f"# northstar: converting {p} -> {out}", file=sys.stderr)
    # Convert to a temp name and publish atomically: a converter killed
    # mid-run (OOM/SIGKILL — no __exit__ cleanup) must never leave `out`
    # present, or the next invocation would "reuse" a truncated store and
    # the eval failure would masquerade as a model-parity failure.
    tmp = out.with_name(out.name + ".tmp")
    import os
    n = convert_lmdb(str(p), str(tmp), pano=True)
    os.replace(tmp, out)
    print(f"# northstar: converted {n} records", file=sys.stderr)
    return str(out)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--img_feature", required=True,
                    help="pano features: a .vlnstore, or a reference .lmdb "
                         "(auto-converted once)")
    ap.add_argument("--from_pretrained", required=True,
                    help="checkpoint (.bin / dir / .tar.gz / URL)")
    ap.add_argument("--config_file", required=True)
    ap.add_argument("--bert_tokenizer", default="bert-base-uncased")
    ap.add_argument("--split", default="val_unseen",
                    choices=["train", "val_seen", "val_unseen", "test"])
    ap.add_argument("--output_dir", default="result")
    ap.add_argument("--save_name", default="northstar")
    ap.add_argument("--beam_prefix", default="")
    ap.add_argument("--expected_sr", type=float, default=None,
                    help="paper val_unseen success rate, 0-1 scale")
    ap.add_argument("--expected_spl", type=float, default=None,
                    help="paper val_unseen SPL, 0-1 scale")
    ap.add_argument("--tolerance_pts", type=float, default=1.0,
                    help="allowed |measured - expected| in percentage "
                         "points (north star: within 1 pt)")
    ap.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                    help="everything after --extra is forwarded to test.py "
                         "verbatim (e.g. --compilation_cache_dir ...)")
    ns = ap.parse_args(argv)

    store = ensure_store(ns.img_feature)

    test_entry = _load_by_path("northstar_test_entry", REPO_ROOT / "test.py")
    test_argv = [
        "--data_dir", ns.data_dir,
        "--img_feature", store,
        "--from_pretrained", ns.from_pretrained,
        "--config_file", ns.config_file,
        "--bert_tokenizer", ns.bert_tokenizer,
        "--output_dir", ns.output_dir,
        "--save_name", ns.save_name,
        "--split", ns.split,
    ]
    if ns.beam_prefix:
        test_argv += ["--beam_prefix", ns.beam_prefix]
    test_argv += list(ns.extra)
    results_path = test_entry.main(test_argv)

    if ns.split == "test":
        # The R2R test split carries no ground-truth paths (leaderboard
        # submission protocol) — the metrics stage would crash AFTER the
        # full expensive eval, or worse score against a bare start node.
        # Emit the results file only; SR/SPL come from the eval server.
        out = {"northstar": "NO_GROUND_TRUTH", "split": ns.split,
               "results": str(results_path),
               "note": "test split has no GT paths; submit the results "
                       "file to the R2R leaderboard for SR/SPL"}
        print(json.dumps(out))
        return out

    calc = _load_by_path("northstar_calc",
                         REPO_ROOT / "scripts" / "calculate_metrics.py")
    summary = calc.main([str(results_path), "--data_dir", ns.data_dir,
                         "--split", ns.split])

    tol = ns.tolerance_pts / 100.0
    comparisons = {}
    verdict = "NO_EXPECTATION"
    if ns.expected_sr is not None or ns.expected_spl is not None:
        ok = True
        for key, expected in (("success_rate", ns.expected_sr),
                              ("spl", ns.expected_spl)):
            if expected is None:
                continue
            measured = summary[key]
            delta_pts = (measured - expected) * 100.0
            within = abs(measured - expected) <= tol
            ok = ok and within
            comparisons[key] = {"expected": expected,
                                "measured": measured,
                                "delta_pts": round(delta_pts, 2),
                                "within_tolerance": within}
        verdict = "PASS" if ok else "FAIL"

    out = {"northstar": verdict,
           "split": ns.split,
           "results": str(results_path),
           "metrics": summary,
           "tolerance_pts": ns.tolerance_pts,
           "comparison": comparisons}
    print(json.dumps(out))
    if verdict == "FAIL":
        sys.exit(1)
    return out


if __name__ == "__main__":
    main()
