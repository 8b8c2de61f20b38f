"""Pin the MIGRATION.md claim that our CLI is a strict superset of the
reference parser (reference utils/cli.py:12-485): every reference option
string parses here, and every shared destination keeps the reference
default (so published recipes run unchanged)."""
import importlib.util
from pathlib import Path

REF_CLI = Path("/root/reference/utils/cli.py")


def _ref_parser():
    spec = importlib.util.spec_from_file_location("ref_cli", REF_CLI)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.get_parser()


def test_cli_flag_superset_and_default_parity():
    from youtube_vln_tpu.utils.cli import get_parser

    refp, ours = _ref_parser(), get_parser()
    ref_opts = {s for a in refp._actions for s in a.option_strings}
    our_opts = {s for a in ours._actions for s in a.option_strings}
    missing = sorted(ref_opts - our_opts)
    assert not missing, f"reference flags not accepted here: {missing}"

    ref_defaults = {a.dest: a.default for a in refp._actions
                    if a.option_strings}
    our_defaults = {a.dest: a.default for a in ours._actions
                    if a.option_strings}
    # 'device' intentionally differs (cuda -> tpu); everything else a
    # published recipe relies on must default identically
    drift = {k: (ref_defaults[k], our_defaults[k])
             for k in ref_defaults
             if k in our_defaults and k != "device"
             and ref_defaults[k] != our_defaults[k]}
    assert not drift, f"default drift vs the reference parser: {drift}"
    lost = sorted(k for k in ref_defaults if k not in our_defaults)
    assert not lost, f"reference dests missing here: {lost}"
