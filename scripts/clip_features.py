"""CLIP frame features -> TSV (pipeline step 6a).

    python scripts/clip_features.py raw_frames/ CLIP-ViT-B-32-views.tsv \
        --weights /path/to/clip.safetensors

Re-runs resume by appending only new frames, mirroring the reference
``precomute_CLIP_features.py``.  Without --weights a random-init encoder is
used (smoke runs; real features need the HF checkpoint placed locally —
no egress in this environment).
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from youtube_vln_tpu.pipeline import clip_model as CM


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("frames_dir")
    p.add_argument("out_tsv")
    p.add_argument("--weights", default="",
                   help="local HF CLIP checkpoint (.bin or .safetensors)")
    p.add_argument("--batch_size", type=int, default=64)
    a = p.parse_args(argv)

    cfg = CM.ClipConfig()
    if a.weights:
        params = CM.load_clip_params(a.weights)
    else:
        import jax
        print("WARNING: no --weights given; using a random-init encoder")
        params = CM.init_clip_params(jax.random.PRNGKey(0), cfg)
    n = CM.build_clip_tsv(params, cfg, a.frames_dir, a.out_tsv,
                          batch_size=a.batch_size)
    print(f"encoded {n} frames -> {a.out_tsv}")


if __name__ == "__main__":
    main()
