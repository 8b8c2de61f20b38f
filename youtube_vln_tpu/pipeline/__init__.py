"""Offline dataset-construction pipeline (TPU-native rebuild of
``scripts/`` — the 10-step recipe in scripts/README.md:13-106).

Steps and their homes:
  1  video download manifest                -> assets.py (gated, no egress)
  2  frame extraction @1fps (ffmpeg)        -> frames.py
  3  region features (detector)             -> detector.py (protocol +
       multi-process sharded driver; the reference's Caffe BUTD net is an
       external dependency there too)
  4  TSV -> feature-store conversion        -> detector.py
  5a indoor filter (WideResNet-18 Places365
       in JAX, torch-weight import)         -> places365.py + filters.py
  5b person filter                          -> maskrcnn.py (ResNet-50-FPN
       detector in JAX, torchvision-parity) + filters.py (smoothing,
       artifacts, run_maskrcnn_filter driver; COCO weights are an
       external asset, imported via params_from_torch_state_dict)
  6  CLIP ViT-B/32 encoders (JAX, HF-weight
       import) + zero-shot captions         -> clip_model.py +
                                               clip_captions.py
  7  inverse action model (JAX)             -> inverse_action.py
  8  per-video action profiles              -> inverse_action.py
  9  train/test JSON build + frozen testset -> build_dataset.py
  10 room-type photo merging                -> merge_photos.py
"""
