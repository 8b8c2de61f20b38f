"""youtube_vln_tpu — a TPU-native rebuild of the YouTube-VLN (Lily) stack.

JAX/XLA/Pallas compute path, pjit data-parallel training over a device mesh,
host-side streaming data pipeline, and checkpoint interop with the reference
PyTorch implementation (JeremyLinky/YouTube-VLN).
"""
from .config import LilyConfig, RunConfig, lily_base_config, tiny_config  # noqa: F401

__version__ = "0.1.0"
