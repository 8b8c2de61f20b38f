"""External asset manifest + gated fetch (reference ``scripts/download.py``).

No network egress in this environment: :func:`fetch` resolves cached/local
files and otherwise reports exactly what to place where.  URLs come from the
reference's download list (beam-search files, model config, speaker-augmented
data, Matterport connectivity, R2R task JSONs, distance tables).
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List, Optional

from ..utils.file_cache import cached_path

logger = logging.getLogger(__name__)

# target path -> source URL (reference scripts/download.py:15-79)
ASSETS: Dict[str, str] = {
    "data/beamsearch/beams_test.json":
        "https://dl.dropboxusercontent.com/s/gpnm54l903fms63/beams_test.json",
    "data/beamsearch/beams_train.json":
        "https://dl.dropboxusercontent.com/s/ci47p5ybitahnqx/beams_train.json",
    "data/beamsearch/beams_val_seen.json":
        "https://dl.dropboxusercontent.com/s/1o6xmjjv74mq8f8/beams_val_seen.json",
    "data/beamsearch/beams_val_unseen.json":
        "https://dl.dropboxusercontent.com/s/5m5by9ralaim5nb/beams_val_unseen.json",
    "data/config/bert_base_6_layer_6_connect.json":
        "https://drive.google.com/uc?id=17mL0qCWnIjqL2GNku8A7CKAi6A8Scogh",
    "data/task/aug+R2R_train.json":
        "https://drive.google.com/uc?id=1cA2GRF_EGB8cw_XIxk8b6TXSEaWZEDk7",
    "data/beamsearch/aug_beams_train.json":
        "https://drive.google.com/uc?id=1ukpTRI6LelEl0_gk10azW_Td95XANL2e",
}

CONNECTIVITY_ROOT_URL = ("https://raw.githubusercontent.com/peteanderson80/"
                         "Matterport3DSimulator/master/connectivity")


def fetch(target: str, data_dir: str = "data",
          allow_download: bool = False) -> Optional[Path]:
    """Resolve one asset; returns the local path or None with guidance."""
    local = Path(data_dir) / Path(target).relative_to("data")
    if local.exists():
        return local
    url = ASSETS.get(target)
    if url is None:
        logger.warning("unknown asset %s", target)
        return None
    try:
        return cached_path(url, allow_download=allow_download)
    except FileNotFoundError:
        logger.warning("asset %s unavailable offline; download %s to %s",
                       target, url, local)
        return None


def fetch_all(data_dir: str = "data", allow_download: bool = False
              ) -> List[str]:
    """Returns the list of assets that could NOT be resolved."""
    missing = []
    for target in ASSETS:
        if fetch(target, data_dir, allow_download) is None:
            missing.append(target)
    return missing
