"""Cached asset resolution (reference ``vilbert/file_utils.py:1-233``).

The reference resolves model names / URLs / S3 paths to local files with a
sha256-named cache.  This environment has no network egress, so remote
fetches are gated: local paths pass through, cached files are found, and a
genuinely remote fetch raises with instructions instead of hanging.
"""
from __future__ import annotations

import hashlib
import os
from pathlib import Path
from typing import Optional, Union

CACHE_DIR = Path(os.environ.get(
    "VLN_TPU_CACHE", Path.home() / ".cache" / "youtube_vln_tpu"))


def url_to_filename(url: str, etag: Optional[str] = None) -> str:
    name = hashlib.sha256(url.encode()).hexdigest()
    if etag:
        name += "." + hashlib.sha256(etag.encode()).hexdigest()
    return name


def cached_path(name_or_path: Union[str, Path],
                cache_dir: Optional[Path] = None,
                allow_download: bool = False) -> Path:
    p = Path(name_or_path)
    if p.exists():
        return p
    cache_dir = Path(cache_dir or CACHE_DIR)
    url = str(name_or_path)
    if url.startswith(("http://", "https://", "s3://")):
        cached = cache_dir / url_to_filename(url)
        if cached.exists():
            return cached
        if not allow_download:
            raise FileNotFoundError(
                f"{url} is not cached and downloads are disabled in this "
                f"environment; place the file at {cached} manually")
        import urllib.request
        cache_dir.mkdir(parents=True, exist_ok=True)
        tmp = cached.with_suffix(".tmp")
        urllib.request.urlretrieve(url, tmp)
        tmp.rename(cached)
        return cached
    raise FileNotFoundError(f"file or url not found: {name_or_path}")
