"""Cached asset resolution (reference ``vilbert/file_utils.py:1-233``).

The reference resolves model names / URLs / S3 paths to local files with a
sha256+etag-named cache (the AllenNLP scheme).  All three source kinds are
implemented — local path, http(s) URL, s3:// URL — but remote fetches are
gated behind ``allow_download`` because this environment has no network
egress: local paths pass through, cached files are found, and a genuinely
remote fetch raises with instructions instead of hanging.
"""
from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path
from typing import Optional, Tuple, Union

CACHE_DIR = Path(os.environ.get(
    "VLN_TPU_CACHE", Path.home() / ".cache" / "youtube_vln_tpu"))


def url_to_filename(url: str, etag: Optional[str] = None) -> str:
    """sha256(url)[.sha256(etag)] — reference file_utils.py:42-57."""
    name = hashlib.sha256(url.encode()).hexdigest()
    if etag:
        name += "." + hashlib.sha256(etag.encode()).hexdigest()
    return name


def filename_to_url(filename: str,
                    cache_dir: Optional[Path] = None) -> Tuple[str, Optional[str]]:
    """Recover (url, etag) from a cache entry's .json sidecar
    (reference file_utils.py:60-83)."""
    cache_dir = Path(cache_dir or CACHE_DIR)
    meta_path = cache_dir / (filename + ".json")
    if not meta_path.exists():
        raise FileNotFoundError(f"metadata file {meta_path} does not exist")
    with open(meta_path) as f:
        meta = json.load(f)
    return meta["url"], meta.get("etag")


def split_s3_path(url: str) -> Tuple[str, str]:
    """s3://bucket/key -> (bucket, key) — reference file_utils.py:109-120."""
    from urllib.parse import urlparse
    parsed = urlparse(url)
    if not parsed.netloc or not parsed.path:
        raise ValueError(f"bad s3 path {url}")
    return parsed.netloc, parsed.path.lstrip("/")


def _s3_etag(url: str) -> Optional[str]:
    import boto3
    bucket, key = split_s3_path(url)
    obj = boto3.resource("s3").Object(bucket, key)
    return obj.e_tag


def _s3_get(url: str, path: Path) -> None:
    import boto3
    bucket, key = split_s3_path(url)
    boto3.resource("s3").Bucket(bucket).download_file(key, str(path))


def _http_etag(url: str) -> Optional[str]:
    import urllib.request
    req = urllib.request.Request(url, method="HEAD")
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.headers.get("ETag")
    except Exception:
        return None


def _http_get(url: str, path: Path) -> None:
    import urllib.request
    urllib.request.urlretrieve(url, path)


def get_from_cache(url: str, cache_dir: Optional[Path] = None,
                   allow_download: bool = False) -> Path:
    """Reference file_utils.py:150-233: look up by (url, etag), download on
    miss (gated here), and record a url/etag sidecar."""
    cache_dir = Path(cache_dir or CACHE_DIR)

    etag = None
    if allow_download:
        try:
            etag = (_s3_etag(url) if url.startswith("s3://")
                    else _http_etag(url))
        except Exception:
            etag = None

    cached = cache_dir / url_to_filename(url, etag)
    if cached.exists():
        return cached
    bare = cache_dir / url_to_filename(url)
    if bare.exists():   # manually-placed files use the etag-less name
        return bare
    # an OFFLINE lookup (etag=None) must still find a file that a previous
    # online run stored under its etag-suffixed name — fall back to any
    # sha(url).<etag-hash> entry, skipping the .json/.tmp sidecars.  An
    # ONLINE lookup with a fresh etag must NOT take this path: a changed
    # remote etag means the cache is stale and we should fall through to
    # the download below (reference re-downloads on etag mismatch).
    if etag is None:
        matches = sorted((p for p in cache_dir.glob(url_to_filename(url) + ".*")
                          if p.suffix not in (".json", ".tmp")),
                         key=lambda p: p.stat().st_mtime, reverse=True)
        if matches:
            return matches[0]
    if not allow_download:
        raise FileNotFoundError(
            f"{url} is not cached and downloads are disabled in this "
            f"environment; place the file at {cache_dir / url_to_filename(url)} "
            f"manually")

    cache_dir.mkdir(parents=True, exist_ok=True)
    tmp = cached.with_suffix(".tmp")
    if url.startswith("s3://"):
        _s3_get(url, tmp)
    else:
        _http_get(url, tmp)
    tmp.rename(cached)
    with open(str(cached) + ".json", "w") as f:
        json.dump({"url": url, "etag": etag}, f)
    return cached


def cached_path(name_or_path: Union[str, Path],
                cache_dir: Optional[Path] = None,
                allow_download: bool = False) -> Path:
    """Local path | http(s):// | s3:// -> local file
    (reference file_utils.py:86-107)."""
    p = Path(name_or_path)
    if p.exists():
        return p
    url = str(name_or_path)
    if url.startswith(("http://", "https://", "s3://")):
        return get_from_cache(url, cache_dir, allow_download)
    raise FileNotFoundError(f"file or url not found: {name_or_path}")
