"""Cached HTTP fetch (parity with reference utils.fetch, utils.py:2-14).

Downloads are cached in the tempdir keyed by URL md5 with an atomic rename.
An optional ``LIGHTGRAD_CACHE`` env var overrides the cache directory (useful
for pre-seeded offline environments: drop files named ``md5(url)`` there).
"""

import hashlib
import os
import tempfile

__all__ = ["fetch"]


def fetch(url: str) -> bytes:
    cache_dir = os.environ.get("LIGHTGRAD_CACHE", tempfile.gettempdir())
    fp = os.path.join(cache_dir, hashlib.md5(url.encode("utf-8")).hexdigest())
    if os.path.isfile(fp) and os.stat(fp).st_size > 0:
        with open(fp, "rb") as f:
            return f.read()
    import urllib.request

    print(f"fetching {url}")
    with urllib.request.urlopen(url, timeout=60) as r:
        dat = r.read()
    with open(fp + ".tmp", "wb") as f:
        f.write(dat)
    os.rename(fp + ".tmp", fp)
    return dat
