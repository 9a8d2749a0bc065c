"""Build-once artifact directories with rebuild-in-place semantics.

One shared implementation of the pattern the materialized caches use
(ANN index, clustered tables, pipeline layouts): the directory NAME
depends only on the artifact identity (so a regenerated source rebuilds
IN PLACE instead of leaking an orphaned full-size copy), while the
staleness KEY (source mtime + build params) lives in a marker file that
gates the rebuild. The marker is written LAST, so a crash mid-build
leaves a directory that fails the freshness check and rebuilds cleanly.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable

MARKER = "_SOURCE_KEY"


def ensure_built(
    path: str,
    key: str,
    build: Callable[[str], None],
    ready_file: str = "_SUCCESS",
) -> str:
    """Return ``path``, rebuilding it via ``build(path)`` unless it both
    looks complete (``ready_file`` exists) and carries the current
    ``key`` in its marker."""
    marker = os.path.join(path, MARKER)
    fresh = os.path.exists(os.path.join(path, ready_file))
    if fresh:
        try:
            with open(marker) as f:
                fresh = f.read() == key
        except OSError:
            fresh = False
    if not fresh:
        shutil.rmtree(path, ignore_errors=True)
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        build(path)
        with open(marker, "w") as f:
            f.write(key)
    return path
