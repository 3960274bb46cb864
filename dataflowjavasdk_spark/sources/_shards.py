"""Crash-safe shard discovery shared by the file-based readers.

The file sinks in this package commit via the temp-then-rename protocol
(write into ``<dest>/_temporary/``, atomic rename after all tasks
succeed; the streaming sinks commit each micro-batch into
``<dest>/batch=<id>/`` and mark completion with a sibling ``_SUCCESS``
file). A reader that recursively globs ``**/*.<ext>`` would otherwise
see two classes of crash leftovers (ADVICE round 7):

- shards under a ``_temporary/`` component, left behind when a write
  fails after some tasks already renamed their per-task temps;
- shards in an uncommitted ``batch=<id>/`` directory whose ``_SUCCESS``
  marker was never written (the micro-batch died mid-write and will be
  replayed after restart).

Reading either silently includes partial or soon-to-be-duplicated data,
breaking the sinks' exactly-once claim. ``committed_shards`` is the
single discovery path that excludes both.
"""

from __future__ import annotations

import glob as _glob
import os


def committed_shards(path: str, ext: str) -> list[str]:
    """Return the sorted committed shard files for ``path``.

    ``path`` may be a directory (searched recursively for ``*.<ext>``)
    or a glob pattern (expanded as-is). Paths containing a
    ``_temporary`` component are excluded; shards under a
    ``batch=<id>`` directory are included only when that directory (or
    an ancestor ``batch=`` directory) holds a ``_SUCCESS`` marker.

    Hive-partition disambiguation: a dataset written with
    ``partitionBy("batch")`` also produces ``batch=<v>/`` directories,
    but with a single ROOT-level ``_SUCCESS`` (Spark's
    FileOutputCommitter) and none per partition. A ``batch=`` level
    whose PARENT directory carries ``_SUCCESS`` is therefore treated
    as a committed Hive partition, not a streaming micro-batch — the
    streaming sinks never write a root marker, so the exactly-once
    exclusion still holds for them.
    """
    raw = (
        _glob.glob(os.path.join(path, "**", f"*.{ext}"), recursive=True)
        if os.path.isdir(path)
        else _glob.glob(path)
    )
    out = []
    for p in raw:
        parts = os.path.normpath(p).split(os.sep)
        if "_temporary" in parts[:-1]:
            continue
        committed = True
        # Walk ancestor directories; every batch=<id> level must carry
        # its _SUCCESS marker (markers are written once, after the
        # micro-batch's shards are fully in place) — unless its parent
        # carries the root marker of a Hive-partitioned batch write.
        for i, comp in enumerate(parts[:-1]):
            if comp.startswith("batch="):
                marker = os.sep.join(parts[: i + 1] + ["_SUCCESS"])
                parent_marker = os.sep.join(parts[:i] + ["_SUCCESS"])
                if not os.path.exists(marker) and not os.path.exists(
                    parent_marker
                ):
                    committed = False
                    break
        if committed:
            out.append(p)
    return sorted(out)
