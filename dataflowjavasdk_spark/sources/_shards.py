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
    FileOutputCommitter) and none per partition. The streaming sinks
    therefore CLAIM their destination with a ``_STREAM_SINK`` sentinel
    (written via :func:`claim_stream_sink_root` before any batch
    content — crash-ordering-safe): a ``batch=`` level under a claimed
    parent always requires its own marker, regardless of any root
    ``_SUCCESS`` a bootstrap batch write may have left; a ``batch=``
    level under an UNclaimed parent carrying root ``_SUCCESS`` is a
    committed Hive partition and is included.
    """
    raw = (
        _glob.glob(os.path.join(os.path.abspath(path), "**", f"*.{ext}"), recursive=True)
        if os.path.isdir(path)
        else [os.path.abspath(p) for p in _glob.glob(path)]
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
        # is an unclaimed Hive-partitioned batch write (root _SUCCESS,
        # no _STREAM_SINK sentinel).
        for i, comp in enumerate(parts[:-1]):
            if comp.startswith("batch="):
                marker = os.sep.join(parts[: i + 1] + ["_SUCCESS"])
                if os.path.exists(marker):
                    continue
                parent = os.sep.join(parts[:i]) or os.sep
                hive_exempt = os.path.exists(
                    os.path.join(parent, "_SUCCESS")
                ) and not os.path.exists(os.path.join(parent, "_STREAM_SINK"))
                if not hive_exempt:
                    committed = False
                    break
        if committed:
            out.append(p)
    return sorted(out)


def claim_stream_sink_root(path: str) -> None:
    """Mark ``path`` as a streaming-sink destination (idempotent).

    Called by the streaming file sinks BEFORE any micro-batch content
    is written, so even a first-batch crash leaves the claim in place
    and ``committed_shards`` stays strict about per-batch markers —
    including destinations bootstrapped by a native batch write whose
    root ``_SUCCESS`` would otherwise look like a Hive layout.
    """
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_STREAM_SINK"), "a"):
        pass
