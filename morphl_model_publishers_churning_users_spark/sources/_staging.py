"""One-time staging of the events table into a streamable directory.

Cached per (session, sf_dir): the copy happens once per process, then
every streaming op reads the same directory. Spark-side write (no driver
collect) — at scale this is the normal landing-zone layout, not a copy.
"""

from __future__ import annotations

import os

from ..operators._shared import scratch_dir

_staged: dict[str, str] = {}


def ensure_staged(spark, sf_dir: str) -> str:
    key = os.path.abspath(sf_dir)
    if key in _staged:
        return _staged[key]
    from ..catalog import table

    out = scratch_dir(f"stream_src_{os.path.basename(key)}")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        table(spark, sf_dir, "events").write.mode("overwrite").parquet(out)
    _staged[key] = out
    return out
