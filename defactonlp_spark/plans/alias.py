"""Index aliases — atomic blue-green serving swaps.

The operational pattern every production engine ships (Elasticsearch
aliases, an Iceberg catalog's table pointer): serving code opens a stable
NAME, deploys build a NEW index directory next to the live one, and one
atomic pointer flip moves traffic — no serving downtime, instant
rollback (flip back), and the old generation stays on disk for the
retention window.

Atomicity on a POSIX filesystem: the pointer is a JSON file written to a
temp name and `os.replace`d into place — readers racing the swap see the
OLD pointer or the NEW one, never a torn file. (On an object store the
same contract comes from a conditional-put on the pointer key; on a real
catalog, from the catalog's compare-and-swap — this module is the
filesystem realization of that contract, matching sources/tableio.py's
snapshot-commit protocol.)

Every flip appends to a `<alias>.history` JSONL (version, index_dir,
ts) — the audit trail rollback reads.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession


def set_alias(alias_path: str, index_dir: str) -> dict:
    """Atomically point ``alias_path`` at ``index_dir``.

    The target must look like a built index (manifest present) — flipping
    an alias to a half-built directory is the operational error this
    guards against; IndexBuild commits its manifest LAST, so manifest
    presence == complete build."""
    if not os.path.exists(os.path.join(index_dir, "manifest")):
        raise FileNotFoundError(
            f"{index_dir} has no manifest — not a completed index build"
        )
    prev = read_alias(alias_path) if os.path.exists(alias_path) else None
    rec = {
        "version": (prev["version"] + 1) if prev else 1,
        "index_dir": os.path.abspath(index_dir),
        "ts": time.time(),
    }
    tmp = f"{alias_path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(rec, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, alias_path)  # POSIX-atomic: readers see old XOR new
    with open(f"{alias_path}.history", "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def read_alias(alias_path: str) -> dict:
    """The current pointer record {version, index_dir, ts}."""
    with open(alias_path) as f:
        return json.load(f)


def resolve_alias(alias_path: str) -> str:
    return read_alias(alias_path)["index_dir"]


def alias_history(alias_path: str) -> list[dict]:
    """All flips, oldest first — the rollback audit trail."""
    hist = f"{alias_path}.history"
    if not os.path.exists(hist):
        return []
    with open(hist) as f:
        return [json.loads(line) for line in f if line.strip()]


def rollback_alias(alias_path: str) -> dict:
    """Flip the alias back to the PREVIOUS distinct index_dir in the
    history (the blue-green 'undo'). Raises if there is no prior target."""
    cur = read_alias(alias_path)
    prior = [h for h in alias_history(alias_path)
             if h["index_dir"] != cur["index_dir"]]
    if not prior:
        raise ValueError(f"{alias_path}: no prior index to roll back to")
    return set_alias(alias_path, prior[-1]["index_dir"])


def open_alias(spark: SparkSession, alias_path: str):
    """IndexReader over whatever the alias currently points at. A serving
    process re-opens per claim-batch (pointer read is one tiny file), so
    a flip takes effect at the next batch boundary — the same freshness
    contract as ES alias resolution per request."""
    from defactonlp_spark.plans.build import IndexReader

    return IndexReader(spark, resolve_alias(alias_path))
