"""Resumable, lineage-tracked extraction runs (north_rule: "resumable
from checkpoint with per-partition lineage + metrics").

Checkpoint granularity = WORK UNIT: a deterministic, sorted group of
input shards (Parquet files). The 10^12-doc corpus is thousands of
shards; units are sized so one unit is minutes of cluster work — coarse
enough that the unit loop adds no scheduling overhead, fine enough that
a crash loses at most one unit.

Layout under ``out_dir``::

    data/unit=<unit_id>/*.parquet     extraction output per unit
    lineage/<unit_id>.json            written ATOMICALLY after the unit's
                                      data is fully on disk (tmp+rename)

A unit is complete iff its lineage record exists → resume = skip those
units; a partially-written data dir without lineage is overwritten on
rerun. Each lineage record carries the unit's input shards + row/error/
byte counts + wall time, so the corpus-level metrics are the sum of the
lineage files (no second pass over the data).

Within a unit everything is a normal streaming Dataset run (fused
read → extract → write); across units the driver loop is sequential —
units are sized >> cluster so intra-unit parallelism saturates the
cluster, and sequential units give crash-consistency for free.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc

from .extract_pipeline import extract_pages


def plan_units(shards: list[str], shards_per_unit: int = 8) -> list[tuple[str, list[str]]]:
    """Deterministic unit plan: sorted shards, fixed-size groups, unit id
    = sha1 of the member list (stable across runs and resumes)."""
    shards = sorted(shards)
    units = []
    for i in range(0, len(shards), shards_per_unit):
        members = shards[i : i + shards_per_unit]
        digest = hashlib.sha1("\n".join(members).encode()).hexdigest()[:12]
        units.append((f"{i // shards_per_unit:05d}_{digest}", members))
    return units


def _lineage_path(out_dir: str, unit_id: str) -> str:
    return os.path.join(out_dir, "lineage", f"{unit_id}.json")


def completed_units(out_dir: str) -> set[str]:
    d = os.path.join(out_dir, "lineage")
    if not os.path.isdir(d):
        return set()
    return {f[: -len(".json")] for f in os.listdir(d) if f.endswith(".json")}


def run_resumable(
    shards: list[str],
    out_dir: str,
    *,
    mode: str = "text",
    shards_per_unit: int = 8,
    extract_kwargs: dict | None = None,
    n_buckets: int = 0,
) -> dict:
    """Run (or resume) the extraction job over ``shards``.

    ``n_buckets > 0`` additionally lays each unit's output out
    partitioned by a uniform text-digest bucket
    (``data/unit=U/bucket=B/``) — the layout that lets corpus-wide
    dedup/groupby run as independent bucket-local jobs at 10^12 docs
    (docs/SCALE.md §3): bucket B of the corpus = the union of
    ``unit=*/bucket=B`` directories, each node-memory-sized.

    Returns the job summary: units completed/skipped and aggregate
    row/error/byte counts from the lineage records.
    """
    import ray.data
    import shutil

    from ..stages.dedup import add_hash_bucket

    os.makedirs(os.path.join(out_dir, "lineage"), exist_ok=True)
    units = plan_units(shards, shards_per_unit)
    done = completed_units(out_dir)
    skipped = 0

    for unit_id, members in units:
        if unit_id in done:
            skipped += 1
            continue
        unit_dir = os.path.join(out_dir, "data", f"unit={unit_id}")
        # a data dir without lineage is a partial write from a crashed
        # run — write_parquet appends, so clear it first
        shutil.rmtree(unit_dir, ignore_errors=True)

        t0 = time.perf_counter()
        ds = ray.data.read_parquet(members, override_num_blocks=len(members))
        ext = extract_pages(ds, mode=mode, **(extract_kwargs or {}))
        if n_buckets:
            ext = add_hash_bucket(ext, col="text", n_buckets=n_buckets)
        # one materialized pass serves both the write and the metrics —
        # bounded by unit size (the checkpoint granule), spillable
        ext = ext.materialize()
        if n_buckets:
            ext.write_parquet(unit_dir, partition_cols=["bucket"])
        else:
            ext.write_parquet(unit_dir)
        stats = _unit_stats(ext)
        wall = time.perf_counter() - t0

        record = {
            "unit_id": unit_id,
            "input_shards": members,
            "rows": stats["rows"],
            "errors": stats["errors"],
            "html_bytes": stats["html_bytes"],
            "wall_sec": round(wall, 3),
            "mode": mode,
            # first lines of Ray Data's execution stats — per-unit
            # observability without a metrics service
            "ray_stats_head": ext.stats().splitlines()[:6],
        }
        tmp = _lineage_path(out_dir, unit_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(record, f)
        os.replace(tmp, _lineage_path(out_dir, unit_id))  # atomic commit

    return job_summary(out_dir, skipped_this_run=skipped)


def _unit_stats(ext) -> dict:
    def partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "rows": pa.array([len(b)], pa.int64()),
                "errors": pa.array(
                    [pc.sum(pc.cast(pc.is_valid(b.column("error")), pa.int64())).as_py() or 0],
                    pa.int64(),
                ),
                "html_bytes": pa.array(
                    [pc.sum(b.column("html_bytes")).as_py() or 0], pa.int64()
                ),
            }
        )

    parts = ext.map_batches(partial, batch_format="pyarrow").take_all()
    return {
        "rows": sum(p["rows"] for p in parts),
        "errors": sum(p["errors"] for p in parts),
        "html_bytes": sum(p["html_bytes"] for p in parts),
    }


def job_summary(out_dir: str, skipped_this_run: int = 0) -> dict:
    records = []
    d = os.path.join(out_dir, "lineage")
    for f in sorted(os.listdir(d)):
        if f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                records.append(json.load(fh))
    return {
        "units": len(records),
        "skipped_this_run": skipped_this_run,
        "rows": sum(r["rows"] for r in records),
        "errors": sum(r["errors"] for r in records),
        "html_bytes": sum(r["html_bytes"] for r in records),
        "wall_sec_total": round(sum(r["wall_sec"] for r in records), 3),
    }


def bucket_local_dedup(out_dir: str, n_buckets: int):
    """Corpus-wide exact dedup over a bucketed layout WITHOUT a global
    shuffle: each bucket's directories (across all units) are read and
    deduped independently — the groupby key never leaves its bucket.
    Returns (text_hash, url) survivors as one Dataset (union of the
    per-bucket results).
    """
    import glob as _glob

    import ray.data

    from ..stages.dedup import exact_dedup

    results = None
    for b in range(n_buckets):
        # a LIST of paths must be files (a single dir path would work,
        # but bucket b spans many unit dirs)
        paths = sorted(
            _glob.glob(
                os.path.join(out_dir, "data", "unit=*", f"bucket={b}", "*.parquet")
            )
        )
        if not paths:
            continue
        bucket_ds = ray.data.read_parquet(paths, columns=["url", "text"])
        deduped = exact_dedup(bucket_ds, id_col="url", text_col="text")
        results = deduped if results is None else results.union(deduped)
    return results
