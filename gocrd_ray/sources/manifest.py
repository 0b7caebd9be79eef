"""Manifest module — the METS analog (SURVEY.md §2.1 S2/S3, §2.6 J2).

The reference's METS manifest maps logical file groups (``USE``) to
physical file URLs (mets/mets.go:22-26,86-94); consumers query it with
``mets.Match{Use, FileID, MIMEType}`` (empty string = ignore,
mets/mets.go:61-83) and use the resulting hrefs to decide which files to
open. Our engine treats the manifest as a *small driver-side table*
(MANIFEST_SCHEMA): query it with ``manifest_find``, then feed the
selected hrefs to ``read_parquet(paths=...)`` — manifest-driven shard
selection is partition pruning, not a distributed join. For
manifest-membership filtering of an already-built Dataset,
``semi_join_hrefs`` broadcasts the (tiny) href set via ``ray.put`` and
filters inside ``map_batches`` — never a shuffle join.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..model import MANIFEST_SCHEMA
from ..oracle import MetsMatch

_ = MetsMatch  # re-exported: same predicate object as the oracle

PAGE_MIME = "application/vnd.prima.page+xml"
ALTO_MIME = "application/alto+xml"


def read_manifest(path: str) -> pa.Table:
    """Read a manifest Parquet file (small side — driver memory)."""
    return pq.read_table(path).cast(MANIFEST_SCHEMA)


def manifest_from_nation(sf_dir: str) -> pa.Table:
    """Deterministic manifest derived from the nation table.

    Mirrors the shape of the reference fixture (3 fileGrps, two MIME
    types, one group empty — mets/testdata/mets.xml): group by
    n_nationkey % 3, GRP_2 intentionally kept empty (the comment-only
    OCR-D-IMG analog, mets/mets_test.go:18) by remapping its members to
    GRP_0. Must stay in sync with the SQL in __ray_entry__.oracle_sql.
    """
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
    keys = nat.column("n_nationkey").to_pylist()
    rows = []
    for k in sorted(keys):
        grp = k % 3
        if grp == 2:
            grp = 0
        rows.append(
            {
                "use": f"GRP_{grp}",
                "file_id": f"F_{k}",
                "mime_type": PAGE_MIME if k % 2 == 0 else ALTO_MIME,
                "loc_type": "URL",
                "href": f"shards/part_{k:04d}.parquet",
            }
        )
    return pa.Table.from_pylist(rows, schema=MANIFEST_SCHEMA)


def manifest_find(manifest: pa.Table, m: MetsMatch) -> pa.Table:
    """All files matching the predicate — mets.Find (mets/mets.go:53-59):
    conjunctive equality, empty-string fields ignored."""
    mask = None
    for field, want in (
        ("use", m.use),
        ("file_id", m.file_id),
        ("mime_type", m.mime_type),
    ):
        if not want:
            continue
        e = pc.equal(manifest.column(field), want)
        mask = e if mask is None else pc.and_(mask, e)
    return manifest if mask is None else manifest.filter(mask)


def manifest_find_file_grp(manifest: pa.Table, use: str) -> pa.Table:
    """mets.FindFileGrp shorthand (mets/mets.go:47-49)."""
    return manifest_find(manifest, MetsMatch(use=use))


def selected_hrefs(manifest: pa.Table, m: MetsMatch) -> list[str]:
    """The physical shard list a read should be limited to."""
    return manifest_find(manifest, m).column("href").to_pylist()


def semi_join_hrefs(ds, manifest: pa.Table, m: MetsMatch, key: str = "url"):
    """Filter a Dataset to rows whose ``key`` is in the manifest selection.

    Broadcast small side: the href set is ray.put once and read inside
    every task — no shuffle (SURVEY.md §2.6 J2).
    """
    import ray

    hrefs_ref = ray.put(set(selected_hrefs(manifest, m)))

    def keep(batch: pa.Table) -> pa.Table:
        hrefs = ray.get(hrefs_ref)
        mask = pc.is_in(batch.column(key), value_set=pa.array(sorted(hrefs)))
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def anti_join_blocklist(ds, blocked: set[str], key: str = "url"):
    """Broadcast ANTI-join: drop rows whose ``key`` is in the blocklist
    (domain/url exclusion — the standard CC compliance stage). The
    blocklist is ray.put once; each batch filters with a vectorized
    is_in + invert. No shuffle.
    """
    import ray

    ref = ray.put(pa.array(sorted(blocked)))

    def drop(batch: pa.Table) -> pa.Table:
        bl = ray.get(ref)
        mask = pc.invert(pc.is_in(batch.column(key), value_set=bl))
        return batch.filter(mask)

    return ds.map_batches(drop, batch_format="pyarrow")
