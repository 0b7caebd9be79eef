"""Join operators (SURVEY.md §2.6 — the reference only has the
intra-document RO⋈TextRegion join and the manifest semi-join; these are
the [scale] generalizations a corpus engine needs).

Three shapes, chosen by side sizes:

* ``broadcast_join`` — small side fits in memory: ``ray.put`` once,
  vectorized ``pyarrow.Table.join`` against it inside every batch.
  No shuffle at all.
* ``partitioned_hash_join`` — both sides large: add ``bucket =
  hash(key) % B`` to both, align schemas, union, ONE groupby(bucket)
  shuffle, and join the two sides of each bucket with Arrow's hash
  join inside ``map_groups``. B bounds per-task memory to
  ~(|L|+|R|)/B; salt hot keys by raising B.
* ``asof_join_latest`` — event-time as-of: per entity, match each left
  row to the most recent right row at-or-before its timestamp
  (``pd.merge_asof`` direction='backward' per key group).

All three emit a FIXED output schema regardless of group contents —
map_groups callbacks must never let per-group column dropping leak
schema instability into the stream.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def broadcast_join(ds, small: pa.Table, *, keys, join_type: str = "inner"):
    """Join a Dataset against a small broadcast table per batch.

    ``small`` is put in the object store once; every batch runs one
    vectorized Arrow hash join against it.
    """
    import ray

    ref = ray.put(small)

    def join_batch(batch: pa.Table) -> pa.Table:
        rhs = ray.get(ref)
        return batch.join(rhs, keys=keys, join_type=join_type)

    return ds.map_batches(join_batch, batch_format="pyarrow")


def _bucket_of(col, n_buckets: int) -> pa.Array:
    # hash of the decimal/string form: uniform, deterministic (fixed
    # default hash_array key), equal for equal keys regardless of
    # integer width. Arrow cast + one hash_array call — no per-row
    # Python; this path sees every row of both join sides.
    import numpy as np
    import pandas as pd

    strs = pc.fill_null(pc.cast(col, pa.string()), "None")
    if isinstance(strs, pa.ChunkedArray):
        strs = strs.combine_chunks()
    h = pd.util.hash_array(
        np.asarray(strs, dtype=object), categorize=False
    )
    return pa.array((h % np.uint64(n_buckets)).astype(np.int32), pa.int32())


def _aligned(batch: pa.Table, target: pa.Schema) -> pa.Table:
    cols = []
    for f in target:
        if f.name in batch.column_names:
            cols.append(pc.cast(batch.column(f.name), f.type))
        else:
            cols.append(pa.nulls(len(batch), f.type))
    return pa.Table.from_arrays(cols, schema=target)


def partitioned_hash_join(
    left_ds,
    right_ds,
    *,
    left_key: str,
    right_key: str,
    n_buckets: int = 32,
    join_type: str = "inner",
):
    """Both-sides-large equi-join. Output columns: all left columns,
    then right columns except ``right_key`` (the key appears once,
    under ``left_key``)."""
    lschema = left_ds.schema().base_schema
    rschema = right_ds.schema().base_schema
    lnames = list(lschema.names)
    rnames = [n for n in rschema.names if n != right_key]
    overlap = set(lnames) & set(rnames)
    if overlap:
        raise ValueError(f"column collision: {sorted(overlap)}")

    union_fields = (
        [lschema.field(n) for n in lnames]
        + [rschema.field(right_key)]
        + [rschema.field(n) for n in rnames]
        + [pa.field("__bucket", pa.int32()), pa.field("__side", pa.string())]
    )
    union_schema = pa.schema(union_fields)
    out_schema = pa.schema(
        [lschema.field(n) for n in lnames] + [rschema.field(n) for n in rnames]
    )

    def tag(side: str, key: str):
        def fn(b: pa.Table) -> pa.Table:
            b = b.append_column("__bucket", _bucket_of(b.column(key), n_buckets))
            b = b.append_column("__side", pa.array([side] * len(b), pa.string()))
            return _aligned(b, union_schema)

        return fn

    both = left_ds.map_batches(tag("l", left_key), batch_format="pyarrow").union(
        right_ds.map_batches(tag("r", right_key), batch_format="pyarrow")
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        lmask = pc.equal(group.column("__side"), "l")
        left = group.filter(lmask).select(lnames)
        right = group.filter(pc.invert(lmask)).select([right_key] + rnames)
        joined = left.join(
            right, keys=[left_key], right_keys=[right_key], join_type=join_type
        )
        return _aligned(joined, out_schema)

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


def asof_join_latest(
    left_ds,
    right_ds,
    *,
    on: str,
    by: str,
    right_cols: list[str],
    suffix: str = "_asof",
):
    """As-of join: for each left row, the most recent right row with
    ``right.on <= left.on`` in the same ``by`` group; the requested
    right columns are appended as ``<col><suffix>`` (null when no prior
    right row exists)."""
    lschema = left_ds.schema().base_schema
    rschema = right_ds.schema().base_schema
    lnames = list(lschema.names)
    union_fields = [lschema.field(n) for n in lnames]
    seen = set(lnames)
    for c in [on, by] + right_cols:
        if c not in seen:
            union_fields.append(rschema.field(c))
            seen.add(c)
    union_schema = pa.schema(union_fields + [pa.field("__side", pa.string())])
    out_schema = pa.schema(
        [lschema.field(n) for n in lnames]
        + [
            pa.field(c + suffix, rschema.field(c).type)
            for c in right_cols
        ]
    )

    def tag(side: str):
        def fn(b: pa.Table) -> pa.Table:
            b = b.append_column("__side", pa.array([side] * len(b), pa.string()))
            return _aligned(b, union_schema)

        return fn

    both = left_ds.map_batches(tag("l"), batch_format="pyarrow").union(
        right_ds.map_batches(tag("r"), batch_format="pyarrow")
    )

    def per_key(group: pa.Table) -> pa.Table:
        import pandas as pd

        df = group.to_pandas()
        is_left = df["__side"] == "l"
        left = df.loc[is_left, lnames].sort_values(on, kind="mergesort")
        renamed = [c + suffix for c in right_cols]
        right = (
            df.loc[~is_left, [on] + right_cols]
            .rename(columns=dict(zip(right_cols, renamed)))
            # deterministic tie-break: among equal timestamps merge_asof
            # takes the LAST row, so sort by every column — otherwise the
            # pick would depend on shuffle arrival order
            .sort_values([on] + renamed, kind="mergesort")
        )
        if len(left) == 0:
            return out_schema.empty_table()
        merged = pd.merge_asof(left, right, on=on, direction="backward")
        return _aligned(
            pa.Table.from_pandas(merged, preserve_index=False), out_schema
        )

    return both.groupby(by).map_groups(per_key, batch_format="pyarrow")


def native_join(left_ds, right_ds, *, on, right_on=None,
                join_type: str = "inner", num_partitions: int = 16):
    """Ray Data's built-in hash-partitioned join (Dataset.join,
    available since 2.46): the engine-managed equivalent of
    partitioned_hash_join — prefer it when present; the explicit
    bucketed form above stays as the portable/controllable fallback
    (custom bucket counts, salting, provenance columns)."""
    return left_ds.join(
        right_ds,
        join_type=join_type,
        num_partitions=num_partitions,
        on=tuple(on) if not isinstance(on, str) else (on,),
        right_on=(
            None
            if right_on is None
            else (tuple(right_on) if not isinstance(right_on, str) else (right_on,))
        ),
    )


def interval_join_broadcast(left_ds, intervals: pa.Table, *,
                            ts_col: str, lo_col: str = "lo",
                            hi_col: str = "hi",
                            left_cols=None, interval_cols=None):
    """Range (interval) join: every left row pairs with every interval
    whose half-open [lo, hi) span contains its timestamp — the
    sessionless windowed-attribution shape (event x campaign window,
    log line x maintenance window).  Intervals may OVERLAP, so a row
    can match several of them (unlike ``asof_join_latest``'s 1:1).

    Scale shape: the interval table is the SMALL side — broadcast once
    via ``ray.put``, fetched once per actor, matched per batch with a
    vectorized (n x K) comparison; the big side streams, zero shuffle.
    Per-batch cost is O(rows x K): right for K up to a few thousand.
    For a LARGE interval table, co-partition both sides by time bucket
    (floor(ts / bucket) on the left; every overlapped bucket on the
    right) and run this join inside each group — the
    partitioned_hash_join pattern with time as the key.

    Timestamps compare as int64 (epoch microseconds for Arrow
    timestamp columns — the exact-parity contract with SQL's
    ``epoch_us``)."""
    import numpy as np
    import ray

    left_cols = list(left_cols or [c for c in left_ds.schema().names])
    interval_cols = list(
        interval_cols
        or [c for c in intervals.schema.names if c not in (lo_col, hi_col)]
    )
    overlap = set(left_cols) & set(interval_cols)
    if overlap:
        # same loud contract as partitioned_hash_join — a dict-key
        # collision would silently return interval values under the
        # left column's name
        raise ValueError(f"column collision: {sorted(overlap)}")

    def _as_i64(col) -> "np.ndarray":
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.int64())
        return col.to_numpy(zero_copy_only=False).astype(np.int64)

    lo = _as_i64(intervals.column(lo_col))
    hi = _as_i64(intervals.column(hi_col))
    iref = ray.put((lo, hi, intervals.select(interval_cols)))

    class _Probe:
        def __init__(self, iref):
            import ray as _ray

            self.lo, self.hi, self.itab = _ray.get(iref)

        def __call__(self, b: pa.Table) -> pa.Table:
            itab = self.itab
            if b.num_rows == 0:
                cols = {c: b.column(c) for c in left_cols}
                for c in itab.schema.names:
                    cols[c] = pa.array([], itab.schema.field(c).type)
                return pa.table(cols)
            ts = _as_i64(b.column(ts_col))
            mask = (ts[:, None] >= self.lo[None, :]) & (
                ts[:, None] < self.hi[None, :]
            )
            li, wi = np.nonzero(mask)
            out = b.select(left_cols).take(pa.array(li, pa.int64()))
            cols = {c: out.column(c) for c in left_cols}
            for c in itab.schema.names:
                cols[c] = itab.column(c).take(pa.array(wi, pa.int64()))
            return pa.table(cols)

    return left_ds.map_batches(
        _Probe,
        fn_constructor_args=(iref,),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
