"""Keyed incremental state on raw Ray actors — the one place the engine
drops below the Dataset API (SURVEY.md §2.9 note; the brief's "shared
mutable index" case).

``KeyedStateIndex`` shards a mutable per-key state across N actors by
key hash. Batches stream in (from ``iter_batches`` or any stage) and
each actor folds its shard incrementally; the final state is collected
shard-by-shard. Use it when semantics genuinely need cross-batch
mutable state (running counters, online indexes); everything that can
be a groupby should stay a groupby.

The default fold keeps per-key (count, sum) — a running aggregate whose
END STATE equals a plain groupby, which is exactly what makes it
oracle-checkable while the *incremental* mechanics (arbitrary-order
partial updates, actor-sharded ownership) are the thing under test.
"""

from __future__ import annotations

import zlib

import pyarrow as pa


def _shard_actor_cls():
    import ray

    @ray.remote(num_cpus=0.5)
    class StateShard:
        def __init__(self):
            self.state: dict = {}

        def update(self, keys: list, values: list) -> int:
            st = self.state
            for k, v in zip(keys, values):
                cur = st.get(k)
                if cur is None:
                    st[k] = [1, v]
                else:
                    cur[0] += 1
                    cur[1] += v
            return len(st)

        def snapshot(self) -> dict:
            return self.state

    return StateShard


class KeyedStateIndex:
    """N-way sharded mutable (count, sum) index keyed by an int/str key."""

    def __init__(self, n_shards: int = 4):
        cls = _shard_actor_cls()
        self.n = n_shards
        self.shards = [cls.remote() for _ in range(n_shards)]

    def _shard_of(self, key) -> int:
        return zlib.crc32(str(key).encode()) % self.n

    def update_batch(self, batch: pa.Table, key_col: str, value_col: str):
        """Route one Arrow batch's rows to their owning shards (async)."""
        keys = batch.column(key_col).to_pylist()
        vals = batch.column(value_col).to_pylist()
        per_shard: dict[int, tuple[list, list]] = {}
        for k, v in zip(keys, vals):
            s = per_shard.setdefault(self._shard_of(k), ([], []))
            s[0].append(k)
            s[1].append(v)
        return [
            self.shards[i].update.remote(ks, vs)
            for i, (ks, vs) in per_shard.items()
        ]

    def consume(self, ds, key_col: str, value_col: str, batch_size: int = 4096):
        """Stream a Dataset through the index via driver-side
        iter_batches. Demo form — every row passes through one driver
        process; use ``consume_distributed`` for real volumes."""
        import ray

        pending = []
        for batch in ds.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
            pending.extend(self.update_batch(batch, key_col, value_col))
            # bounded in-flight updates: backpressure the feed
            while len(pending) > self.n * 4:
                _, pending = ray.wait(pending, num_returns=1)
                pending = list(pending)
        ray.get(pending)
        return self

    def consume_distributed(self, ds, key_col: str, value_col: str):
        """Feed the index from INSIDE map_batches tasks (r01 verdict #7):
        each task routes its batch's rows straight to the owning shard
        actors (the handles serialize into the UDF closure) and acks one
        count row; the driver only drives the count — no row ever
        funnels through it.

        Each task ray.get()s its shard updates before declaring the
        batch done, so a completed run has applied every row exactly
        once. Caveat (inherent to side-effecting maps): a mid-batch TASK
        RETRY would re-apply that batch's rows — a production deployment
        folds a per-batch dedup token into ``update`` for idempotency.
        """
        import ray

        shards = self.shards
        n = self.n

        def route(batch: pa.Table) -> pa.Table:
            keys = batch.column(key_col).to_pylist()
            vals = batch.column(value_col).to_pylist()
            per_shard: dict[int, tuple[list, list]] = {}
            for k, v in zip(keys, vals):
                s = per_shard.setdefault(zlib.crc32(str(k).encode()) % n, ([], []))
                s[0].append(k)
                s[1].append(v)
            ray.get(
                [shards[i].update.remote(ks, vs)
                 for i, (ks, vs) in per_shard.items()]
            )
            return pa.table({"n_rows": pa.array([len(batch)], pa.int64())})

        ds.map_batches(route, batch_format="pyarrow").sum("n_rows")
        return self

    def snapshot(self) -> pa.Table:
        """Collect the final state as (key, n, total)."""
        import ray

        rows: list[tuple] = []
        for shard in ray.get([s.snapshot.remote() for s in self.shards]):
            rows.extend((k, v[0], v[1]) for k, v in shard.items())
        rows.sort()
        return pa.table(
            {
                "key": pa.array([r[0] for r in rows]),
                "n": pa.array([r[1] for r in rows], pa.int64()),
                "total": pa.array([r[2] for r in rows]),
            }
        )
