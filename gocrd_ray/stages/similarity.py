"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k is the baseline: the query matrix is broadcast
once (``ray.put``) and every batch does one float64 matmul against it,
emitting per-batch LOCAL top-k; a tiny groupby then merges the local
winners into the global top-k. Only (query_id, vec_id, sim) triples ever
shuffle — never the embeddings.

The scale path (`ivf_topk`) buckets vectors by nearest centroid
(k-means-lite on a seeded sample) and probes only the closest buckets —
same broadcast-and-matmul inner loop, restricted per bucket.

Near-duplicate detection (`cosine_neardup_pairs`) reuses the broadcast
pattern with the corpus itself as the query side at test scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _emb_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(arr[0])
    return flat.reshape(len(batch), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class TopKScorer:
    """Actor-pool stage: per-batch local top-k against broadcast queries.

    __init__ fetches + normalizes the query matrix once per actor;
    __call__ is one matmul + argpartition per batch.
    """

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id"):
        import ray

        qids, qmat = ray.get(queries_ref)
        self.qids = qids
        self.q = _normalize(qmat)
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        x = _normalize(_emb_matrix(batch))
        sims = self.q @ x.T  # (n_queries, n_batch)
        k = min(self.k, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            row = sims[qi]
            # local top-k with the ORACLE's tie order (-sim, vec_id):
            # argpartition keeps an arbitrary subset when ties straddle
            # the k boundary, which can diverge from the SQL ranking on
            # duplicate embeddings — lexsort is deterministic (primary
            # -sim, secondary vec_id asc)
            order = np.lexsort((ids, -row))[:k]
            out_q.extend([qid] * len(order))
            out_v.extend(ids[order].tolist())
            out_s.extend(row[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


def brute_force_topk(
    ds,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    exclude_self: bool = True,
):
    """Global cosine top-k per query: broadcast queries → local top-k per
    batch → groupby(query_id) merge. Returns (query_id, neighbor_id, rank).
    """
    import ray
    import pyarrow.compute as pc

    qset = set(query_ids)

    def grab_queries(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column(id_col), value_set=pa.array(query_ids))
        return batch.filter(mask)

    qtbl = ds.map_batches(grab_queries, batch_format="pyarrow").take_all()
    qrows = sorted(qtbl, key=lambda r: query_ids.index(r[id_col]))
    qids = [r[id_col] for r in qrows]
    qmat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    queries_ref = ray.put((qids, qmat))

    local = ds.map_batches(
        TopKScorer,
        fn_constructor_kwargs={"queries_ref": queries_ref, "k": k + 1, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def merge(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        rows.sort(key=lambda r: (-r["sim"], r["vec_id"]))
        qid = rows[0]["query_id"]
        out = []
        rank = 0
        for r in rows:
            if exclude_self and r["vec_id"] == qid:
                continue
            rank += 1
            if rank > k:
                break
            out.append(
                {"query_id": qid, "neighbor_id": r["vec_id"], "rank": rank}
            )
        return pa.Table.from_pylist(
            out,
            schema=pa.schema(
                [
                    ("query_id", pa.int64()),
                    ("neighbor_id", pa.int64()),
                    ("rank", pa.int64()),
                ]
            ),
        )

    return local.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def cosine_neardup_pairs(ds, threshold: float = 0.95, id_col: str = "vec_id"):
    """All pairs with cosine ≥ threshold (embedding near-dup dedup).

    Test-scale form: normalized corpus broadcast once, each batch matmuls
    against it and keeps pairs (i < j). At 10^12 scale the same kernel
    runs per LSH/IVF bucket instead of against the full corpus.
    """
    import ray

    mat_parts = ds.map_batches(
        lambda b: pa.table(
            {
                id_col: b.column(id_col),
                "embedding": b.column("embedding"),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    full = pa.concat_tables([ray.get(r) for r in mat_parts.to_arrow_refs()])
    all_ids = full.column(id_col).to_numpy(zero_copy_only=False)
    all_mat = _normalize(_emb_matrix(full))
    ref = ray.put((all_ids, all_mat))

    def pairs(batch: pa.Table) -> pa.Table:
        ids_all, mat_all = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        x = _normalize(_emb_matrix(batch))
        sims = x @ mat_all.T
        bi, bj = np.nonzero(sims >= threshold)
        keep = ids[bi] < ids_all[bj]
        return pa.table(
            {
                "id_a": pa.array(ids[bi][keep], pa.int64()),
                "id_b": pa.array(ids_all[bj][keep], pa.int64()),
                "sim": pa.array(sims[bi, bj][keep], pa.float64()),
            }
        )

    return mat_parts.map_batches(pairs, batch_format="pyarrow")


class HyperplaneSigner:
    """Actor-pool stage: embeddings → banded random-hyperplane sign
    keys (Charikar 2002 SRP-LSH, the cosine analog of MinHash bands).

    The Gaussian projection matrix is built once per actor (seeded, so
    every actor agrees); each batch is one matmul + sign + bit-pack.
    Emits (band, bkey, id) narrow triples — the ONLY thing the LSH
    shuffle ever moves.
    """

    def __init__(self, n_bits: int = 128, bands: int = 32, seed: int = 23,
                 id_col: str = "vec_id"):
        assert n_bits % bands == 0
        self.n_bits = n_bits
        self.bands = bands
        self.rows = n_bits // bands
        self.seed = seed
        self.id_col = id_col
        self.g: np.ndarray | None = None  # built on first batch (needs dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = _normalize(_emb_matrix(batch))
        if self.g is None or self.g.shape[1] != x.shape[1]:
            self.g = np.random.RandomState(self.seed).standard_normal(
                (self.n_bits, x.shape[1])
            )
        bits = (x @ self.g.T) >= 0.0  # (n, n_bits)
        keys = (
            bits.reshape(len(x), self.bands, self.rows)
            * (1 << np.arange(self.rows, dtype=np.int64))
        ).sum(axis=2)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        n = len(x)
        return pa.table(
            {
                "band": pa.array(
                    np.repeat(np.arange(self.bands, dtype=np.int32), n)
                ),
                "bkey": pa.array(keys.T.reshape(-1).astype(np.int64)),
                self.id_col: pa.array(np.tile(ids, self.bands)),
            }
        )


def cosine_neardup_pairs_lsh(
    ds,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    n_bits: int = 1024,
    bands: int = 64,
    seed: int = 23,
    n_buckets: int = 32,
    prefilter: bool = True,
    hot_run_cap: int | None = None,
    hot_mode: str = "error",
):
    """Scale path for embedding near-dup: random-hyperplane LSH buckets
    → distinct candidate pairs → EXACT cosine verification via
    co-partitioned embedding lookups. Same output contract as the
    broadcast form ``cosine_neardup_pairs`` (id_a < id_b, sim ≥
    threshold) but nothing corpus-sized is broadcast or driver-held.

    Recall per qualifying pair: with p = 1 − arccos(sim)/π the
    same-sign probability per hyperplane, a pair survives a band w.p.
    p^r (r = n_bits/bands) and is missed w.p. (1−p^r)^bands. Defaults
    r=16, bands=64: miss ≈ 2.5e-6 at sim 0.95 and ≈ 4e-3 at 0.9 —
    and identical vectors (exact dups) always collide. r also controls
    BUCKET SPARSITY: random non-dup pairs share a band w.p. 2^-r, so r
    must grow ~log2(corpus) to keep buckets O(1) (r=4 measured
    catastrophically dense at 5k vectors — buckets were corpus/16).
    LSH is inherently a HIGH-threshold tool: recall at sim 0.5 would
    need thousands of bands; use the broadcast oracle form at small
    scale for low thresholds.

    Shapes: the band shuffle moves (band:int32, bkey:int64, id) rows;
    pair emission is the sharded vectorized run scan
    (dedup._bucket_pairs); verification attaches BOTH sides' embeddings
    through one exploded-pair lookup shuffle (dedup.attach_pair_lookup
    — the embedding table crosses the wire once, not once per side)
    after prefiltering embeddings to candidate ids (the near-dup
    subset, broadcast as one set).
    """
    import ray
    import pyarrow.compute as pc

    from .dedup import HOT_RUN_CAP, _bucket_pairs, attach_pair_lookup

    # hot-bucket discipline (r4 verdict #1): d identical embeddings
    # collide in EVERY band → C(d,2)·bands pair rows from one logical
    # bucket. Default "error" because this operator's contract is the
    # exact pairs list (the SQL-mirrored neardup_cosine form); dedup
    # consumers that only need clusters pass hot_mode="star" —
    # cluster-preserving O(d) emission vs the run minimum.
    if hot_run_cap is None:
        hot_run_cap = HOT_RUN_CAP

    emb_type = pa.list_(pa.float32())

    sigs = ds.map_batches(
        HyperplaneSigner,
        fn_constructor_kwargs={
            "n_bits": n_bits, "bands": bands, "seed": seed, "id_col": id_col
        },
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    # raw per-band collisions go straight to the attach: duplicate
    # pairs collapse inside attach_pair_lookup's regroup, so the
    # distinct groupby (a whole all-to-all) is skipped
    cand = (
        _bucket_pairs(sigs, band_col="band", key_col="bkey", id_col=id_col,
                      hot_run_cap=hot_run_cap, hot_mode=hot_mode)
        .map_batches(
            lambda b: b.select(["id_a", "id_b"]), batch_format="pyarrow"
        )
        .materialize()
    )

    emb = ds.map_batches(
        lambda b: pa.table(
            {id_col: pc.cast(b.column(id_col), pa.int64()),
             "embedding": pc.cast(b.column("embedding"), emb_type)}
        ),
        batch_format="pyarrow",
    )
    if prefilter:
        # bounded Bloom prefilter over the candidate-id DATASET — no
        # driver-side set, no sorted-ndarray broadcast (r3 verdict #2);
        # Bloom false positives match no pair in the attach and drop
        # out, so the verified output stays exact
        from .dedup import bloom_id_prefilter

        emb = bloom_id_prefilter(emb, cand, id_col=id_col)

    # one exploded-pair shuffle attaches BOTH sides' embeddings —
    # the embedding table rides a single exchange (r2 verdict #3);
    # prefiltered streams are candidate-bounded, so coalesce blocks
    # to the candidate count, not the corpus block count
    nb = (
        max(4, min(4096, 4 * cand.count() // 8192 + 1))
        if prefilter else None
    )
    with_b = attach_pair_lookup(
        cand, emb, id_col=id_col, value_col="embedding",
        value_type=emb_type, out_a="emb_a", out_b="emb_b",
        n_buckets=n_buckets, num_blocks=nb,
    )

    def verify(b: pa.Table) -> pa.Table:
        # vectorized: drop rows with a missed lookup, then ONE reshape
        # of each side's flattened list<float> buffer + one row-wise dot
        rows = b.filter(
            pc.and_(pc.is_valid(b.column("emb_a")),
                    pc.is_valid(b.column("emb_b")))
        )
        if len(rows) == 0:
            return pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )

        def mat(col_name: str) -> np.ndarray:
            flat = pc.list_flatten(rows.column(col_name))
            return (
                flat.to_numpy(zero_copy_only=False)
                .astype(np.float64)
                .reshape(len(rows), -1)
            )

        sims = (_normalize(mat("emb_a")) * _normalize(mat("emb_b"))).sum(axis=1)
        keep = sims >= threshold
        return pa.table(
            {
                "id_a": pa.array(
                    rows.column("id_a").to_numpy(zero_copy_only=False)[keep]
                ),
                "id_b": pa.array(
                    rows.column("id_b").to_numpy(zero_copy_only=False)[keep]
                ),
                "sim": pa.array(sims[keep], pa.float64()),
            }
        )

    return with_b.map_batches(verify, batch_format="pyarrow")


def _fit_centroids(ds, n_buckets: int, seed: int) -> np.ndarray:
    """k-means-lite centroids on a seeded sample: a few Lloyd iterations
    over the (tiny, driver-held) sample sharpen the partition vs raw
    random picks; deterministic (seeded init, empty clusters keep their
    previous centroid). Shared by ivf_topk and semantic_dedup."""
    sample = ds.limit(max(n_buckets * 8, 128)).take_all()
    rng = np.random.RandomState(seed)
    smat = _normalize(
        np.array([r["embedding"] for r in sample], dtype=np.float64)
    )
    # corpora smaller than n_buckets degrade to one centroid per row
    # instead of crashing rng.choice(replace=False)
    n_buckets = min(n_buckets, len(smat))
    centroids = smat[rng.choice(len(smat), size=n_buckets, replace=False)]
    for _ in range(5):
        assign_s = (smat @ centroids.T).argmax(axis=1)
        for b in range(n_buckets):
            members = smat[assign_s == b]
            if len(members):
                centroids[b] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def semantic_dedup(
    ds,
    threshold: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    seed: int = 11,
    grid_bits: int = 0,
):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means cluster the embedding space, then within
    each cluster drop every item whose cosine similarity to an EARLIER
    item (ordered by similarity-to-centroid descending, ties by id)
    exceeds ``threshold``. One representative per semantic-duplicate
    group survives; cross-cluster duplicates are accepted misses, as in
    the paper.

    Scale shape (10^9 vectors): centroids fit on a seeded sample and
    broadcast once; cluster assignment is a streaming matmul map; the
    ONE shuffle is the groupby on cluster id; the O(m²) similarity
    matrix is per cluster, bounded by choosing ``n_clusters`` ∝ corpus
    size so clusters stay ~constant-sized (the paper runs 50k clusters
    for LAION-440M). Rows-only w.r.t. SQL (k-means is not
    SQL-expressible); behavior pinned in tests/test_rowsonly_validation
    against a brute-force reference.

    Returns ``(vec_id, cluster, keep, max_prior_sim)`` for every input
    row — the caller filters ``keep`` to materialize the deduplicated
    corpus, or inspects ``max_prior_sim`` to tune the threshold.

    ``grid_bits > 0`` swaps the k-means quantizer for a deterministic
    sign-bit grid (cluster = sum_d [emb[d] >= 0] << d over the first
    ``grid_bits`` dims) with within-cluster order by id ascending —
    the same within-cluster dedup rule, but the partition and order
    are ANSI-SQL-expressible, so the whole SemDeDup plumbing gets a
    bit-checked DuckDB mirror (q_semantic_dedup_grid). The k-means
    form stays the quality AND scale path: grid cells don't adapt to
    density, and a fixed ``grid_bits`` means 2^grid_bits clusters —
    at corpus scale ``grid_bits`` would have to grow with n to keep
    the per-cluster O(m²) bounded, exactly what k-means'
    ``n_clusters ∝ corpus size`` already does. The grid form is the
    verification harness, not the production quantizer.
    """
    import ray

    if grid_bits:
        weights = 1 << np.arange(grid_bits, dtype=np.int64)

        def assign(batch: pa.Table) -> pa.Table:
            x = _emb_matrix(batch)
            bits = (x[:, :grid_bits] >= 0).astype(np.int64)
            cluster = bits @ weights
            ids = batch.column(id_col)
            emb = batch.column("embedding")
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            return pa.table(
                {
                    id_col: ids,
                    "embedding": emb,
                    "cluster": pa.array(cluster, pa.int64()),
                    # constant csim -> the lexsort in dedup_cluster
                    # degenerates to pure id order (the SQL contract)
                    "csim": pa.array(np.zeros(len(x)), pa.float64()),
                }
            )
    else:
        centroids = _fit_centroids(ds, n_clusters, seed)
        cref = ray.put(centroids)

        def assign(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            x = _normalize(_emb_matrix(batch))
            sims = x @ c.T
            cluster = sims.argmax(axis=1)
            csim = sims[np.arange(len(x)), cluster]
            ids = batch.column(id_col)
            emb = batch.column("embedding")
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            return pa.table(
                {
                    id_col: ids,
                    "embedding": emb,
                    "cluster": pa.array(cluster, pa.int64()),
                    "csim": pa.array(csim, pa.float64()),
                }
            )

    def dedup_cluster(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        csim = group.column("csim").to_numpy(zero_copy_only=False)
        x = _normalize(_emb_matrix(group))
        # deterministic order: closest-to-centroid first, ties by id
        order = np.lexsort((ids, -csim))
        xo = x[order]
        m = len(order)
        sims = xo @ xo.T
        # max similarity to any STRICTLY EARLIER item in the order
        iu = np.triu_indices(m, k=1)
        upper = np.full((m, m), -np.inf)
        upper[iu] = sims[iu]
        max_prior = upper.max(axis=0) if m > 1 else np.full(m, -np.inf)
        max_prior[0] = -np.inf
        keep = ~(max_prior > threshold)
        out_ids = ids[order]
        cluster = group.column("cluster").to_numpy(zero_copy_only=False)[0]
        return pa.table(
            {
                id_col: pa.array(out_ids, pa.int64()),
                "cluster": pa.array(
                    np.full(m, cluster, dtype=np.int64), pa.int64()
                ),
                "keep": pa.array(keep, pa.bool_()),
                "max_prior_sim": pa.array(
                    np.where(np.isfinite(max_prior), max_prior, -1.0),
                    pa.float64(),
                ),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(dedup_cluster, batch_format="pyarrow")
    )


def ivf_topk(
    ds,
    query_ids: list[int],
    k: int = 10,
    n_buckets: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    seed: int = 11,
):
    """IVF-style approximate top-k: seeded-sample centroids → assign each
    vector to its nearest centroid inside map_batches → probe only the
    n_probe buckets closest to each query. The bucket assignment is the
    ONE shuffle key; everything else is broadcast + matmul.

    Approximate by construction (recall < 1 when true neighbors live in
    unprobed buckets) — benchmark against brute_force_topk for recall.
    """
    import ray

    centroids = _fit_centroids(ds, n_buckets, seed)
    cref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        x = _normalize(_emb_matrix(batch))
        bucket = (x @ c.T).argmax(axis=1)
        return batch.append_column("bucket", pa.array(bucket, pa.int32()))

    bucketed = ds.map_batches(assign, batch_format="pyarrow")

    # fetch ONLY the query vectors: filtered map then take_all of the
    # handful of matching rows (never the full table on the driver)
    import pyarrow.compute as pc

    def grab_queries(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column(id_col), value_set=pa.array(query_ids))
        return batch.filter(mask)

    qtbl = ds.map_batches(grab_queries, batch_format="pyarrow").take_all()
    qtbl = sorted(qtbl, key=lambda r: query_ids.index(r[id_col]))
    qids = [r[id_col] for r in qtbl]
    qmat = _normalize(np.array([r["embedding"] for r in qtbl], dtype=np.float64))
    probe = np.argsort(-(qmat @ centroids.T), axis=1)[:, :n_probe]
    qref = ray.put((qids, qmat, probe))

    def score(batch: pa.Table) -> pa.Table:
        ids_q, qm, pr = ray.get(qref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        buckets = batch.column("bucket").to_numpy(zero_copy_only=False)
        x = _normalize(_emb_matrix(batch))
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(ids_q):
            mask = np.isin(buckets, pr[qi])
            if not mask.any():
                continue
            row = qm[qi] @ x[mask].T
            sub_ids = ids[mask]
            kk = min(k + 1, row.shape[0])
            # deterministic tie order (-sim, vec_id), as in TopKScorer
            order = np.lexsort((sub_ids, -row))[:kk]
            out_q.extend([qid] * len(order))
            out_v.extend(sub_ids[order].tolist())
            out_s.extend(row[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    local = bucketed.map_batches(score, batch_format="pyarrow")

    def merge(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        rows.sort(key=lambda r: (-r["sim"], r["vec_id"]))
        qid = rows[0]["query_id"]
        out = []
        rank = 0
        for r in rows:
            if r["vec_id"] == qid:
                continue
            rank += 1
            if rank > k:
                break
            out.append({"query_id": qid, "neighbor_id": r["vec_id"], "rank": rank})
        return pa.Table.from_pylist(
            out,
            schema=pa.schema(
                [("query_id", pa.int64()), ("neighbor_id", pa.int64()), ("rank", pa.int64())]
            ),
        )

    return local.groupby("query_id").map_groups(merge, batch_format="pyarrow")
