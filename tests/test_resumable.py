"""Resumable checkpoint pipeline: lineage records, skip-on-resume,
crash recovery of a partial unit."""

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from gocrd_ray import pagegen
from gocrd_ray.pipelines import resumable


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    d = tmp_path_factory.mktemp("shards")
    paths = []
    for i in range(6):
        t = pagegen.gen_corpus_table(i * 50, 50)
        p = str(d / f"shard_{i:03d}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths


def test_plan_units_deterministic(shards):
    u1 = resumable.plan_units(shards, 2)
    u2 = resumable.plan_units(list(reversed(shards)), 2)
    assert u1 == u2  # order-insensitive (sorted inside)
    assert len(u1) == 3
    assert all(len(m) == 2 for _, m in u1)


def test_run_and_resume(ray_session, shards, tmp_path):
    out = str(tmp_path / "out")
    s1 = resumable.run_resumable(shards, out, shards_per_unit=2)
    assert s1["units"] == 3
    assert s1["rows"] == 300
    assert s1["skipped_this_run"] == 0
    assert s1["errors"] == sum(1 for i in range(300) if i % 211 == 5)

    # full resume: everything skipped, summary unchanged
    s2 = resumable.run_resumable(shards, out, shards_per_unit=2)
    assert s2["skipped_this_run"] == 3
    assert s2["rows"] == 300

    # output is complete and byte-identical per url
    got = pq.ParquetDataset(os.path.join(out, "data")).read(
        columns=["url", "text"]
    )
    texts = dict(zip(got.column("url").to_pylist(), got.column("text").to_pylist()))
    assert len(texts) == 300
    for i in range(300):
        d = pagegen.gen_doc(i)
        assert texts[d["url"]] == d["text"]


def test_crash_recovery_partial_unit(ray_session, shards, tmp_path):
    out = str(tmp_path / "out")
    resumable.run_resumable(shards, out, shards_per_unit=2)

    # simulate a crash: delete one unit's lineage, corrupt its data dir
    units = resumable.plan_units(shards, 2)
    victim = units[1][0]
    os.remove(os.path.join(out, "lineage", f"{victim}.json"))
    unit_dir = os.path.join(out, "data", f"unit={victim}")
    with open(os.path.join(unit_dir, "garbage.parquet"), "w") as f:
        f.write("not parquet")

    s = resumable.run_resumable(shards, out, shards_per_unit=2)
    assert s["skipped_this_run"] == 2  # the other two skipped
    assert s["units"] == 3 and s["rows"] == 300
    # the partial garbage was cleared before rewrite
    got = pq.ParquetDataset(unit_dir).read(columns=["url"])
    assert got.num_rows == 100


def test_lineage_records_carry_inputs(ray_session, shards, tmp_path):
    out = str(tmp_path / "out")
    resumable.run_resumable(shards, out, shards_per_unit=3)
    recs = [
        json.load(open(os.path.join(out, "lineage", f)))
        for f in sorted(os.listdir(os.path.join(out, "lineage")))
    ]
    assert len(recs) == 2
    all_inputs = sorted(sum((r["input_shards"] for r in recs), []))
    assert all_inputs == sorted(shards)
    assert all(r["html_bytes"] > 0 and r["wall_sec"] > 0 for r in recs)


def test_step_registry_compose(ray_session):
    import pyarrow as pa

    from gocrd_ray.pipelines import steps
    from gocrd_ray.sources.pages import pages_from_documents

    assert "extract_full" in steps.registered_steps()

    @steps.step("only_big_regions")
    def only_big(ds, *, min_lines=2):
        return ds.map_batches(
            lambda t, m=min_lines: t.filter(
                pa.compute.greater_equal(t["n_lines"], m)
            ),
            batch_format="pyarrow",
        )

    out = steps.compose(
        pages_from_documents("/root/testdata/sf0.001"),
        ["extract_full", "regions_flat", ("only_big_regions", {"min_lines": 3})],
    )
    rows = out.take_all()
    assert rows and all(r["n_lines"] >= 3 for r in rows)

    with pytest.raises(KeyError):
        steps.get_step("nope")


def test_salt_repartition_spreads_skewed_input(ray_session):
    """A single shard holding every giant document must spread across
    blocks after salt_repartition."""
    import pyarrow as pa
    import ray.data

    from gocrd_ray.pipelines.extract_pipeline import extract_pages, salt_repartition

    giant = pagegen.gen_doc(7)  # doc_id % 997 == 7 → giant row
    small = [pagegen.gen_doc(i) for i in range(10, 26) if i % 211 != 5]
    rows = [giant] * 8 + small
    tbl = pa.table(
        {
            "url": pa.array([f"{r['url']}#{i}" for i, r in enumerate(rows)]),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
        }
    )
    ds = ray.data.from_arrow(tbl)  # one fat block
    spread = salt_repartition(ds, 8).materialize()
    assert spread.num_blocks() == 8
    out = extract_pages(spread, mode="text").take_all()
    assert len(out) == len(rows)
    assert sum(1 for r in out if r["error"] is None) == len(rows)


def test_hash_bucket_uniformity(ray_session):
    import ray.data

    from gocrd_ray.stages import dedup

    docs = ray.data.read_parquet("/root/testdata/sf0.01/documents.parquet")
    bucketed = dedup.add_hash_bucket(docs, col="text", n_buckets=16)
    counts = {}
    for r in bucketed.groupby("bucket").count().take_all():
        counts[r["bucket"]] = r["count()"]
    assert len(counts) == 16
    # uniform-ish: no bucket takes more than 3x the mean
    mean = sum(counts.values()) / 16
    assert max(counts.values()) < 3 * mean


def test_semi_join_hrefs_broadcast_filter(ray_session):
    import pyarrow as pa
    import ray.data

    from gocrd_ray.oracle import MetsMatch
    from gocrd_ray.sources import manifest as mf

    man = pa.Table.from_pylist(
        [
            {"use": "A", "file_id": "F1", "mime_type": "m", "loc_type": "URL", "href": "u1"},
            {"use": "A", "file_id": "F2", "mime_type": "m", "loc_type": "URL", "href": "u2"},
            {"use": "B", "file_id": "F3", "mime_type": "m", "loc_type": "URL", "href": "u3"},
        ],
        schema=mf.MANIFEST_SCHEMA,
    )
    ds = ray.data.from_arrow(
        pa.table({"url": ["u1", "u2", "u3", "u4"], "v": [1, 2, 3, 4]})
    )
    kept = mf.semi_join_hrefs(ds, man, MetsMatch(use="A")).take_all()
    assert sorted(r["url"] for r in kept) == ["u1", "u2"]


def test_quality_filter_and_sample_steps(ray_session):
    import pyarrow as pa
    import ray.data

    from gocrd_ray.pipelines import steps

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": [
                    "a b",  # too short
                    "the the the the the the",  # all stopwords
                    "solid document with enough real words to pass the gate",
                    "another good document containing plenty of proper content here",
                ],
            }
        )
    )
    kept = steps.compose(docs, [("quality_filter", {"min_tokens": 5, "max_stopword_ratio": 0.5})]).take_all()
    assert sorted(r["doc_id"] for r in kept) == [2, 3]
    sampled = steps.compose(docs, [("sample", {"fraction": 0.5, "seed": 1})])
    assert sampled.count() <= 4


def test_bucketed_layout_and_bucket_local_dedup(ray_session, shards, tmp_path):
    """Bucketed output partitioning + bucket-local dedup must equal a
    global dedup (uniform digest buckets make them independent)."""
    import glob

    out = str(tmp_path / "out")
    s = resumable.run_resumable(shards, out, shards_per_unit=3, n_buckets=4)
    assert s["rows"] == 300
    bucket_dirs = glob.glob(os.path.join(out, "data", "unit=*", "bucket=*"))
    assert len({d.rsplit("bucket=", 1)[1] for d in bucket_dirs}) == 4

    local = resumable.bucket_local_dedup(out, 4).take_all()
    # global reference: dedup over everything at once
    import pyarrow.parquet as pq
    import ray.data

    from gocrd_ray.stages.dedup import exact_dedup

    everything = ray.data.read_parquet(
        glob.glob(os.path.join(out, "data", "unit=*", "bucket=*", "*.parquet")),
        columns=["url", "text"],
    )
    global_d = exact_dedup(everything, id_col="url", text_col="text").take_all()
    key = lambda r: (r["text_hash"] or "", r["url"])  # noqa: E731  (poison rows: null hash)
    assert sorted(local, key=key) == sorted(global_d, key=key)


def test_with_broadcast_helper(ray_session):
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from gocrd_ray.state.broadcast import WithBroadcast, broadcast

    lookup = {"a": 10, "b": 20}
    ref = broadcast(lookup)

    def enrich(batch: pa.Table, lut: dict) -> pa.Table:
        vals = [lut.get(k, -1) for k in batch.column("k").to_pylist()]
        return batch.append_column("v", pa.array(vals, pa.int64()))

    ds = ray.data.from_arrow(pa.table({"k": ["a", "b", "c"]}))
    out = ds.map_batches(
        WithBroadcast,
        fn_constructor_kwargs={"ref": ref, "fn": enrich},
        batch_format="pyarrow",
        concurrency=(1, 2),
    ).take_all()
    assert {r["k"]: r["v"] for r in out} == {"a": 10, "b": 20, "c": -1}
