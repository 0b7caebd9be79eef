"""Byte-exactness through the FULL distributed path including Parquet
round-trips (SURVEY §7 hard part a): the Kant fixture and unicode
probes must come back bit-identical after pages-parquet → Ray read →
extract → write-parquet → read."""

import pyarrow as pa
import pyarrow.parquet as pq

from gocrd_ray import oracle, pagegen


def test_fixture_through_parquet_roundtrip(ray_session, kant_bytes, tmp_path):
    import ray.data

    from gocrd_ray.pipelines.extract_pipeline import extract_pages

    want = oracle.Page.from_bytes(kant_bytes).doc_text()
    # sanity: the fixture really carries the nasty bytes
    assert "ſ" in want and "\n\t\t\t\t" in want and "aͤ" in want

    pages = pa.table(
        {
            "url": pa.array(["kant"], pa.string()),
            "warc_ts": pa.array([None], pa.timestamp("us")),
            "html": pa.array([kant_bytes], pa.binary()),
            "text": pa.array([want], pa.string()),
            "lang": pa.array(["de"], pa.string()),
        }
    )
    in_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    pq.write_table(pages, in_dir + ".parquet")

    ds = ray.data.read_parquet(in_dir + ".parquet")
    extract_pages(ds, mode="full").write_parquet(out_dir)

    back = pq.ParquetDataset(out_dir).read()
    got = back.column("text")[0].as_py()
    assert got == want  # byte-identical through two parquet hops
    assert got.encode("utf-8") == want.encode("utf-8")
    spans = back.column("spans")[0].as_py()
    assert [s["region_id"] for s in spans] == ["r_1_1", "r_2_1", "r_2_2", "r_2_3"]
    page = oracle.Page.from_bytes(kant_bytes)
    for s in spans:  # every span slices to that region's canonical text
        region, found = page.find_region_by_id(s["region_id"])
        assert found
        assert got[s["start"] : s["end"]] == region.text_equiv_unicode_at(0)[0]
    regions = back.column("regions")[0].as_py()
    r21 = next(r for r in regions if r["region_id"] == "r_2_1")
    assert "ſowohl" in "".join(l["text"] or "" for l in r21["lines"])


def test_pagegen_is_pure(tmp_path):
    """Same (seed, doc_id) → identical bytes, independent of call order
    and process — required for shardable distributed generation."""
    a = pagegen.gen_doc(123, seed=42)
    _ = [pagegen.gen_doc(i) for i in range(50)]  # interleave other calls
    b = pagegen.gen_doc(123, seed=42)
    assert a == b
    import subprocess, sys, json

    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import json, hashlib; from gocrd_ray import pagegen; "
            "d = pagegen.gen_doc(123, seed=42); "
            "print(json.dumps({'h': hashlib.sha256(d['html']).hexdigest(), "
            "'t': hashlib.sha256((d['text'] or '').encode()).hexdigest()}))",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    import hashlib

    fresh = json.loads(out.stdout)
    assert fresh["h"] == hashlib.sha256(a["html"]).hexdigest()
    assert fresh["t"] == hashlib.sha256(a["text"].encode()).hexdigest()


def test_cli_extract(ray_session, tmp_path):
    """Drive the CLI surface end-to-end (module invocation)."""
    import pyarrow.parquet as pq

    from gocrd_ray.__main__ import main

    shard = str(tmp_path / "in.parquet")
    pq.write_table(pagegen.gen_corpus_table(0, 40), shard)
    rc = main(
        ["extract", "--input", shard, "--output", str(tmp_path / "o"), "--mode", "text"]
    )
    assert rc == 0
    got = pq.ParquetDataset(str(tmp_path / "o")).read(columns=["url", "text"])
    assert got.num_rows == 40


def test_actor_pool_extraction_matches_task_path(ray_session):
    """extract_pages(use_actors=True) must produce identical rows to the
    stateless-task path."""
    from gocrd_ray.pipelines.extract_pipeline import extract_pages
    from gocrd_ray.sources.pages import synthetic_pages

    a = extract_pages(synthetic_pages(300), mode="text").take_all()
    b = extract_pages(
        synthetic_pages(300), mode="text", use_actors=True, batch_size=64,
        concurrency=(1, 2)
    ).take_all()
    key = lambda r: r["url"]  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_cli_gen_and_steps(ray_session, tmp_path, capsys):
    import json

    import pyarrow.parquet as pq

    from gocrd_ray.__main__ import main

    assert main(["gen", "--n-docs", "30", "--output", str(tmp_path / "g")]) == 0
    assert pq.ParquetDataset(str(tmp_path / "g")).read().num_rows == 30
    assert main(["steps"]) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert "extract_full" in json.loads(out)
    assert main(["extract", "--input", "/nonexistent/*.parquet",
                 "--output", str(tmp_path / "x")]) == 2
