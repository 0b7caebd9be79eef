"""Multimodal plumbing: schemas, actor-pool stages, strict stub."""

import pyarrow as pa
import pytest

from gocrd_ray.stages import multimodal as mm


def _media_table(n=8):
    return pa.table(
        {
            "media_id": pa.array([f"m{i}" for i in range(n)], pa.string()),
            "kind": pa.array(["image"] * n, pa.string()),
            "payload": pa.array([bytes([i]) * (100 + i) for i in range(n)], pa.binary()),
            "mime_type": pa.array(["image/jpeg"] * n, pa.string()),
        },
        schema=mm.MEDIA_SCHEMA,
    )


def test_fake_image_decoder_deterministic():
    dec = mm.FakeImageDecoder()
    out1 = dec(_media_table())
    out2 = dec(_media_table())
    assert out1.equals(out2)
    assert out1.schema.equals(mm.IMAGE_META_SCHEMA)
    assert all(1 <= w <= 4096 for w in out1.column("width").to_pylist())
    assert out1.column("n_bytes").to_pylist() == [100 + i for i in range(8)]


def test_strict_decoder_raises():
    with pytest.raises(NotImplementedError):
        mm.StrictImageDecoder()(_media_table())


def test_audio_featurizer_shape():
    out = mm.FakeAudioFeaturizer()(_media_table())
    assert out.schema.equals(mm.AUDIO_FEAT_SCHEMA)
    assert all(len(f) == 16 for f in out.column("features").to_pylist())


def test_actor_pool_pipeline(ray_session):
    import ray.data

    from gocrd_ray.sources.pages import pages_from_documents

    pages = pages_from_documents("/root/testdata/sf0.001")
    media = mm.media_from_pages(pages)
    meta = mm.decode_images(media, batch_size=32, concurrency=(1, 2))
    rows = meta.take_all()
    assert len(rows) == 500
    assert all(r["n_bytes"] > 0 for r in rows)
    # featurize path through the Dataset API too
    feats = mm.featurize_audio(media, batch_size=32).take(5)
    assert all(len(r["features"]) == 16 for r in feats)


def test_ivf_recall_vs_bruteforce(ray_session):
    """The approximate IVF path must find most of the true neighbors
    (recall >= 0.5 with 4/16 buckets probed on random data)."""
    import ray.data

    from gocrd_ray.stages import similarity

    emb = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = similarity.brute_force_topk(emb, [0, 1, 2], k=10).take_all()
    approx = similarity.ivf_topk(emb, [0, 1, 2], k=10, n_buckets=16, n_probe=4).take_all()
    truth = {(r["query_id"], r["neighbor_id"]) for r in exact}
    got = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, recall


def test_simhash_pairs_find_duplicates(ray_session):
    """Exact duplicates must collide with hamming 0."""
    import pyarrow as pa
    import ray.data

    from gocrd_ray.stages import dedup

    texts = ["the quick brown fox jumps over the lazy dog"] * 2 + [
        "completely different content about data pipelines and arrow",
        "the quick brown fox jumps over the lazy cat",  # near-dup
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": texts})
    )
    pairs = dedup.simhash_candidate_pairs(ds, max_hamming=16).take_all()
    by_pair = {(p["id_a"], p["id_b"]): p["hamming"] for p in pairs}
    assert by_pair.get((0, 1)) == 0  # exact dup
    assert (0, 3) in by_pair or (1, 3) in by_pair  # near-dup caught


def test_pdf_layout_stub(ray_session):
    import ray.data

    from gocrd_ray.stages import pdf_layout
    from gocrd_ray.sources.pages import pages_from_documents
    from gocrd_ray.stages.multimodal import media_from_pages

    media = media_from_pages(pages_from_documents("/root/testdata/sf0.001"))
    out = pdf_layout.parse_pdfs(media, batch_size=64, engine="fake").take(10)
    assert all(r["error"] is None and r["n_pages"] >= 1 for r in out)
    # deterministic fake: same payload → same layout
    again = pdf_layout.parse_pdfs(media, batch_size=64, engine="fake").take(10)
    assert out == again
    with pytest.raises(Exception):
        pdf_layout.StrictPdfLayoutParser()._parse(b"x")
    # the real parser rejects non-PDF payloads as rows, never crashes
    real = pdf_layout.parse_pdfs(media, batch_size=64, engine="real").take(10)
    assert all(r["error"] is not None for r in real)


def test_pdf_real_roundtrip_and_operators():
    from gocrd_ray.stages import pdf_layout as pl

    pages = [
        [(72, 700, "Hello (world) \\ escaped"), (72, 600, "second block")],
        [(100, 500, "page two text")],
    ]
    for comp in (False, True):  # raw and FlateDecode content streams
        pdf = pl.encode_simple_pdf(pages, compress=comp)
        n, blocks = pl.PdfTextParser()._parse(pdf)
        assert n == 2
        assert [b["text"] for b in blocks] == [
            "Hello (world) \\ escaped", "second block", "page two text",
        ]
        assert blocks[0]["page_no"] == 0 and blocks[2]["page_no"] == 1
        assert blocks[0]["x0"] == 72.0 and blocks[0]["y0"] == 700.0
        assert blocks[0]["y1"] == 712.0  # y + font_size


def test_pdf_content_stream_operators():
    from gocrd_ray.stages import pdf_layout as pl

    # TJ array show, hex string, T* line advance, octal escapes, Tm
    stream = (
        b"BT /F1 10 Tf 50 100 Td [(ab) -120 (cd)] TJ ET\n"
        b"BT 1 0 0 1 30 40 Tm <48495F4A> Tj ET\n"
        b"BT 10 20 Td (l1) Tj T* (l2) Tj ET\n"
        b"BT 5 5 Td (oct \\101\\102) Tj ET\n"
    )
    blocks = pl.extract_content_text(stream)
    assert [b["text"] for b in blocks] == ["abcd", "HI_J", "l1\nl2", "oct AB"]
    assert blocks[1]["x0"] == 30.0 and blocks[1]["y0"] == 40.0
    l12 = blocks[2]
    assert l12["y0"] == 20.0 - 1.2 * 10 and l12["y1"] == 20.0 + 10


def test_ppm_bmp_roundtrip():
    import numpy as np

    from gocrd_ray.stages import multimodal as mm

    rng = np.random.RandomState(3)
    for h, w in [(1, 1), (5, 7), (16, 33), (9, 2)]:
        arr = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (mm.decode_ppm(mm.encode_ppm(arr)) == arr).all()
        assert (mm.decode_bmp(mm.encode_bmp(arr)) == arr).all()


def test_ppm_comment_header_and_pgm():
    import numpy as np

    from gocrd_ray.stages import multimodal as mm

    data = b"P6\n# a comment\n2 1\n255\n" + bytes([1, 2, 3, 4, 5, 6])
    assert mm.decode_ppm(data).tolist() == [[[1, 2, 3], [4, 5, 6]]]
    gray = b"P5\n2 2\n255\n" + bytes([10, 20, 30, 40])
    assert mm.decode_ppm(gray).shape == (2, 2, 1)


def test_resize_nearest_exact():
    import numpy as np

    from gocrd_ray.stages import multimodal as mm

    arr = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    small = mm.resize_nearest(arr, 2, 2)
    assert small[:, :, 0].tolist() == [[0, 2], [8, 10]]
    big = mm.resize_nearest(arr, 8, 8)
    assert big.shape == (8, 8, 1)


def test_real_image_decoder_poison_payloads():
    from gocrd_ray.stages import multimodal as mm

    batch = pa.table(
        {
            "media_id": ["ok", "jpeg", "trunc", "empty"],
            "payload": pa.array(
                [
                    mm.encode_ppm(__import__("numpy").full((2, 2, 3), 9, dtype="uint8")),
                    b"\xff\xd8\xff\xe0 fake jpeg",
                    b"P6\n100 100\n255\nshort",
                    b"",
                ],
                pa.binary(),
            ),
        }
    )
    out = mm.RealImageDecoder()(batch)
    rows = {r["media_id"]: r for r in out.to_pylist()}
    assert rows["ok"]["error"] is None and rows["ok"]["width"] == 2
    assert rows["ok"]["mean_r"] == 9.0
    assert rows["jpeg"]["error"] is not None
    assert rows["trunc"]["error"] is not None
    assert rows["empty"]["error"] is not None


def test_wav_featurizer_sine():
    import io
    import wave

    import numpy as np

    from gocrd_ray.stages import multimodal as mm

    rate, n, freq = 8000, 8000, 440.0
    t = np.arange(n)
    x = (np.sin(2 * np.pi * freq * t / rate) * 16000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(x.tobytes())
    batch = pa.table(
        {"media_id": ["s", "bad"],
         "payload": pa.array([buf.getvalue(), b"not a wav"], pa.binary())}
    )
    out = {r["media_id"]: r for r in mm.WavFeaturizer()(batch).to_pylist()}
    s = out["s"]
    assert s["error"] is None
    assert s["n_samples"] == n and s["duration_ms"] == 1000
    assert abs(s["rms"] - 16000 / 2 ** 0.5) < 100  # sine RMS = A/sqrt(2)
    # 440 Hz of 4000 Hz Nyquist → band index 1 of 16 dominates
    spec = s["spectrum"]
    assert spec.index(max(spec)) == 1
    # 880 sign changes per second, minus the 80 samples landing exactly
    # on zero (440/8000 = 11/200 → every 100th sample; x*x_next == 0 is
    # not < 0), = 800
    assert s["zero_crossings"] == 800
    assert out["bad"]["error"] is not None
