"""Unit tests for the mixture-resampling stage (stages/mix.py). The
SQL-parity check runs in test_queries_vs_duckdb via the `mix_sample`
registry entry."""

import numpy as np
import pyarrow as pa
import pytest

from gocrd_ray.stages import mix


def test_thresholds_scarcest_lang_keeps_all():
    counts = {"en": 300, "de": 50}
    th = mix.mixture_thresholds(counts, {"en": 1.0, "de": 1.0})
    assert th["de"] is None  # scarcest: keeps 100%
    # en keeps 50/300: floor(1/6 * 2^32) = 0x2aaaaaaa
    assert th["en"] == format(int((1.0 * (50 / 1.0)) / 300 * 4294967296), "08x")


def test_thresholds_respect_weights():
    counts = {"en": 300, "de": 100}
    th = mix.mixture_thresholds(counts, {"en": 2.0, "de": 1.0})
    # s = min(300/2, 100/1) = 100 → en rate 200/300, de keeps all
    assert th["de"] is None
    assert th["en"] == format(int(((2.0 * 100.0) / 300) * 4294967296), "08x")


def test_thresholds_zero_count_and_bad_weight():
    th = mix.mixture_thresholds({"en": 10}, {"en": 1.0, "xx": 5.0})
    assert th["xx"] is None  # no rows → vacuous
    with pytest.raises(ValueError):
        mix.mixture_thresholds({"en": 10}, {"en": 0.0})


def test_mixture_sample_proportions_and_determinism(ray_session):
    import ray

    n = 3000
    rng_langs = ["en"] * 2000 + ["de"] * 600 + ["fr"] * 400
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": pa.array(rng_langs, pa.string()),
        }
    )
    targets = {"en": 1.0, "de": 1.0}
    out1 = (
        mix.mixture_sample(ray.data.from_arrow(t), targets)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out2 = (
        mix.mixture_sample(ray.data.from_arrow(t), targets)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out1.equals(out2)  # hash decision ⇒ run-to-run identical
    by_lang = out1.groupby("lang").size().to_dict()
    assert "fr" not in by_lang  # whitelist semantics
    assert by_lang["de"] == 600  # scarcest keeps all
    # en downsampled toward 600 (hash noise ~±3·sqrt(600) ≈ 75)
    assert abs(by_lang["en"] - 600) < 75


def test_null_lang_and_null_id_dropped(ray_session):
    import ray

    t = pa.table(
        {
            "doc_id": pa.array([1, None, 3], pa.int64()),
            "lang": pa.array(["en", "en", None], pa.string()),
        }
    )
    out = mix.mixture_sample(
        ray.data.from_arrow(t), {"en": 1.0}
    ).to_pandas()
    assert out["doc_id"].tolist() == [1]
