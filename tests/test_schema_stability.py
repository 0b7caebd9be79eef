"""Every registered query must return the SAME columns and dtypes at
different scale factors — schema must not drift with data volume
(empty partitions, all-null columns, pandas dtype degradation are the
classic causes)."""

import pandas as pd
import pytest


def _frame(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _sig(df: pd.DataFrame):
    return [(c, str(df[c].dtype)) for c in sorted(df.columns)]


# ngram_jaccard/dedup_clusters are O(n^2) oracle forms — cheap at these
# scales but slowest of the set; keep them in: schema drift matters most
# exactly where results can be empty.
@pytest.mark.parametrize("name", sorted(__import__("__ray_entry__").queries()))
def test_schema_stable_across_sf(ray_session, name):
    import __ray_entry__ as e

    fn = e.queries()[name]
    a = _frame(fn("/root/testdata/sf0.001"))
    b = _frame(fn("/root/testdata/sf0.01"))
    assert len(a.columns) > 0
    assert _sig(a) == _sig(b), (name, _sig(a), _sig(b))
