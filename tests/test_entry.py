"""Driver-contract check: every queries() entry runs, and every
oracle_sql() entry matches it row-for-row (the same comparison the
driver performs at sf0.01, run here at sf0.001 for speed)."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return c


def _to_df(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64").round(9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())
ALL_KEYS = sorted(entrymod.queries().keys())


def test_entry_smoke(ray_session):
    res = entrymod.entry()
    df = _to_df(res)
    assert len(df) >= 1
    assert "doc_id" in df.columns and "score" in df.columns


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(ray_session, con, name):
    ray_result = entrymod.queries()[name](SF_DIR)
    sql = entrymod.oracle_sql()[name]
    want = con.execute(sql).fetchdf()
    got = _canon(_to_df(ray_result))
    want = _canon(want)
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)


def test_every_query_has_an_oracle():
    """Every registry query carries a DuckDB oracle — a future
    oracle-less query fails loudly here instead of silently downgrading
    to the driver's weaker rows-only check."""
    assert set(ALL_KEYS) == set(ORACLE_KEYS)


def test_near_dedup_cc_groupby_mode_equivalent(ray_session):
    """The near_dedup/dup_clusters composition stays correct with the
    connected-components reduce forced to the fully distributed
    large-star/small-star mode (the 100-TB shape): identical label
    table in both modes over the real augmented-docs pair graph."""
    import ray.data as rd

    from typesense_ray.functions.dedup import word_ngram_jaccard_pairs
    from typesense_ray.functions.graph import connected_components

    pairs = word_ngram_jaccard_pairs(
        entrymod._augmented_docs(SF_DIR),
        text_col="text", id_col="doc_id", n=3, threshold=0.6, df_cap=64,
    )
    assert pairs.num_rows > 0
    s = connected_components(rd.from_arrow(pairs), mode="stream").to_pandas()
    g = connected_components(rd.from_arrow(pairs), mode="groupby").to_pandas()
    pd.testing.assert_frame_equal(s, g)
