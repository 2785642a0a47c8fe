import glob

import pandas as pd

from datax_spark.fixtures import generate_wal


def test_deterministic(tmp_path):
    a = generate_wal(str(tmp_path / "a"), n_keys=50, n_events=200, n_segments=2)
    b = generate_wal(str(tmp_path / "b"), n_keys=50, n_events=200, n_segments=2)
    pd.testing.assert_frame_equal(a.expected, b.expected)
    for fa, fb in zip(
        sorted(glob.glob(a.wal_dir + "/*.parquet")), sorted(glob.glob(b.wal_dir + "/*.parquet"))
    ):
        pd.testing.assert_frame_equal(pd.read_parquet(fa), pd.read_parquet(fb))


def test_wal_invariants(wal_fixture):
    df = pd.concat(
        [pd.read_parquet(f) for f in sorted(glob.glob(wal_fixture.wal_dir + "/*.parquet"))]
    )
    originals = df.drop_duplicates(subset="lsn")
    # gap-free strictly-increasing lsn over originals
    assert sorted(originals["lsn"]) == list(range(wal_fixture.n_events))
    # late re-deliveries exist and are verbatim duplicates
    assert len(df) > wal_fixture.n_events
    dup_lsns = df[df.duplicated(subset="lsn", keep=False)]["lsn"].unique()
    for lsn in dup_lsns[:5]:
        sub = df[df["lsn"] == lsn].drop_duplicates()
        assert len(sub) == 1
    # first event per key is I; D events carry null payload
    first_ops = df.sort_values("lsn").groupby(["repo", "path"]).first()["op"]
    assert (first_ops == "I").all()
    d = df[df["op"] == "D"]
    assert d["content"].isna().all() and d["commit"].isna().all()


def test_expected_fold(wal_fixture):
    exp = wal_fixture.expected
    assert len(exp) > 0
    assert exp["content_sha256"].str.len().eq(64).all()
    assert not exp.duplicated(subset=["repo", "path"]).any()
