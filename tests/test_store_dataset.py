"""DatasetGraphStore conformance — same 7-triple fixture as the memory
backend, exercised through the lazy Ray Dataset path, plus the
distributed primitives (dedup, anti-join, N-Triples sink round-trip)."""

import os

import pytest

from ontograph_ray.store import DatasetGraphStore, dedup
from ontograph_ray.triples import Triple, triples_to_table

from test_store import G, TT, fixture_triples


@pytest.fixture
def dstore(ray_session):
    return DatasetGraphStore.from_triples(G, fixture_triples())


def test_uri_and_size(dstore):
    assert dstore.get_uri() == G
    assert dstore.size() == len(TT)


def test_get_all_matches(dstore):
    got = dstore.get_all_matches("", f"<{G}#rel-1>", "")
    assert sorted(got) == sorted(TT[0:3])
    assert dstore.get_all_matches("", f"<{G}#rel-1>", '"lit1"') == []
    assert sorted(dstore.get_all_matches()) == sorted(TT)


def test_get_first_match(dstore):
    assert dstore.get_first_match("", f"<{G}#rel-3>", '"lit1"') == TT[4]
    assert dstore.get_first_match(f"<{G}>", f"<{G}#rel-1>", "") in TT[0:3]
    assert dstore.get_first_match("", f"<{G}#rel-42>", "") is None


def test_without_matches(dstore):
    out = dstore.without_matches("", "", f"<{G}#b>")
    trps = out.get_all_matches()
    assert TT[1] not in trps and TT[3] not in trps
    assert len(trps) == 5


def test_add_triples_unchecked_dedups(dstore):
    # re-adding existing triples plus one new one: set semantics hold
    new = Triple(f"<{G}#a>", f"<{G}#rel-9>", '"new"')
    out = dstore.add_triples_unchecked([TT[0], TT[1], new])
    trps = out.get_all_matches()
    assert len(trps) == len(TT) + 1
    assert new in trps


def test_delete_triples_unchecked(dstore):
    out = dstore.delete_triples_unchecked([TT[0], TT[4]])
    trps = out.get_all_matches()
    assert TT[0] not in trps and TT[4] not in trps
    assert len(trps) == len(TT) - 2


def test_dedup_exactness(ray_session):
    import ray.data

    # triple set duplicated 5x across blocks → exactly one of each survives
    tbl = triples_to_table(TT * 5)
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = dedup(ds)
    rows = out.take_all()
    got = sorted(Triple(r["subject"], r["predicate"], r["object"]) for r in rows)
    assert got == sorted(TT)


def test_ntriples_roundtrip(dstore, tmp_path):
    path = str(tmp_path / "nt_out")
    dstore.write_ntriples(path)
    files = [f for f in os.listdir(path) if f.endswith(".nt")]
    assert files
    loaded = DatasetGraphStore.from_ntriples_text(G, path)
    assert sorted(loaded.get_all_matches()) == sorted(TT)


def test_to_memory_store(dstore):
    mem = dstore.to_memory_store()
    assert sorted(mem.get_all_triples()) == sorted(TT)
    assert mem.size() == len(TT)


class TestJoins:
    """Distributed join primitives (engine additions; the physical
    plans behind the reference's semi-/anti-join store ops and the
    entity-linking broadcast join of SURVEY §2.6)."""

    def test_hash_join_inner(self, ray_session):
        import pandas as pd
        import ray.data

        from ontograph_ray.store.dataset import hash_join

        left = ray.data.from_pandas(
            pd.DataFrame({"k": [1, 2, 2, 3], "a": ["x", "y", "z", "w"]})
        )
        right = ray.data.from_pandas(
            pd.DataFrame({"k": [2, 3, 4], "b": [20, 30, 40]})
        )
        got = (
            hash_join(left, right, on="k", num_buckets=4)
            .to_pandas()
            .sort_values(["k", "a"])
            .reset_index(drop=True)
        )
        want = pd.DataFrame(
            {"k": [2, 2, 3], "a": ["y", "z", "w"], "b": [20, 20, 30]}
        )
        pd.testing.assert_frame_equal(got, want)

    def test_hash_join_left(self, ray_session):
        import pandas as pd
        import ray.data

        from ontograph_ray.store.dataset import hash_join

        left = ray.data.from_pandas(pd.DataFrame({"k": [1, 2], "a": ["x", "y"]}))
        right = ray.data.from_pandas(pd.DataFrame({"k": [2], "b": [20.0]}))
        got = (
            hash_join(left, right, on="k", how="left", num_buckets=2)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert got["k"].tolist() == [1, 2]
        assert got["b"].isna().tolist() == [True, False]

    def test_broadcast_join(self, ray_session):
        import pandas as pd
        import ray.data

        from ontograph_ray.store.dataset import broadcast_join

        big = ray.data.from_pandas(
            pd.DataFrame({"k": [1, 2, 3, 2], "v": [10, 20, 30, 21]})
        )
        small = pd.DataFrame({"k": [2, 3], "name": ["two", "three"]})
        got = (
            broadcast_join(big, small, on="k")
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )
        assert got["name"].tolist() == ["two", "two", "three"]

    def test_hash_join_right(self, ray_session):
        import pandas as pd
        import ray.data

        from ontograph_ray.store.dataset import hash_join

        left = ray.data.from_pandas(pd.DataFrame({"k": [1, 2], "a": ["x", "y"]}))
        right = ray.data.from_pandas(pd.DataFrame({"k": [2, 4], "b": [20.0, 40.0]}))
        got = (
            hash_join(left, right, on="k", how="right", num_buckets=2)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert got["k"].tolist() == [2, 4]
        assert got["a"].isna().tolist() == [False, True]
        assert got["b"].tolist() == [20.0, 40.0]

    def test_hash_join_full_outer(self, ray_session):
        import pandas as pd
        import ray.data

        from ontograph_ray.store.dataset import hash_join

        left = ray.data.from_pandas(
            pd.DataFrame({"k": [1, 2, 3], "a": [1.0, 2.0, 3.0]})
        )
        right = ray.data.from_pandas(pd.DataFrame({"k": [2, 4], "b": [20.0, 40.0]}))
        got = (
            hash_join(left, right, on="k", how="outer", num_buckets=4)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert got["k"].tolist() == [1, 2, 3, 4]
        assert got["a"].isna().tolist() == [False, False, False, True]
        assert got["b"].isna().tolist() == [True, False, True, False]

    def test_top_k_per_group(self, ray_session):
        import pandas as pd
        import ray.data

        from ontograph_ray.store.dataset import top_k_per_group

        df = pd.DataFrame(
            {
                "g": [1, 1, 1, 1, 2, 2, 3],
                "v": [5, 9, 9, 1, 4, 7, 2],
                "id": [10, 11, 12, 13, 20, 21, 30],
            }
        )
        # split across blocks so the per-block combiner actually runs
        ds = ray.data.from_pandas([df.iloc[:3], df.iloc[3:]])
        got = (
            top_k_per_group(
                ds, ["g"], ["v", "id"], ascending=[False, True], k=2,
                rank_col="rn", num_buckets=4,
            )
            .to_pandas()
            .sort_values(["g", "rn"])
            .reset_index(drop=True)
        )
        # g=1: (9,11),(9,12); g=2: (7,21),(4,20); g=3: (2,30)
        assert got["id"].tolist() == [11, 12, 21, 20, 30]
        assert got["rn"].tolist() == [1, 2, 1, 2, 1]

    def test_hash_join_null_keys_never_match(self, ray_session):
        """SQL semantics: NULL join keys match nothing (pandas merge
        would match NaN==NaN); outer sides still keep their null-key
        rows unmatched."""
        import pandas as pd
        import ray.data

        from ontograph_ray.store.dataset import hash_join

        left = ray.data.from_pandas(
            pd.DataFrame({"k": [1.0, None, 2.0], "a": ["x", "y", "z"]})
        )
        right = ray.data.from_pandas(
            pd.DataFrame({"k": [1.0, None], "b": [10.0, 99.0]})
        )
        inner = hash_join(left, right, on="k", num_buckets=2).to_pandas()
        assert inner["a"].tolist() == ["x"] and inner["b"].tolist() == [10.0]
        outer = (
            hash_join(left, right, on="k", how="outer", num_buckets=2)
            .to_pandas()
            .sort_values(["a", "b"], na_position="last")
        )
        # 1 match + unmatched: left None-key, left k=2, right None-key
        assert len(outer) == 4
        assert outer["b"].isna().sum() == 2  # left rows with no match
        assert outer["a"].isna().sum() == 1  # right null-key row kept

    def test_asof_join_interleaved(self, ray_session):
        """Non-degenerate as-of: right rows interleave with left times,
        so each left row matches a DIFFERENT most-recent right row;
        rows before any right row are dropped (inner semantics)."""
        import pandas as pd
        import ray.data

        from ontograph_ray.store.dataset import asof_join

        left = ray.data.from_pandas(
            pd.DataFrame(
                {
                    "k": [1, 1, 1, 2, 2],
                    "t": [5, 15, 25, 8, 1],
                    "ev": ["a", "b", "c", "d", "e"],
                }
            )
        )
        right = ray.data.from_pandas(
            pd.DataFrame({"k": [1, 1, 2], "t": [10, 20, 3], "px": [100, 200, 300]})
        )
        got = (
            asof_join(left, right, key="k", time_col="t", num_buckets=4)
            .to_pandas()
            .sort_values(["k", "t"])
            .reset_index(drop=True)
        )
        # k=1: t=5 has no earlier right row (dropped); t=15→px 100; t=25→px 200
        # k=2: t=1 dropped; t=8→px 300
        assert got["ev"].tolist() == ["b", "c", "d"]
        assert got["px"].tolist() == [100, 200, 300]
        assert got["t_right"].tolist() == [10, 20, 3]
