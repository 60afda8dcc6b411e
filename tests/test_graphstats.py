"""Graph statistics: co-occurrence edge construction and
degree-ordered triangle enumeration on graphs with known answers."""

import pandas as pd
import pytest

import ray.data as rd

from ontograph_ray.pipelines.graphstats import cooccurrence_edges, triangles


def _edges_ds(pairs):
    return rd.from_pandas(
        pd.DataFrame(pairs, columns=["src", "dst"])
    )


class TestCooccurrenceEdges:
    def test_pairs_support_and_dedup(self, ray_session):
        # group 1: {a,b,c}; group 2: {a,b} (with a duplicated row);
        # group 3: {a} (no pairs)
        df = pd.DataFrame(
            {
                "g": [1, 1, 1, 2, 2, 2, 3],
                "item": ["a", "b", "c", "a", "b", "a", "a"],
            }
        )
        out = (
            cooccurrence_edges(rd.from_pandas(df), "g", "item")
            .to_pandas()
            .sort_values(["src", "dst"])
            .reset_index(drop=True)
        )
        assert out.values.tolist() == [
            ["a", "b", 2],
            ["a", "c", 1],
            ["b", "c", 1],
        ]

    def test_min_support_filters(self, ray_session):
        df = pd.DataFrame(
            {"g": [1, 1, 2, 2], "item": ["a", "b", "a", "b"]}
        )
        out = cooccurrence_edges(
            rd.from_pandas(df), "g", "item", min_support=3
        ).to_pandas()
        assert len(out) == 0


class TestTriangles:
    def _tri(self, pairs):
        df = triangles(_edges_ds(pairs)).to_pandas()
        if df.empty:
            # Dataset.to_pandas drops columns on 0 rows
            return []
        return (
            df.sort_values(["a", "b", "c"])
            .reset_index(drop=True)
            .values.tolist()
        )

    def test_k4_minus_edge(self, ray_session):
        # K4 on {1,2,3,4} minus edge (1,4): triangles (1,2,3), (2,3,4)
        pairs = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
        assert self._tri(pairs) == [[1, 2, 3], [2, 3, 4]]

    def test_hub_graph(self, ray_session):
        # star hub 0 → 1..8 plus closing edges (1,2) and (3,4):
        # exactly the two hub triangles, despite the degree-8 hub
        pairs = [(0, i) for i in range(1, 9)] + [(1, 2), (3, 4)]
        assert self._tri(pairs) == [[0, 1, 2], [0, 3, 4]]

    def test_triangle_free(self, ray_session):
        # 6-cycle: no triangles
        pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (1, 6)]
        assert self._tri(pairs) == []

    def test_string_nodes(self, ray_session):
        pairs = [("x", "y"), ("x", "z"), ("y", "z"), ("w", "x")]
        assert self._tri(pairs) == [["x", "y", "z"]]

    def test_matches_brute_force_on_random_graph(self, ray_session):
        # deterministic pseudo-random graph, brute-force cross-check
        import itertools

        nodes = list(range(16))
        pairs = [
            (u, v)
            for u, v in itertools.combinations(nodes, 2)
            if (u * 31 + v * 17) % 5 == 0
        ]
        eset = set(pairs)
        expected = sorted(
            [a, b, c]
            for a, b, c in itertools.combinations(nodes, 3)
            if (a, b) in eset and (b, c) in eset and (a, c) in eset
        )
        assert self._tri(pairs) == [list(t) for t in expected]


@pytest.fixture(params=[200_000, 0], ids=["driver", "distributed"])
def kcore_threshold(request):
    # 0 forces the distributed peel loop; the default takes the
    # driver-side cutover on these tiny graphs
    return request.param


class TestKCore:
    def _kcore(self, pairs, k, small_threshold=200_000):
        from ontograph_ray.pipelines.graphstats import k_core

        df = k_core(
            _edges_ds(pairs), k=k, small_threshold=small_threshold
        ).to_pandas()
        return sorted(df["node"].tolist()) if len(df) else []

    @staticmethod
    def _peel(pairs, k):
        # plain-Python reference peel
        adj = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        changed = True
        while changed:
            changed = False
            for n in list(adj):
                if len(adj[n]) < k:
                    for m in adj.pop(n):
                        adj[m].discard(n)
                    changed = True
        return sorted(adj)

    def test_triangle_with_tail(self, ray_session, kcore_threshold):
        # triangle {1,2,3} plus tail 3-4: the 2-core is the triangle
        pairs = [(1, 2), (2, 3), (1, 3), (3, 4)]
        assert self._kcore(pairs, 2, kcore_threshold) == [1, 2, 3]

    def test_chain_has_empty_2core(self, ray_session, kcore_threshold):
        assert self._kcore([(1, 2), (2, 3), (3, 4)], 2, kcore_threshold) == []

    def test_k4_is_3core(self, ray_session, kcore_threshold):
        import itertools

        pairs = list(itertools.combinations([1, 2, 3, 4], 2)) + [(4, 5)]
        assert self._kcore(pairs, 3, kcore_threshold) == [1, 2, 3, 4]

    def test_cascading_peel(self, ray_session, kcore_threshold):
        # removing leaf 5 drops 4 below degree 2 → cascade into the cycle
        pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
        assert self._kcore(pairs, 2, kcore_threshold) == [1, 2, 3]

    def test_matches_brute_force_on_random_graph(
        self, ray_session, kcore_threshold
    ):
        import itertools

        nodes = list(range(18))
        pairs = [
            (u, v)
            for u, v in itertools.combinations(nodes, 2)
            if (u * 29 + v * 13) % 4 == 0
        ]
        for k in (2, 3, 4):
            assert self._kcore(pairs, k, kcore_threshold) == self._peel(pairs, k)


class TestTransitiveClosure:
    def _tc(self, pairs, **kw):
        from ontograph_ray.pipelines.graphstats import transitive_closure

        return sorted(
            map(
                tuple,
                transitive_closure(_edges_ds(pairs), **kw)
                .to_pandas()
                .values.tolist(),
            )
        )

    def test_chain_and_cycle(self, ray_session):
        got = self._tc([(1, 2), (2, 3), (3, 4), (5, 6), (6, 5)])
        assert got == [
            (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
            (5, 5), (5, 6), (6, 5), (6, 6),
        ]

    def test_dedup_of_input(self, ray_session):
        assert self._tc([(1, 2), (1, 2)]) == [(1, 2)]

    def test_diameter_cap_raises(self, ray_session):
        import pytest

        with pytest.raises(ValueError):
            self._tc([(1, 2), (2, 3), (3, 4)], max_iters=1)


class TestNeighborJaccard:
    def test_known_graph(self, ray_session):
        from ontograph_ray.pipelines.graphstats import neighbor_jaccard

        # square 1-2-4-3-1 plus spoke 1-5:
        # N(1)={2,3,5} N(2)={1,4} N(3)={1,4} N(4)={2,3} N(5)={1}
        edges = _edges_ds([(1, 2), (1, 3), (2, 4), (3, 4), (1, 5)])
        out = (
            neighbor_jaccard(edges, min_common=1)
            .to_pandas()
            .set_index(["src", "dst"])
            .sort_index()
        )
        # brute force over all pairs
        import itertools

        nbrs = {1: {2, 3, 5}, 2: {1, 4}, 3: {1, 4}, 4: {2, 3}, 5: {1}}
        want = {}
        for a, b in itertools.combinations(sorted(nbrs), 2):
            c = len(nbrs[a] & nbrs[b])
            if c >= 1:
                want[(a, b)] = (
                    c,
                    len(nbrs[a]),
                    len(nbrs[b]),
                    c * 10000 // (len(nbrs[a]) + len(nbrs[b]) - c),
                )
        got = {
            idx: (
                r["common"],
                r["deg_src"],
                r["deg_dst"],
                r["jaccard_bp"],
            )
            for idx, r in out.iterrows()
        }
        assert got == want
        # identical neighborhoods → jaccard 10000
        assert got[(2, 3)] == (2, 2, 2, 10000)

    def test_min_common_filters(self, ray_session):
        from ontograph_ray.pipelines.graphstats import neighbor_jaccard

        edges = _edges_ds([(1, 2), (1, 3), (2, 4), (3, 4), (1, 5)])
        out = neighbor_jaccard(edges, min_common=2).to_pandas()
        assert set(zip(out["src"], out["dst"])) == {(2, 3), (1, 4)}


class TestBfsDepths:
    def _bfs(self, pairs, sources, **kw):
        from ontograph_ray.pipelines.graphstats import bfs_depths

        return sorted(
            map(
                tuple,
                bfs_depths(_edges_ds(pairs), sources, **kw)
                .to_pandas()
                .values.tolist(),
            )
        )

    def test_chain_cycle_unreachable(self, ray_session):
        # 1→2→3→1 cycle, 3→4 tail, 9→1 upstream (unreachable directed)
        pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (9, 1)]
        got = self._bfs(pairs, [1])
        assert got == [(1, 0), (2, 1), (3, 2), (4, 3)]
        # undirected: the upstream 9 is reachable, everything shifts
        got = self._bfs(pairs, [1], directed=False)
        assert got == [(1, 0), (2, 1), (3, 1), (4, 2), (9, 1)]

    def test_multi_source_min_depth(self, ray_session):
        # two sources — a node reached by both gets its SHORTEST depth
        pairs = [(1, 2), (2, 3), (7, 3), (3, 5)]
        got = self._bfs(pairs, [1, 7])
        assert got == [(1, 0), (2, 1), (3, 1), (5, 2), (7, 0)]

    def test_depth_cap_raises(self, ray_session):
        import pytest

        with pytest.raises(ValueError):
            self._bfs([(1, 2), (2, 3), (3, 4)], [1], max_depth=1)


class TestSssp:
    @staticmethod
    def _sssp_py(edges, sources, directed=True):
        es = list(edges)
        if not directed:
            es += [(v, u, w) for u, v, w in es]
        es = sorted(set(es))
        dist = {s: 0 for s in sources}
        for _ in range(100):
            changed = False
            for u, v, w in es:
                if u in dist and dist[u] + w < dist.get(v, 1 << 60):
                    dist[v] = dist[u] + w
                    changed = True
            if not changed:
                return sorted(dist.items())
        raise RuntimeError

    def _run(self, edges, sources, **kw):
        from ontograph_ray.pipelines.graphstats import sssp

        ds = rd.from_items(
            [{"src": str(u), "dst": str(v), "weight": w} for u, v, w in edges]
        ).repartition(3)
        out = sssp(ds, [str(s) for s in sources], **kw).take_all()
        return sorted((r["node"], r["dist"]) for r in out)

    def test_matches_twin_both_paths(self, ray_session):
        import random

        rng = random.Random(17)
        nodes = [f"n{i}" for i in range(12)]
        edges = sorted(
            {
                (rng.choice(nodes), rng.choice(nodes), rng.randint(1, 9))
                for _ in range(40)
            }
        )
        edges = [(u, v, w) for u, v, w in edges if u != v]
        want = [
            (u, d) for u, d in self._sssp_py(edges, ["n0"])
        ]
        got_driver = self._run(edges, ["n0"])
        got_dist = self._run(
            edges, ["n0"], small_threshold=0, num_buckets=4, max_rounds=30
        )
        assert got_driver == want
        assert got_dist == want

    def test_weighted_beats_hop_count(self, ray_session):
        # a→c direct costs 10; the 3-hop detour costs 3
        edges = [("a", "c", 10), ("a", "x", 1), ("x", "y", 1), ("y", "c", 1)]
        got = dict(self._run(edges, ["a"]))
        assert got["c"] == 3
        # undirected mode reaches backwards
        got = dict(self._run([("b", "a", 2)], ["a"], directed=False))
        assert got == {"a": 0, "b": 2}

    def test_negative_weight_refused(self, ray_session):
        import pytest

        with pytest.raises(Exception):
            self._run([("a", "b", -1)], ["a"])
