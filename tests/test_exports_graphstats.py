"""Exports (S12/X10) + cluster-graph stats (A8/G3/W3): round-trips,
parallel-edge merging, bridge/cross-cluster semantics on a controlled
two-cluster-plus-bridge graph (the reference's test_communities.py:8-38
shape)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sift_kg_spark.exports import (
    export_csv,
    export_node_link_jsonl,
    flatten_for_export,
    merge_parallel_edges,
    node_link_dict,
    read_csv_export,
)
from sift_kg_spark.operators.graphstats import (
    bridge_docs,
    cross_cluster_pair_counts,
    degrees,
    top_hubs_with_neighbors,
)

PAIR_SCHEMA = (
    "url_a string, url_b string, channel string, jaccard double,"
    " hamming int, span int, status string"
)


def _pairs(spark):
    return spark.createDataFrame(
        [
            ("a", "b", "minhash", 0.9, 2, None, "confirmed"),
            ("a", "b", "simchunk", 0.9, 2, None, "flagged"),  # parallel edge
            ("b", "c", "anchor", 0.4, 9, 300, "confirmed"),
            ("c", "d", "minhash", 0.2, 20, None, "rejected"),
        ],
        PAIR_SCHEMA,
    )


def _assignments(spark):
    return spark.createDataFrame(
        [
            ("a", "a", "a", 3), ("b", "a", "a", 3), ("c", "a", "a", 3),
            ("d", "d", "d", 2), ("e", "d", "d", 2),
            ("f", "f", "f", 1),
        ],
        "url string, cluster_id string, canonical_url string, cluster_size int",
    )


class TestExports:
    def test_merge_parallel_edges(self, spark):
        merged = {
            (r.url_a, r.url_b): r
            for r in merge_parallel_edges(_pairs(spark)).collect()
        }
        ab = merged[("a", "b")]
        assert ab.n_parallel == 2
        assert ab.channels == "minhash; simchunk"
        assert ab.status == "confirmed"  # precedence over flagged
        assert merged[("c", "d")].status == "rejected"

    def test_flatten_arrays_and_structs(self, spark):
        df = spark.createDataFrame(
            [("x", ["p", "q"], {"k": "v"})],
            "id string, tags array<string>, attrs map<string,string>",
        )
        row = flatten_for_export(df).collect()[0]
        assert row.tags == "p; q"
        assert json.loads(row.attrs) == {"k": "v"}

    def test_csv_roundtrip(self, spark, tmp_path):
        path = str(tmp_path / "pairs_csv")
        export_csv(_pairs(spark), path, single_file=True)
        back = read_csv_export(spark, path)
        assert back.count() == 4
        assert set(back.columns) == set(_pairs(spark).columns)
        got = {
            (r.url_a, r.url_b, r.status)
            for r in back.select("url_a", "url_b", "status").collect()
        }
        assert ("a", "b", "confirmed") in got

    def test_node_link_jsonl(self, spark, tmp_path):
        out = str(tmp_path / "graph")
        export_node_link_jsonl(_assignments(spark), _pairs(spark), out)
        nodes = spark.read.json(f"{out}/nodes")
        links = spark.read.json(f"{out}/links")
        assert nodes.count() == 6
        assert links.count() == 3  # parallel a-b merged
        canon = {r.id: r.is_canonical for r in nodes.collect()}
        assert canon["a"] and not canon["b"]

    def test_node_link_dict_and_guard(self, spark):
        d = node_link_dict(_assignments(spark), _pairs(spark))
        assert {n["id"] for n in d["nodes"]} == {"a", "b", "c", "d", "e", "f"}
        assert len(d["links"]) == 3
        try:
            node_link_dict(_assignments(spark), _pairs(spark), max_rows=2)
            raise AssertionError("guard did not trip")
        except ValueError:
            pass

    def test_guard_counts_edges_not_just_nodes(self, spark):
        # r3 ADVICE #4: an edge-dense small-node graph (4-clique: 4 nodes,
        # 6 merged edges) must trip the guard when max_rows sits between
        # the node count and the edge count.
        nodes = ["a", "b", "c", "d"]
        assigns = spark.createDataFrame(
            [(u, "a", "a", 4) for u in nodes],
            "url string, cluster_id string, canonical_url string,"
            " cluster_size int",
        )
        clique = spark.createDataFrame(
            [
                (x, y, "minhash", 0.9, 1, None, "confirmed")
                for i, x in enumerate(nodes)
                for y in nodes[i + 1 :]
            ],
            PAIR_SCHEMA,
        )
        try:
            node_link_dict(assigns, clique, max_rows=5)
            raise AssertionError("edge-count guard did not trip")
        except ValueError as exc:
            assert "edges" in str(exc) or "merged" in str(exc)

    def test_graphml_roundtrip(self, spark, tmp_path):
        import xml.etree.ElementTree as ET

        from sift_kg_spark.exports import export_graphml

        path = str(tmp_path / "graph.graphml")
        export_graphml(_assignments(spark), _pairs(spark), path)
        ns = {"g": "http://graphml.graphdrawing.org/xmlns"}
        root = ET.parse(path).getroot()
        nodes = root.findall(".//g:node", ns)
        edges = root.findall(".//g:edge", ns)
        assert len(nodes) == 6
        assert len(edges) == 3  # parallel a-b merged
        # attribute round-trip: node 'b' carries its cluster assignment
        keys = {
            k.get("id"): k.get("attr.name") for k in root.findall("g:key", ns)
        }
        b = next(n for n in nodes if n.get("id") == "b")
        data = {keys[d.get("key")]: d.text for d in b.findall("g:data", ns)}
        assert data["cluster_id"] == "a"
        assert data["canonical_url"] == "a"
        ab = next(e for e in edges if {e.get("source"), e.get("target")} == {"a", "b"})
        edata = {keys[d.get("key")]: d.text for d in ab.findall("g:data", ns)}
        assert edata["status"] == "confirmed"
        assert edata["channels"] == "minhash; simchunk"

    def test_gexf_roundtrip(self, spark, tmp_path):
        import xml.etree.ElementTree as ET

        from sift_kg_spark.exports import export_gexf

        path = str(tmp_path / "graph.gexf")
        export_gexf(_assignments(spark), _pairs(spark), path)
        ns = {"g": "http://www.gexf.net/1.2draft"}
        root = ET.parse(path).getroot()
        nodes = root.findall(".//g:nodes/g:node", ns)
        edges = root.findall(".//g:edges/g:edge", ns)
        assert len(nodes) == 6
        assert len(edges) == 3
        b = next(n for n in nodes if n.get("id") == "b")
        vals = {
            v.get("for"): v.get("value")
            for v in b.findall(".//g:attvalue", ns)
        }
        assert vals["0"] == "a"  # cluster_id
        # guard applies to XML exports too
        try:
            export_gexf(
                _assignments(spark), _pairs(spark),
                str(tmp_path / "x.gexf"), max_rows=2,
            )
            raise AssertionError("guard did not trip")
        except ValueError:
            pass


class TestGraphStats:
    # two triangles bridged by one flagged edge + a spoke
    EDGES = [
        ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
        ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
        ("a3", "b1"),          # cross-cluster bridge
        ("a1", "b2"),          # second cross edge
    ]
    ASSIGN = [
        ("a1", "A"), ("a2", "A"), ("a3", "A"),
        ("b1", "B"), ("b2", "B"), ("b3", "B"),
    ]

    def _fix(self, spark):
        edges = spark.createDataFrame(self.EDGES, "url_a string, url_b string")
        assign = spark.createDataFrame(
            self.ASSIGN, "url string, cluster_id string"
        )
        return edges, assign

    def test_degrees(self, spark):
        edges, _ = self._fix(spark)
        deg = {r.url: r.degree for r in degrees(edges).collect()}
        assert deg["a1"] == 3 and deg["a3"] == 3 and deg["b3"] == 2

    def test_top_hubs_with_neighbors(self, spark):
        edges, _ = self._fix(spark)
        hubs = top_hubs_with_neighbors(edges, n=2).toPandas()
        # deterministic rank: degree desc then url asc -> a1, a3 (both 3)
        assert set(hubs[hubs["rank"] == 1].hub_url) == {"a1"}
        assert set(hubs[hubs["rank"] == 2].hub_url) == {"a3"}
        a1_nbrs = set(hubs[hubs.hub_url == "a1"].neighbor_url)
        assert a1_nbrs == {"a2", "a3", "b2"}

    def test_cross_cluster_pair_counts(self, spark):
        edges, assign = self._fix(spark)
        rows = cross_cluster_pair_counts(edges, assign).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.cluster_a, r.cluster_b) == ("A", "B")
        assert r.n_edges == 2
        assert r.n_bridge_docs == 4  # a3, b1, a1, b2

    def test_bridge_docs(self, spark):
        edges, assign = self._fix(spark)
        got = {r.url: r for r in bridge_docs(edges, assign).collect()}
        assert set(got) == {"a3", "b1", "a1", "b2"}
        assert got["a3"].own_cluster == "A"
        assert got["a3"].n_foreign_clusters == 1
        assert got["a3"].n_cross_edges == 1


class TestEgoBfs:
    """G5 ego-BFS as a library operator (ref communities.py:292-376):
    first-reach hop labelling, visited-set anti-join, multi-seed."""

    # path p1-p2-p3-p4-p5 plus a triangle t1-t2-t3 hanging off p2
    EDGES = [
        ("p1", "p2"), ("p2", "p3"), ("p3", "p4"), ("p4", "p5"),
        ("p2", "t1"), ("t1", "t2"), ("t2", "t3"), ("t1", "t3"),
    ]

    def _edges(self, spark):
        return spark.createDataFrame(self.EDGES, "url_a string, url_b string")

    def test_depth1_is_direct_neighbors(self, spark):
        from sift_kg_spark.operators.graphstats import ego_bfs

        seeds = spark.createDataFrame([("p2",)], "seed string")
        got = {(r.seed, r.node, r.hop) for r in
               ego_bfs(self._edges(spark), seeds, depth=1).collect()}
        assert got == {("p2", "p1", 1), ("p2", "p3", 1), ("p2", "t1", 1)}

    def test_first_reach_hop_and_no_seed_reentry(self, spark):
        from sift_kg_spark.operators.graphstats import ego_bfs

        seeds = spark.createDataFrame([("t1",)], "seed string")
        got = {r.node: r.hop for r in
               ego_bfs(self._edges(spark), seeds, depth=3).collect()}
        # t2/t3 both hop 1 (triangle: NOT re-labelled 2 via each other);
        # seed itself never re-enters despite the cycle back to t1
        assert got == {
            "t2": 1, "t3": 1, "p2": 1, "p1": 2, "p3": 2, "p4": 3,
        }

    def test_multi_seed_independent_frontiers(self, spark):
        from sift_kg_spark.operators.graphstats import ego_bfs

        seeds = spark.createDataFrame([("p1",), ("p5",)], "seed string")
        got = {(r.seed, r.node): r.hop for r in
               ego_bfs(self._edges(spark), seeds, depth=2).collect()}
        assert got[("p1", "p2")] == 1 and got[("p1", "p3")] == 2
        assert got[("p1", "t1")] == 2
        assert got[("p5", "p4")] == 1 and got[("p5", "p3")] == 2
        assert ("p5", "p2") not in got  # 3 hops away

    def test_depth_validation(self, spark):
        import pytest

        from sift_kg_spark.operators.graphstats import ego_bfs

        seeds = spark.createDataFrame([("p1",)], "seed string")
        with pytest.raises(ValueError):
            ego_bfs(self._edges(spark), seeds, depth=0)


class TestSearchSubstring:
    """F4/F5 substring search operator (ref cli.py:603-622: case-
    insensitive scan over name OR aliases)."""

    ROWS = [
        ("u1", "The Round Table", "arthur|knights"),
        ("u2", "round trip", "travel"),
        ("u3", "nothing here", "TABLEAU|x"),
        ("u4", "plain", "none"),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            self.ROWS, "url string, name string, aliases string"
        )

    def test_case_insensitive_multi_column_or(self, spark):
        from sift_kg_spark.operators.search import search_substring

        got = {r.url for r in search_substring(
            self._df(spark), "Table", cols=("name", "aliases")
        ).collect()}
        assert got == {"u1", "u3"}

    def test_case_sensitive(self, spark):
        from sift_kg_spark.operators.search import search_substring

        got = {r.url for r in search_substring(
            self._df(spark), "Table", cols=("name",), case_insensitive=False
        ).collect()}
        assert got == {"u1"}

    def test_empty_cols_rejected(self, spark):
        import pytest

        from sift_kg_spark.operators.search import search_predicate

        with pytest.raises(ValueError):
            search_predicate("x", cols=())
