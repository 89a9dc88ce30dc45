"""Connected components / near-dup clustering tests."""

import numpy as np


def _ref_components(edges):
    """Independent union-find reference."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # normalize: every node -> min id of its component
    comp = {}
    for x in list(parent):
        comp[x] = find(x)
    return comp


def test_connected_components_matches_union_find(spark):
    """Random sparse graphs across several densities: the distributed
    labels equal an independent union-find, including singleton-free
    node sets, self-loops, and duplicate edges."""
    from tl_spark.operators.graph import connected_components

    rng = np.random.default_rng(17)
    for n, m in [(30, 15), (50, 60), (80, 40)]:
        edges = [
            (int(rng.integers(0, n)), int(rng.integers(0, n)))
            for _ in range(m)
        ]
        edges += edges[:3]  # duplicates
        edges.append((5, 5))  # self-loop
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["id"]: r["component"]
            for r in connected_components(df).collect()
        }
        exp = _ref_components(edges)
        assert got == exp, (n, m)


def test_connected_components_long_chain(spark):
    """A 40-node path graph (diameter 39) must converge well within
    the pointer-jumping round budget and label everything 0."""
    from tl_spark.operators.graph import connected_components

    edges = [(i, i + 1) for i in range(39)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = connected_components(df).collect()
    assert len(got) == 40
    assert all(r["component"] == 0 for r in got)


def test_neardup_clusters_transitive_canonical(spark):
    """A~B and B~C (no A~C edge) must land in ONE cluster with only
    the smallest id canonical — the transitive case per-pair dropping
    cannot express."""
    from tl_spark.operators.graph import neardup_clusters

    pairs = spark.createDataFrame(
        [(10, 20), (20, 30), (77, 99)], "id_a long, id_b long"
    )
    got = {
        r["id"]: (r["component"], r["is_canonical"])
        for r in neardup_clusters(pairs).collect()
    }
    assert got == {
        10: (10, True),
        20: (10, False),
        30: (10, False),
        77: (77, True),
        99: (77, False),
    }
