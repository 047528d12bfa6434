"""Triangle counting (stages/triangles.py) vs brute force."""

from itertools import combinations

import numpy as np
import pyarrow as pa
import ray.data as rd

from guacray.stages.triangles import triangle_counts


def _edges_table(pairs):
    return pa.table({
        "subj_id": [a for a, _ in pairs],
        "obj_id": [b for _, b in pairs],
        "undirected": [False] * len(pairs)})


def _brute(pairs):
    adj = set()
    for a, b in pairs:
        if a != b:
            adj.add((min(a, b), max(a, b)))
    nodes = sorted({x for p in adj for x in p})
    counts: dict[str, int] = {}
    for a, b, c in combinations(nodes, 3):
        if {(a, b), (b, c), (a, c)} <= adj:
            for v in (a, b, c):
                counts[v] = counts.get(v, 0) + 1
    return counts


def test_triangles_hand_graph(ray_session):
    # triangle a-b-c (with a reversed duplicate edge + self-loop),
    # square d-e-f-g (no triangle)
    pairs = [("b", "a"), ("c", "b"), ("a", "c"), ("c", "a"), ("h", "h"),
             ("d", "e"), ("e", "f"), ("f", "g"), ("g", "d")]
    got = triangle_counts(rd.from_arrow(_edges_table(pairs))).to_pandas()
    assert dict(zip(got["node_id"], got["n_triangles"])) == \
        {"a": 1, "b": 1, "c": 1}


def test_triangles_random_vs_brute(ray_session):
    rng = np.random.RandomState(7)
    names = [f"n{i:02d}" for i in range(14)]
    pairs = [(names[rng.randint(14)], names[rng.randint(14)])
             for _ in range(50)]
    got = triangle_counts(rd.from_arrow(_edges_table(pairs))).to_pandas()
    assert dict(zip(got["node_id"], got["n_triangles"])) == _brute(pairs)


def test_triangles_none(ray_session):
    got = triangle_counts(
        rd.from_arrow(_edges_table([("a", "b"), ("b", "c")]))).to_pandas()
    assert len(got) == 0


def test_clustering_vs_brute(ray_session):
    from guacray.stages.triangles import clustering_coefficients
    rng = np.random.RandomState(3)
    names = [f"n{i:02d}" for i in range(12)]
    pairs = [(names[rng.randint(12)], names[rng.randint(12)])
             for _ in range(40)]
    got = clustering_coefficients(
        rd.from_arrow(_edges_table(pairs))).to_pandas()
    tri = _brute(pairs)
    adj: dict[str, set] = {}
    for a, b in pairs:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    exp = {v: (len(nb), 2.0 * tri.get(v, 0) / (len(nb) * (len(nb) - 1)))
           for v, nb in adj.items() if len(nb) >= 2}
    assert {(r["node_id"], r["deg"], r["clustering"])
            for _, r in got.iterrows()} == \
        {(v, d, c) for v, (d, c) in exp.items()}


def test_clustering_no_triangles_scores_zero(ray_session):
    from guacray.stages.triangles import clustering_coefficients
    got = clustering_coefficients(rd.from_arrow(
        _edges_table([("a", "b"), ("b", "c")]))).to_pandas()
    # only b has degree >= 2; path graph -> coefficient 0
    assert dict(zip(got["node_id"], got["clustering"])) == {"b": 0.0}
