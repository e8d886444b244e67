"""The iterative connected-components operator vs a driver-side union-find
on synthetic graphs — shapes the LSH dup data never produces (long chains
that force many propagation rounds, bridged cliques, forests)."""

from __future__ import annotations

import pytest

from data_ingestion_api_system_spark.operators.dedup import connected_components


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


GRAPHS = {
    # a 9-node chain listed high->low: diameter 8 forces multi-round
    # propagation, and the reversed edge direction must not matter
    "chain": [(i + 1, i) for i in range(9)],
    # two cliques joined by one bridge edge, plus a separate 3-node
    # component — merge + forest behavior in one graph
    "bridged_cliques_plus_forest": (
        [(a, b) for a in range(5) for b in range(a + 1, 5)]
        + [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
        + [(4, 10)]
        + [(20, 21), (21, 22)]
    ),
    # adversarial high-diameter graph: a 400-node chain whose node ids are
    # deterministically permuted along the path (id = (i*173) % 400, 173
    # coprime to 400), so min-label propagation would need ~diameter rounds
    # and even pointer jumping ~log2(400). Star rounds must converge well
    # inside the tight max_rounds below regardless of diameter.
    "permuted_long_chain": [
        ((i * 173) % 400, ((i + 1) * 173) % 400) for i in range(399)
    ],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_matches_union_find(spark, name):
    edges = GRAPHS[name]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    # max_rounds=12 is far below the 400-node chain's diameter: passing
    # proves round count does not scale with diameter (the star-rounds
    # guarantee; the r12 propagation loop raised here).
    got = {r.node: r.label for r in connected_components(df, max_rounds=12).collect()}
    assert got == _union_find(edges)
