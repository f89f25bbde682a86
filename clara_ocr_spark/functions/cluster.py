"""Per-document clustering primitive — the `clusterize` analogue
(reference: pgmblock.c:469-622, graph of elements with an edge iff
dist(i,j) <= T, largest connected component wins).

The reference uses this inside zoning to group detected vertical rules
into column separators; we use it the same way inside the segmentation
P-UDF (grouping block candidates by proximity) — per-document work, so
plain Python/numpy here, never a shuffle. The cross-document twin is
the distributed `dup_clusters` catalog query (min-label propagation).

Golden cases from the reference's own self-tests (pgmblock.c:624-747)
are mirrored in tests/test_cluster.py.
"""

from __future__ import annotations

from typing import Callable, List, Tuple


def clusterize(n: int, t: int, dist: Callable[[int, int], float]) -> Tuple[int, List[int]]:
    """Group elements 0..n-1 with an edge iff dist(i, j) <= t; return
    (size, sorted members) of the largest cluster. Ties broken by the
    smallest member id (deterministic)."""
    parent = list(range(n))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        for j in range(i + 1, n):
            if dist(i, j) <= t:
                ri, rj = find(i), find(j)
                if ri != rj:
                    if ri < rj:
                        parent[rj] = ri
                    else:
                        parent[ri] = rj
    groups: dict[int, List[int]] = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)
    best = max(groups.values(), key=lambda g: (len(g), -min(g)))
    return len(best), sorted(best)


def clusterize_points(
    points: List[Tuple[float, float]], t: float
) -> Tuple[int, List[int]]:
    """Convenience wrapper: squared-euclidean distance over 2-D points
    (the reference's test_dist_1 metric)."""
    def d(i: int, j: int) -> float:
        u = points[i][0] - points[j][0]
        v = points[i][1] - points[j][1]
        return u * u + v * v

    return clusterize(len(points), t, d)
