"""clusterize golden + property tests.

Golden cases mirror the reference's built-in self-tests
(pgmblock.c:624-747: the hand-drawn 50-point set with expected largest
cluster sizes 33 @ T=2 and 27 @ T=1 including exact membership, and
the |i-j| line graph with 500 nodes). Property tests (hypothesis)
check the invariants the reference relies on: threshold monotonicity
and the two degenerate thresholds.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from clara_ocr_spark.functions.cluster import clusterize, clusterize_points

# The 50 points of pgmblock.c test_dist_1 (x, y arrays at 652-664).
_X = [1, 2, 2, 3, 3, 3, 4, 4, 4, 4, 4, 5, 5, 5, 5, 6, 6, 7, 7, 8,
      9, 10, 11, 12, 12, 12, 13, 13, 13, 14, 14, 15, 15, 15, 15,
      15, 16, 16, 16, 16, 16, 17, 17, 17, 18, 21, 22, 22, 23, 23]
_Y = [7, 7, 6, 6, 5, 2, 6, 4, 3, 2, 1, 4, 3, 2, 1, 4, 1, 4, 1, 1,
      1, 1, 1, 6, 5, 1, 6, 5, 1, 6, 1, 7, 6, 3, 2, 1, 7, 6, 3, 2,
      1, 7, 6, 3, 6, 5, 5, 4, 5, 4]
_POINTS = list(zip(_X, _Y))

# pgmblock.c:705-708 — expected members of the largest cluster @ T=1.
_EXPECT_T1 = [5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
              20, 21, 22, 25, 28, 30, 33, 34, 35, 38, 39, 40, 43]


def test_golden_1_t2():
    size, _ = clusterize_points(_POINTS, 2)
    assert size == 33


def test_golden_2_t1_membership():
    size, members = clusterize_points(_POINTS, 1)
    assert size == 27
    assert members == _EXPECT_T1


def test_golden_3_line_graph_connected():
    size, _ = clusterize(500, 1, lambda i, j: abs(i - j))
    assert size == 500


def test_golden_4_line_graph_isolated():
    size, _ = clusterize(500, 0, lambda i, j: abs(i - j))
    assert size == 1


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    ),
    st.integers(0, 8),
)
def test_threshold_monotone(points, t):
    lo, _ = clusterize_points(points, t)
    hi, _ = clusterize_points(points, t + 1)
    assert hi >= lo


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=2,
        max_size=40,
    )
)
def test_degenerate_thresholds(points):
    n = len(points)
    all_in, members = clusterize_points(points, 30 * 30 * 2)
    assert all_in == n and members == list(range(n))
    # T = 0: only coincident points join (dist 0 <= 0)
    size, _ = clusterize_points(points, 0)
    from collections import Counter

    assert size == max(Counter(points).values())


# -- distributed CC (_min_label_components) stress tests ----------------
#
# The cross-document generalization of clusterize (pgmblock.c:469-622):
# adversarial graph shapes pin the round budget — pointer doubling must
# give O(log diameter) rounds on a path, and a star must converge in 2
# (VERDICT r2 item 4). The observe-based convergence fold means each
# round is ONE Spark job; the rounds stat counts exactly those jobs.


def _cc(spark, edge_list):
    import math

    from clara_ocr_spark.queries import _min_label_components

    pairs = spark.createDataFrame(edge_list, "i_id bigint, j_id bigint")
    stats = {}
    got = {
        r.node: r.cluster
        for r in _min_label_components(pairs, stats=stats).collect()
    }
    return got, stats["rounds"]


def test_cc_long_path_log_rounds(spark):
    """10k-node path (diameter 9 999): every node must label 0, within
    a round budget ≈ log2(diameter) + slack — NOT O(diameter)."""
    import math

    n = 10_000
    got, rounds = _cc(spark, [(i, i + 1) for i in range(n - 1)])
    assert len(got) == n
    assert set(got.values()) == {0}
    # each round fuses two propagate+double passes -> half the jobs
    budget = math.ceil(math.log2(n) / 2) + 3  # 7 + slack
    assert rounds <= budget, f"{rounds} rounds > budget {budget}"


def test_cc_star_hub_two_rounds(spark):
    """10k-leaf star (high-degree hub, diameter 2): the first fused
    round both labels everything (pass 1) and confirms the fixpoint
    (pass 2 changes nothing)."""
    n = 10_000
    got, rounds = _cc(spark, [(0, i) for i in range(1, n)])
    assert len(got) == n
    assert set(got.values()) == {0}
    assert rounds <= 2, rounds


def test_cc_mixed_components(spark):
    """Path ∪ star ∪ isolated edge with interleaved ids: labels are
    the per-component minimum, components never merge."""
    path = [(2 * i, 2 * (i + 1)) for i in range(50)]  # evens 0..100
    star = [(1001, 1001 + 2 * i) for i in range(1, 30)]  # odds
    extra = [(5_000_001, 5_000_003)]
    got, rounds = _cc(spark, path + star + extra)
    assert set(got[2 * i] for i in range(51)) == {0}
    assert set(got[1001 + 2 * i] for i in range(30) if i != 0) == {1001}
    assert got[1001] == 1001
    assert got[5_000_001] == got[5_000_003] == 5_000_001
    assert rounds <= 5
