"""Tests of the pure-Python reference-semantics oracle itself, including
the exact directional threshold truncation cases (SURVEY §2.1 D5)."""

from __future__ import annotations

from umi_collapse_rs_spark import oracle


def test_directional_gate_truncation():
    # 2*f_child <= f_parent + 1 at p=0.5 (directional.rs:38 f32 truncation)
    # parent f=2 -> int(0.5*3)=1 -> child f=1 absorbed, f=2 not
    nodes = {"p": 2, "c1": 1, "c2": 2}
    pairs = [("p", "c1", 2), ("p", "c2", 2)]
    a = oracle.greedy_directional(nodes, pairs)
    assert a["c1"] == "p"  # wait: order is c2 (f=2, 'c2'<'p') first... see below
    # order: freq desc then id asc: c2(f2) before p(f2)? ids: 'c2' < 'p' so c2 first.
    # c2 absorbs nothing (c1 freq1 <= int(0.5*3)=1 -> absorbed by c2? c2-c1 not adjacent)
    assert a["c2"] == "c2"
    assert a["p"] == "p"


def test_directional_recursion_threshold_from_visited_node():
    # chain: a(f=9) - b(f=5) - c(f=3): a absorbs b (2*5<=10),
    # then recursion FROM b absorbs c (2*3<=6) even though from a it
    # would also pass; deeper: d(f=2) off c: 2*2<=4 ok -> same cluster
    nodes = {"a": 9, "b": 5, "c": 3, "d": 2}
    pairs = [("a", "b", 3), ("b", "c", 3), ("c", "d", 3)]
    a = oracle.greedy_directional(nodes, pairs)
    assert a == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_directional_gate_blocks():
    # b(f=9) cannot be absorbed by a(f=10): 2*9=18 > 11
    nodes = {"a": 10, "b": 9}
    pairs = [("a", "b", 2)]
    a = oracle.greedy_directional(nodes, pairs)
    assert a == {"a": "a", "b": "b"}


def test_directional_dist0_absorbs_regardless():
    # identical fingerprints absorb regardless of freq (naive.rs:31)
    nodes = {"a": 10, "b": 9}
    pairs = [("a", "b", 0)]
    a = oracle.greedy_directional(nodes, pairs)
    assert a == {"a": "a", "b": "a"}


def test_directional_contested_child_goes_to_higher_freq_parent():
    # D1: child within radius of two parents -> first-processed parent
    nodes = {"p1": 10, "p2": 8, "c": 2}
    pairs = [("p1", "c", 3), ("p2", "c", 3)]
    a = oracle.greedy_directional(nodes, pairs)
    assert a["c"] == "p1"
    assert a["p2"] == "p2"


def test_adjacency_one_hop_only():
    nodes = {"a": 9, "b": 5, "c": 3}
    pairs = [("a", "b", 3), ("b", "c", 3)]
    a = oracle.greedy_adjacency(nodes, pairs)
    # a absorbs b (one hop); c not adjacent to a -> own root
    assert a == {"a": "a", "b": "a", "c": "c"}


def test_cc_merges_chain():
    nodes = {"a": 9, "b": 5, "c": 3}
    pairs = [("a", "b", 3), ("b", "c", 3)]
    a = oracle.connected_components_py(nodes, pairs)
    assert a == {"a": "a", "b": "a", "c": "a"}


def test_pair_set_and_recall():
    assign = {"a": "a", "b": "a", "c": "c"}
    ps = oracle.pair_set(assign)
    assert ps == {("a", "b")}
    assert oracle.dup_pair_recall(ps, {("a", "b"), ("a", "c")}) == 0.5
    assert oracle.dup_pair_recall(set(), set()) == 1.0
