"""Pure-Python reference-semantics oracle (no Spark).

Replays the reference's greedy clustering EXACTLY (SURVEY §2 C1/C2 with
divergences D1/D3/D5 resolved deterministically) so the Spark pipeline's
cluster assignments can be compared against the reference semantics in
tests, per FIXTURES.md §2 golden assertion (b).

Semantics reproduced from ``/root/reference/src``:

- directional: sort nodes by freq desc (directional.rs:64-72; tie-break
  url asc added — the reference's tie order is nondeterministic, D3),
  DFS from each still-live node, absorbing neighbors with
  ``dist == 0 or f_child <= trunc(p * (f_visited + 1))``
  (naive.rs:31 + directional.rs:38) and recursing into each absorbed
  neighbor (directional.rs:47-53).
- adjacency (upstream-Java semantics; the Rust adj's max_freq=0 quirk,
  D2, makes it exact-dedup-only): one-hop absorb, no recursion
  (adjacency.rs:40-62).
- cc: plain connected components (advertised-unimplemented in the
  reference, cli.rs:33-36).
"""

from __future__ import annotations

from collections import defaultdict


def _order(nodes: dict[str, int]) -> list[str]:
    """The reference's processing order with a deterministic tie-break:
    freq desc (directional.rs:72), then id asc (D3 fix)."""
    return sorted(nodes, key=lambda n: (-nodes[n], n))


def greedy_directional(
    nodes: dict[str, int],
    pairs: list[tuple[str, str, int]],
    p: float = 0.5,
) -> dict[str, str]:
    """Greedy directional clustering; returns {node_id: root_id}.

    ``nodes``: id -> exact-dup frequency.  ``pairs``: undirected verified
    (a, b, simhash_dist).
    """
    neigh: dict[str, list[tuple[str, int]]] = defaultdict(list)
    for a, b, d in pairs:
        neigh[a].append((b, d))
        neigh[b].append((a, d))
    for k in neigh:
        neigh[k].sort()  # deterministic visit order

    alive = set(nodes)
    assign: dict[str, str] = {}
    for root in _order(nodes):
        if root not in alive:
            continue
        alive.discard(root)
        assign[root] = root
        stack = [root]
        while stack:
            u = stack.pop()
            # threshold from the *visited* node's own freq (directional.rs:38)
            thr = int(p * (nodes[u] + 1))  # f32 truncation analog
            for v, d in neigh.get(u, ()):  # noqa: B905
                if v in alive and (d == 0 or nodes[v] <= thr):
                    alive.discard(v)
                    assign[v] = root
                    stack.append(v)
    return assign


def greedy_adjacency(
    nodes: dict[str, int],
    pairs: list[tuple[str, str, int]],
) -> dict[str, str]:
    """Upstream-Java adjacency: one-hop absorb, highest freq first."""
    neigh: dict[str, set[str]] = defaultdict(set)
    for a, b, _ in pairs:
        neigh[a].add(b)
        neigh[b].add(a)
    alive = set(nodes)
    assign: dict[str, str] = {}
    for root in _order(nodes):
        if root not in alive:
            continue
        alive.discard(root)
        assign[root] = root
        for v in sorted(neigh.get(root, ())):
            if v in alive:
                alive.discard(v)
                assign[v] = root
    return assign


def connected_components_py(
    nodes: dict[str, int],
    pairs: list[tuple[str, str, int]],
) -> dict[str, str]:
    """Union-find CC; root = (max freq, min id) member of the component."""
    parent = {n: n for n in nodes}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp: dict[str, list[str]] = defaultdict(list)
    for n in nodes:
        comp[find(n)].append(n)
    assign: dict[str, str] = {}
    for members in comp.values():
        root = min(members, key=lambda n: (-nodes[n], n))
        for n in members:
            assign[n] = root
    return assign


def pair_set(assign: dict[str, str]) -> set[tuple[str, str]]:
    """All same-cluster pairs (a < b) implied by an assignment."""
    clusters: dict[str, list[str]] = defaultdict(list)
    for n, r in assign.items():
        clusters[r].append(n)
    out: set[tuple[str, str]] = set()
    for members in clusters.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                out.add((a, b))
    return out


def dup_pair_recall(found: set[tuple[str, str]], truth: set[tuple[str, str]]) -> float:
    """|found ∩ truth| / |truth| — the BASELINE.json metric."""
    if not truth:
        return 1.0
    return len(found & truth) / len(truth)
