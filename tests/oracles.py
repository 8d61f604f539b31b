"""CPU oracle validators — the engine's ``*_cpu.hxx`` twins.

Reference tests each GPU algorithm against a sequential CPU validator
(SURVEY.md §5.1, [ref: examples/algorithms/<algo>/<algo>_cpu.hxx —
UNVERIFIED]).  These are pure NumPy/stdlib ports of the same *semantics*
(not the reference code — the mount was empty; semantics from SURVEY.md
§2.3 / BASELINE.json:6), run on collected edge lists at test scale.
"""

from __future__ import annotations

from collections import Counter, defaultdict, deque

import numpy as np


def _normalize(edges) -> np.ndarray:
    """Match Graph.from_edges: drop self-loops, dedupe."""
    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    if len(e) == 0:
        return e
    e = e[e[:, 0] != e[:, 1]]
    return np.unique(e, axis=0)


def _vertices(e: np.ndarray) -> np.ndarray:
    if len(e) == 0:
        return np.array([], dtype=np.int64)
    return np.unique(e)


def pagerank_oracle(
    edges,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 100,
) -> tuple[dict[int, float], int]:
    """Probability-form PR (Σp=1, dangling redistributed). → ({vid: rank}, iters)."""
    e = _normalize(edges)
    verts = _vertices(e)
    n = len(verts)
    if n == 0:
        return {}, 0
    idx = {int(v): i for i, v in enumerate(verts)}
    src = np.array([idx[int(s)] for s, _ in e], dtype=np.int64)
    dst = np.array([idx[int(d)] for _, d in e], dtype=np.int64)
    outdeg = np.bincount(src, minlength=n)
    p = np.full(n, 1.0 / n)
    it = 0
    while it < max_iters:
        it += 1
        contrib = np.where(outdeg > 0, p / np.maximum(outdeg, 1), 0.0)
        sums = np.bincount(dst, weights=contrib[src], minlength=n)
        dangling = p[outdeg == 0].sum()
        p_new = (1.0 - alpha) / n + alpha * (sums + dangling / n)
        delta = np.abs(p_new - p).max()
        p = p_new
        if delta < tol:
            break
    return {int(v): float(p[idx[int(v)]]) for v in verts}, it


def cc_oracle(edges) -> dict[int, int]:
    """Min vertex id per undirected component (BFS-based)."""
    e = _normalize(edges)
    adj: dict[int, list[int]] = defaultdict(list)
    verts = set()
    for s, d in e:
        s, d = int(s), int(d)
        adj[s].append(d)
        adj[d].append(s)
        verts.update((s, d))
    comp: dict[int, int] = {}
    for v in sorted(verts):
        if v in comp:
            continue
        q, seen = deque([v]), {v}
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    q.append(w)
        m = min(seen)
        for u in seen:
            comp[u] = m
    return comp


def triangle_oracle(edges) -> tuple[int, dict[int, int]]:
    """(total_triangles, {vid: incident_triangles}) — exact, undirected."""
    e = _normalize(edges)
    und = set()
    for s, d in e:
        s, d = int(s), int(d)
        und.add((min(s, d), max(s, d)))
    adj: dict[int, set[int]] = defaultdict(set)
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    per = Counter()
    total = 0
    for u, v in und:
        common = adj[u] & adj[v]
        for w in common:
            # count each triangle once: require u < v < w
            if u < v < w:
                total += 1
                per[u] += 1
                per[v] += 1
                per[w] += 1
    verts = _vertices(e)
    return total, {int(x): per.get(int(x), 0) for x in verts}


def labelprop_oracle(edges, max_iters: int = 20) -> tuple[dict[int, int], int]:
    """Synchronous mode-propagation with min-label tie-break (engine twin)."""
    e = _normalize(edges)
    adj: dict[int, list[int]] = defaultdict(list)
    und = set()
    for s, d in e:
        s, d = int(s), int(d)
        und.add((min(s, d), max(s, d)))
    for u, v in und:
        adj[u].append(v)
        adj[v].append(u)
    verts = sorted(_vertices(e).tolist())
    label = {v: v for v in verts}
    it = 0
    while it < max_iters:
        it += 1
        new = {}
        for v in verts:
            if not adj[v]:
                new[v] = label[v]
                continue
            cnt = Counter(label[u] for u in adj[v])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        changed = sum(1 for v in verts if new[v] != label[v])
        label = new
        if changed == 0:
            break
    return label, it


def bfs_oracle(edges, source: int, directed: bool = True) -> dict[int, int]:
    e = _normalize(edges)
    adj: dict[int, list[int]] = defaultdict(list)
    for s, d in e:
        adj[int(s)].append(int(d))
        if not directed:
            adj[int(d)].append(int(s))
    depth = {int(source): 0}
    q = deque([int(source)])
    while q:
        u = q.popleft()
        for w in adj[u]:
            if w not in depth:
                depth[w] = depth[u] + 1
                q.append(w)
    return depth


def sssp_oracle(edges, source: int) -> dict[int, float]:
    """Unit-weight shortest paths (== BFS depth on unit weights)."""
    return {k: float(v) for k, v in bfs_oracle(edges, source, directed=True).items()}


def ppr_oracle(
    edges,
    seeds,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 100,
) -> dict[int, float]:
    """Personalized PR: teleport + dangling mass uniform over seeds."""
    e = _normalize(edges)
    verts = _vertices(e)
    n = len(verts)
    if n == 0:
        return {}
    idx = {int(v): i for i, v in enumerate(verts)}
    src = np.array([idx[int(s)] for s, _ in e], dtype=np.int64)
    dst = np.array([idx[int(d)] for _, d in e], dtype=np.int64)
    outdeg = np.bincount(src, minlength=n)
    t = np.zeros(n)
    # mirror the engine exactly (ppr.py dedupes seeds before weighting);
    # a seed absent from the graph is a caller error — fail loudly, not
    # with a bare KeyError
    seed_set = sorted({int(s) for s in seeds})
    if not seed_set:
        raise ValueError("ppr_oracle: empty seed set")
    missing = [s for s in seed_set if s not in idx]
    if missing:
        raise ValueError(f"ppr_oracle: seeds not in graph: {missing}")
    seed_idx = [idx[s] for s in seed_set]
    t[seed_idx] = 1.0 / len(seed_idx)
    p = t.copy()
    for _ in range(max_iters):
        contrib = np.where(outdeg > 0, p / np.maximum(outdeg, 1), 0.0)
        sums = np.bincount(dst, weights=contrib[src], minlength=n)
        dangling = p[outdeg == 0].sum()
        p_new = (1.0 - alpha + alpha * dangling) * t + alpha * sums
        delta = np.abs(p_new - p).max()
        p = p_new
        if delta < tol:
            break
    return {int(v): float(p[idx[int(v)]]) for v in verts}


def hits_oracle(
    edges, tol: float = 1e-6, max_iters: int = 50
) -> dict[int, tuple[float, float]]:
    """L2-normalized HITS (auth from old hubs, hubs from new auths)."""
    e = _normalize(edges)
    verts = _vertices(e)
    n = len(verts)
    if n == 0:
        return {}
    idx = {int(v): i for i, v in enumerate(verts)}
    src = np.array([idx[int(s)] for s, _ in e], dtype=np.int64)
    dst = np.array([idx[int(d)] for _, d in e], dtype=np.int64)
    h = np.ones(n)
    a = np.ones(n)
    for _ in range(max_iters):
        a_new = np.bincount(dst, weights=h[src], minlength=n)
        na = np.sqrt((a_new**2).sum())
        if na > 0:
            a_new = a_new / na
        h_new = np.bincount(src, weights=a_new[dst], minlength=n)
        nh = np.sqrt((h_new**2).sum())
        if nh > 0:
            h_new = h_new / nh
        delta = max(np.abs(a_new - a).max(), np.abs(h_new - h).max())
        a, h = a_new, h_new
        if delta < tol:
            break
    return {int(v): (float(h[idx[int(v)]]), float(a[idx[int(v)]])) for v in verts}


def kcore_oracle(edges, k: int) -> dict[int, int]:
    """Vertices of the k-core with their within-core degree (peeling)."""
    e = _normalize(edges)
    adj: dict[int, set[int]] = defaultdict(set)
    for s, d in e:
        adj[int(s)].add(int(d))
        adj[int(d)].add(int(s))
    alive = {v for v in adj if len(adj[v]) >= 1}
    changed = True
    while changed:
        changed = False
        for v in sorted(alive):
            deg = sum(1 for u in adj[v] if u in alive)
            if deg < k:
                alive.discard(v)
                changed = True
    return {v: sum(1 for u in adj[v] if u in alive) for v in sorted(alive)}


def coreness_oracle(edges) -> dict[int, int]:
    """Core number of every vertex (simple min-degree peel; exact)."""
    e = _normalize(edges)
    adj: dict[int, set[int]] = defaultdict(set)
    for s, d in e:
        adj[int(s)].add(int(d))
        adj[int(d)].add(int(s))
    deg = {v: len(ns) for v, ns in adj.items()}
    core: dict[int, int] = {}
    alive = set(adj)
    k = 0
    while alive:
        k = max(k, min(deg[v] for v in alive))
        peel = [v for v in alive if deg[v] <= k]
        while peel:
            v = peel.pop()
            if v not in alive:
                continue
            core[v] = k
            alive.discard(v)
            for u in adj[v]:
                if u in alive:
                    deg[u] -= 1
                    if deg[u] <= k:
                        peel.append(u)
    return core


def spgemm_square_oracle(edges) -> dict[tuple[int, int], int]:
    """A² nonzeros of the directed unweighted adjacency (paths of len 2)."""
    e = _normalize(edges)
    out: dict[int, list[int]] = defaultdict(list)
    for s, d in e:
        out[int(s)].append(int(d))
    c = Counter()
    for i, mids in out.items():
        for j in mids:
            for k2 in out.get(j, ()):
                c[(i, k2)] += 1
    return dict(c)


def mst_oracle(weighted_edges) -> tuple[float, int]:
    """Kruskal with union-find → (total_weight, n_edges) of the MSF.

    Deterministic tie-break (weight, src, dst); with distinct weights the
    MSF is unique so edge sets can be compared exactly.
    """
    seen = {}
    for s, d, w in weighted_edges:
        s, d = int(s), int(d)
        if s == d:
            continue
        k = (min(s, d), max(s, d))
        if k not in seen or w < seen[k]:
            seen[k] = float(w)
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    total, n = 0.0, 0
    for (s, d), w in sorted(seen.items(), key=lambda kv: (kv[1], kv[0])):
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
            total += w
            n += 1
    return total, n


def geolocation_oracle(edges, locations: dict[int, tuple[float, float]],
                       max_iters: int = 50) -> dict[int, tuple[float, float]]:
    """Synchronous spatial-median spread (deterministic twin of
    algorithms/geolocation.py): each round every unlocated vertex with
    ≥1 located undirected neighbor takes the component-wise median
    (numpy linear interpolation == Spark ``percentile(0.5)``)."""
    e = _normalize(edges)
    adj: dict[int, set[int]] = {}
    for s, d in e:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    loc = {int(v): (float(a), float(b)) for v, (a, b) in locations.items()}
    for _ in range(max_iters):
        new = {}
        for v in adj:
            if v in loc:
                continue
            pts = [loc[u] for u in adj[v] if u in loc]
            if pts:
                new[v] = (
                    float(np.median([p[0] for p in pts])),
                    float(np.median([p[1] for p in pts])),
                )
        if not new:
            break
        loc.update(new)
    return loc


def bc_oracle(edges, sources, normalize_pairs: bool = True) -> dict[int, float]:
    """Brandes dependency accumulation on the undirected graph."""
    e = _normalize(edges)
    adj: dict[int, set[int]] = defaultdict(set)
    for s, d in e:
        adj[int(s)].add(int(d))
        adj[int(d)].add(int(s))
    verts = sorted({int(v) for v in _vertices(e)})
    bc = {v: 0.0 for v in verts}
    for s in sources:
        s = int(s)
        sigma = {v: 0.0 for v in verts}
        dist = {v: -1 for v in verts}
        preds: dict[int, list[int]] = {v: [] for v in verts}
        sigma[s] = 1.0
        dist[s] = 0
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for w in sorted(adj[u]):
                if dist[w] < 0:
                    dist[w] = dist[u] + 1
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
                    preds[w].append(u)
        delta = {v: 0.0 for v in verts}
        for w in reversed(order):
            for u in preds[w]:
                delta[u] += sigma[u] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    if normalize_pairs:
        bc = {v: x * 0.5 for v, x in bc.items()}
    return bc
