"""Single-node oracle: reference-semantics near-dup ground truth.

Faithful single-process pipeline at the same shingle/signature config:
chunk (exact reference CDC kernels) → shingle set → exact pairwise
Jaccard → union-find clusters. The Spark pipeline's dup-pair recall is
measured against this oracle (north_rule: >= 0.99).

Brute-force O(n^2) over files with inverted-index pruning — oracle-only,
never part of the distributed path.
"""

from __future__ import annotations

from collections import defaultdict

from .config import DedupConfig


def oracle_shingles(rows, cfg: DedupConfig):
    """{file_id: frozenset(shingle hashes)} using the shared kernel."""
    from .operators.signatures import shingle_hashes

    out = {}
    for fid, content in rows:
        data = (content or "").encode("utf-8", "surrogatepass")
        x, _ = shingle_hashes(data, cfg)
        # same bottom-k sketch rule as the distributed signatures stage
        distinct = sorted({int(v) for v in x})[:cfg.max_shingles]
        out[fid] = frozenset(distinct)
    return out


def oracle_pairs(shingles: dict, threshold: float):
    """All pairs with exact Jaccard >= threshold (inverted-index pruned)."""
    index = defaultdict(list)
    for fid, s in shingles.items():
        for h in s:
            index[h].append(fid)
    cand = set()
    for fids in index.values():
        if len(fids) < 2:
            continue
        fids = sorted(fids)
        for i in range(len(fids)):
            for j in range(i + 1, len(fids)):
                cand.add((fids[i], fids[j]))
    out = set()
    for a, b in cand:
        sa, sb = shingles[a], shingles[b]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        if inter / (len(sa) + len(sb) - inter) >= threshold:
            out.add((a, b))
    return out


class UnionFind:
    def __init__(self):
        self.parent = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x, p = p, self.parent[p]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


def oracle_clusters(all_ids, pairs):
    """{file_id: cluster_id} with cluster_id = min member id."""
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    # path-compress to the true minimum root
    roots = defaultdict(list)
    for fid in all_ids:
        roots[uf.find(fid)].append(fid)
    out = {}
    for members in roots.values():
        m = min(members)
        for fid in members:
            out[fid] = m
    return out


def run_oracle(rows, cfg: DedupConfig):
    """rows: iterable of (file_id, content). Returns (pairs, clusters)."""
    sh = oracle_shingles(rows, cfg)
    pairs = oracle_pairs(sh, cfg.jaccard_threshold)
    clusters = oracle_clusters(list(sh), pairs)
    return pairs, clusters
