"""HNSW approximate nearest-neighbor index (host-side).

The reference's 'hnsw' mode is CPU FAISS IndexHNSWFlat(M=16,
efConstruction=80) (eval.py:90-98) - HNSW is an inherently sequential
graph walk, so like the reference it runs on the host; on-TPU brute
force (IndexFlat) dominates it for any DB that fits HBM, but the mode
exists for >HBM corpora and API completeness.

Standard Malkov-Yashunin construction: geometric level sampling
(mult = 1/ln(M)), greedy descent through upper layers, ef-bounded beam
at the insertion layer, closest-M neighbor selection with backlink
pruning. Distances are batched numpy (BLAS) per candidate expansion.
"""

from __future__ import annotations

import heapq
import math
from typing import List, Optional, Tuple

import numpy as np


class IndexHNSW:
    # Construction is O(N log N) sequential *Python*: ~100k rows already
    # takes minutes on one core, and fma_medium scale (1.6M segments)
    # would take hours. Refuse past this bound so the factory's "API
    # completeness" framing stays honest - 'l2' (exact, on-TPU) or
    # 'ivfpq' are strictly better there. Override via max_rows for
    # callers who measured their own tolerance.
    DEFAULT_MAX_ROWS = 100_000
    # The first-party C++ backend (native/src/hnsw_native.cpp — the
    # role FAISS's C++ HNSW plays for the reference, eval.py:90-98)
    # raises the bound to protocol scale. MEASURED (round 5,
    # scripts/profile_hnsw_native.py, 1M x 128 unit rows, 1 core):
    # build 2,031 s (34 min; 1,096 rows/s at 100k decaying to ~500
    # average — insertion is O(log N) each and sequential by nature,
    # FAISS parallelizes inserts across cores), search p50 1.23 ms /
    # p95 1.67 ms single query, 755 q/s batched. 2M extrapolates to
    # ~1.3-1.5 h of build — tolerable for an offline index build,
    # refused beyond that (fma_large's 31M rows would be days; use
    # 'ivfpq' / sharded 'l2' there, as the published protocol does).
    NATIVE_MAX_ROWS = 2_000_000

    def __init__(self, d: int, m: int = 16, ef_construction: int = 80,
                 ef_search: int = 64, seed: int = 0,
                 max_rows: Optional[int] = None, backend: str = "auto"):
        self.d = d
        self.m = m
        self.m0 = 2 * m            # level-0 degree (FAISS convention)
        self.ef_construction = ef_construction
        self.ef_search = ef_search
        self._native = None
        if backend in ("auto", "native"):
            try:
                from grafp_tpu.native.hnsw_native import HNSWNative

                self._native = HNSWNative(d, m=m,
                                          ef_construction=ef_construction,
                                          seed=seed)
            except Exception:
                if backend == "native":
                    raise
        elif backend != "python":
            raise ValueError(f"backend must be auto|native|python, "
                             f"got {backend!r}")
        if max_rows is None:
            max_rows = (self.NATIVE_MAX_ROWS if self._native is not None
                        else self.DEFAULT_MAX_ROWS)
        self.max_rows = max_rows
        self.mult = 1.0 / math.log(m)
        self.rng = np.random.RandomState(seed)
        self.vectors: Optional[np.ndarray] = None
        self.levels: List[int] = []
        # neighbors[level][node] -> list of ids
        self.neighbors: List[List[List[int]]] = []
        self.entry: int = -1
        self.max_level: int = -1
        self.ntotal = 0
        self.nprobe = 20  # unused; factory contract
        self.is_trained = True

    # ---- internals ----
    def _dist(self, q: np.ndarray, ids) -> np.ndarray:
        v = self.vectors[np.asarray(ids, np.int64)]
        diff = v - q[None, :]
        return np.einsum("ij,ij->i", diff, diff)

    def _search_layer(self, q: np.ndarray, entry: int, ef: int,
                      level: int) -> List[Tuple[float, int]]:
        """Beam search; returns [(dist, id)] of up to ef closest."""
        d0 = float(self._dist(q, [entry])[0])
        visited = {entry}
        cand = [(d0, entry)]               # min-heap by dist
        best = [(-d0, entry)]              # max-heap of current ef best
        nbrs_l = self.neighbors[level]
        while cand:
            dc, c = heapq.heappop(cand)
            if dc > -best[0][0]:
                break
            nbrs = [n for n in nbrs_l[c] if n not in visited]
            if nbrs:
                visited.update(nbrs)
                ds = self._dist(q, nbrs)
                for dn, n in zip(ds, nbrs):
                    dn = float(dn)
                    if dn < -best[0][0] or len(best) < ef:
                        heapq.heappush(cand, (dn, n))
                        heapq.heappush(best, (-dn, n))
                        if len(best) > ef:
                            heapq.heappop(best)
        return sorted((-nd, i) for nd, i in best)

    def _greedy(self, q: np.ndarray, entry: int, level: int) -> int:
        cur = entry
        cur_d = float(self._dist(q, [cur])[0])
        improved = True
        while improved:
            improved = False
            nbrs = self.neighbors[level][cur]
            if nbrs:
                ds = self._dist(q, nbrs)
                j = int(np.argmin(ds))
                if ds[j] < cur_d:
                    cur, cur_d = nbrs[j], float(ds[j])
                    improved = True
        return cur

    # ---- public API (factory contract) ----
    def train(self, data) -> None:
        pass

    def add(self, data) -> None:
        data = np.ascontiguousarray(np.asarray(data, np.float32))
        if self.ntotal + len(data) > self.max_rows:
            raise ValueError(
                f"IndexHNSW: {self.ntotal + len(data):,} rows exceeds the "
                f"host-side construction bound of {self.max_rows:,} "
                f"(sequential insertion; the Python fallback takes hours "
                f"past 100k rows); "
                f"use index_type 'l2' (exact, on-TPU) or 'ivfpq' instead, "
                f"or construct with max_rows=... to override"
            )
        if self._native is not None:
            self._native.add(data)
            self.ntotal = self._native.ntotal
            return
        start = self.ntotal
        self.vectors = (data if self.vectors is None
                        else np.concatenate([self.vectors, data]))
        for i in range(len(data)):
            self._insert(start + i)
        self.ntotal = len(self.vectors)

    def _insert(self, idx: int) -> None:
        level = int(-math.log(max(self.rng.rand(), 1e-12)) * self.mult)
        self.levels.append(level)
        prev_max = self.max_level
        while self.max_level < level:
            self.max_level += 1
            self.neighbors.append([[] for _ in range(idx)])
        for l in range(len(self.neighbors)):
            while len(self.neighbors[l]) <= idx:
                self.neighbors[l].append([])
        if self.entry < 0:
            self.entry = idx
            return
        q = self.vectors[idx]
        cur = self.entry
        for l in range(prev_max, level, -1):
            cur = self._greedy(q, cur, l)
        for l in range(min(level, prev_max), -1, -1):
            found = self._search_layer(q, cur, self.ef_construction, l)
            cap = self.m0 if l == 0 else self.m
            chosen = [i for _, i in found[:cap]]
            self.neighbors[l][idx] = chosen
            for n in chosen:
                lst = self.neighbors[l][n]
                lst.append(idx)
                if len(lst) > cap:
                    ds = self._dist(self.vectors[n], lst)
                    keep = np.argsort(ds)[:cap]
                    self.neighbors[l][n] = [lst[j] for j in keep]
            cur = found[0][1]
        if level > prev_max:
            self.entry = idx

    def search(self, q, k: int) -> Tuple[np.ndarray, np.ndarray]:
        q = np.asarray(q, np.float32)
        if self._native is not None:
            return self._native.search(np.ascontiguousarray(q), k,
                                       ef_search=self.ef_search)
        nq = len(q)
        dists = np.full((nq, k), np.inf, np.float32)
        ids = np.full((nq, k), -1, np.int64)
        ef = max(self.ef_search, k)
        for r in range(nq):
            if self.entry < 0:
                continue
            cur = self.entry
            for l in range(self.max_level, 0, -1):
                cur = self._greedy(q[r], cur, l)
            found = self._search_layer(q[r], cur, ef, 0)[:k]
            for j, (dd, ii) in enumerate(found):
                dists[r, j] = dd
                ids[r, j] = ii
        return dists, ids

    def reconstruct_n(self, start: int, n: int) -> np.ndarray:
        if self._native is not None:
            return self._native.reconstruct_n(start, n)
        return np.asarray(self.vectors[start:start + n])
