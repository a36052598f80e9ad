"""ANN index family tests: recall vs exact search on synthetic
fingerprint-like data (unit-norm 128-d with planted near-duplicates)."""

import numpy as np
import pytest

from grafp_tpu.retrieval.index import (
    IndexFlat,
    IndexIVFFlat,
    IndexIVFPQ,
    IndexIVFPQR,
    IndexLSH,
    get_index,
)


def _fingerprint_like(rng, n, d=32):
    x = rng.randn(n, d).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.RandomState(7)
    db = _fingerprint_like(rng, 2000)
    # queries = noisy copies of known rows
    gt = rng.choice(2000, size=50, replace=False)
    q = db[gt] + 0.05 * rng.randn(50, 32).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return db, q, gt


def _recall1(index, q, gt, k=10):
    _, ids = index.search(q, k)
    return float(np.mean(ids[:, 0] == gt))


def test_flat_exact(corpus):
    db, q, gt = corpus
    idx = IndexFlat(32)
    idx.train(db)
    idx.add(db)
    assert idx.ntotal == 2000
    d, i = idx.search(q, 5)
    assert d.shape == (50, 5) and i.shape == (50, 5)
    assert _recall1(idx, q, gt) == 1.0
    # distances ascending
    assert (np.diff(d, axis=1) >= -1e-6).all()
    # exact match of brute force
    ref = np.argmin(((q[:, None] - db[None]) ** 2).sum(-1), axis=1)
    np.testing.assert_array_equal(i[:, 0], ref)


def test_flat_blocked_merge(corpus, monkeypatch):
    db, q, gt = corpus
    import grafp_tpu.retrieval.index as mod

    monkeypatch.setattr(mod, "_DB_BLOCK", 300)  # force multi-block merge
    idx = IndexFlat(32)
    idx.add(db)
    d, i = idx.search(q, 5)
    ref = IndexFlat(32)
    ref.add(db)
    monkeypatch.setattr(mod, "_DB_BLOCK", 1 << 18)
    d2, i2 = ref.search(q, 5)
    np.testing.assert_array_equal(i, i2)
    np.testing.assert_allclose(d, d2, rtol=1e-5, atol=1e-6)


def test_ivf_high_recall(corpus):
    db, q, gt = corpus
    idx = IndexIVFFlat(32, nlist=16)
    idx.train(db)
    idx.add(db)
    idx.nprobe = 8
    assert _recall1(idx, q, gt) >= 0.9


def test_ivf_nprobe_selectivity(corpus):
    db, q, gt = corpus
    idx = IndexIVFFlat(32, nlist=16)
    idx.train(db)
    idx.add(db)
    idx.nprobe = 16  # probe everything == exact
    assert _recall1(idx, q, gt) == 1.0
    idx.nprobe = 1
    r1 = _recall1(idx, q, gt)
    assert r1 < 1.0 or True  # nprobe=1 may still be lucky; just must run
    _, ids = idx.search(q, 5)
    assert ids.shape == (50, 5)


def test_ivfpq_recall(corpus):
    db, q, gt = corpus
    idx = IndexIVFPQ(32, nlist=8, code_sz=16, nbits=8)
    idx.train(db)
    idx.add(db)
    idx.nprobe = 8
    assert _recall1(idx, q, gt, k=10) >= 0.8  # lossy codes
    rec = idx.reconstruct_n(0, 10)
    err = np.linalg.norm(rec - db[:10]) / np.linalg.norm(db[:10])
    assert err < 0.5


def test_ivfpqr_beats_or_matches_ivfpq(corpus):
    db, q, gt = corpus
    pq = IndexIVFPQ(32, nlist=8, code_sz=16, nbits=8)
    pq.train(db)
    pq.add(db)
    pq.nprobe = 8
    rr = IndexIVFPQR(32, nlist=8, code_sz=16, nbits=8, m_refine=4, nbits_refine=4)
    rr.train(db)
    rr.add(db)
    rr.nprobe = 8
    assert _recall1(rr, q, gt) >= _recall1(pq, q, gt) - 0.05


def test_lsh_recall(corpus):
    db, q, gt = corpus
    idx = IndexLSH(32, nbits=256)
    idx.add(db)
    assert _recall1(idx, q, gt, k=10) >= 0.7


def test_factory_contract():
    # the factory pins the reference geometry (d=128, code_sz=64)
    rng = np.random.RandomState(3)
    db = _fingerprint_like(rng, 600, d=128)
    q = db[:4] + 0.01 * rng.randn(4, 128).astype(np.float32)
    for mode in ("l2", "ivf", "ivfpq", "ivfpq-rr", "lsh", "hnsw"):
        idx = get_index(mode, db, db.shape, use_gpu=False, n_centroids=8)
        assert idx.nprobe == 20
        idx.add(db)
        d, i = idx.search(q, 3)
        assert i.shape == (4, 3)
    with pytest.raises(ValueError):
        get_index("bogus", db, db.shape)
    with pytest.raises(NotImplementedError):
        get_index("ivfpq-ondisk", db, db.shape)


def test_scan_topk_approx(corpus, monkeypatch):
    """scan_topk='approx' threads factory -> index -> masked_scan_search
    and, on the CPU backend (where approx_max_k lowers to exact
    selection), reproduces the exact results bit-for-bit - including
    across a forced multi-block merge (the cross-block merge stays
    exact by construction)."""
    db, q, gt = corpus
    import grafp_tpu.retrieval.index as mod

    exact = IndexFlat(32)
    exact.add(db)
    de, ie = exact.search(q, 5)

    idx = get_index("l2", db, db.shape, use_gpu=False, scan_topk="approx",
                    scan_recall=0.95)
    assert idx.scan_topk == "approx" and idx.scan_recall == 0.95
    idx.add(db)
    d, i = idx.search(q, 5)
    np.testing.assert_array_equal(i, ie)
    np.testing.assert_allclose(d, de, rtol=1e-5, atol=1e-6)

    monkeypatch.setattr(mod, "_DB_BLOCK", 300)  # multi-block running merge
    blk = IndexFlat(32)
    blk.scan_topk = "approx"
    blk.add(db)
    d2, i2 = blk.search(q, 5)
    np.testing.assert_array_equal(i2, ie)

    # IVF path: probe masking composes with approx selection
    ivf = get_index("ivf", db, db.shape, use_gpu=False, scan_topk="approx")
    ivf.add(db)
    _, ii = ivf.search(q, 10)
    assert float(np.mean(ii[:, 0] == gt)) >= 0.9

    # sharded path: approx applies to the LOCAL per-shard selection,
    # the ICI candidate merge stays exact
    from grafp_tpu.core.mesh import make_mesh
    from grafp_tpu.retrieval.index import IndexFlatSharded

    sh = IndexFlatSharded(32, make_mesh(n_data=1, n_db=8))
    sh.scan_topk = "approx"
    sh.add(db)
    ds, is_ = sh.search(q, 5)
    np.testing.assert_array_equal(is_, ie)


def test_sharded_flat_matches_flat(corpus):
    from grafp_tpu.core.mesh import make_mesh
    from grafp_tpu.retrieval.index import IndexFlatSharded

    db, q, gt = corpus
    mesh = make_mesh(n_data=1, n_db=8)
    a = IndexFlat(32)
    a.add(db[:1001])  # non-dividing row count -> shard padding exercised
    b = IndexFlatSharded(32, mesh)
    b.add(db[:1001])
    da, ia = a.search(q, 7)
    db_, ib = b.search(q, 7)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(da, db_, rtol=1e-4, atol=1e-5)


def test_decoded_cache_budget_derivation(monkeypatch):
    """The PQ decoded-cache budget is derived from HBM minus the scan
    transient (ADVICE r2), and the env override scales it."""
    from grafp_tpu.retrieval.index import _DB_BLOCK, IndexIVFPQ

    b16 = IndexIVFPQ.decoded_cache_budget()
    transient = IndexIVFPQ.QUERY_CHUNK * _DB_BLOCK * 4
    assert b16 == (16 << 30) - transient - (2 << 30)
    assert b16 >= int(7.96 * (1 << 30))     # fma_large's validated point fits
    monkeypatch.setenv("GRAFP_HBM_BYTES", str(8 << 30))
    assert IndexIVFPQ.decoded_cache_budget() == (8 << 30) - transient - (2 << 30)
