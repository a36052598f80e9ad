import jax.numpy as jnp
import numpy as np

from grafp_tpu.core.mesh import make_mesh
from grafp_tpu.retrieval.memmap_io import MemmapWriter, load_memmap_data, save_memmap
from grafp_tpu.retrieval.search import exact_topk, exact_topk_sharded


def _np_topk_l2(q, db, k):
    d = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    ids = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, ids, 1), ids


def test_exact_topk_matches_numpy(rng):
    q = rng.randn(7, 16).astype(np.float32)
    db = rng.randn(100, 16).astype(np.float32)
    s, i = exact_topk(jnp.asarray(q), jnp.asarray(db), 5)
    ref_s, ref_i = _np_topk_l2(q, db, 5)
    np.testing.assert_allclose(np.asarray(s), ref_s, rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i), ref_i)


def test_exact_topk_blockwise_matches_dense(rng):
    q = rng.randn(5, 8).astype(np.float32)
    db = rng.randn(103, 8).astype(np.float32)  # non-dividing size
    s0, i0 = exact_topk(jnp.asarray(q), jnp.asarray(db), 7)
    s1, i1 = exact_topk(jnp.asarray(q), jnp.asarray(db), 7, block_rows=16)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_exact_topk_ip_metric(rng):
    q = rng.randn(3, 8).astype(np.float32)
    db = rng.randn(50, 8).astype(np.float32)
    s, i = exact_topk(jnp.asarray(q), jnp.asarray(db), 4, metric="ip")
    ref = q @ db.T
    ref_i = np.argsort(-ref, axis=1)[:, :4]
    np.testing.assert_array_equal(np.asarray(i), ref_i)


def test_exact_topk_sharded_matches_dense(rng):
    mesh = make_mesh(n_data=1, n_db=8)
    q = rng.randn(6, 16).astype(np.float32)
    db = rng.randn(97, 16).astype(np.float32)  # forces padding on shards
    s0, i0 = exact_topk(jnp.asarray(q), jnp.asarray(db), 9)
    s1, i1 = exact_topk_sharded(jnp.asarray(q), jnp.asarray(db), 9, mesh)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_memmap_roundtrip_and_nan_scrub(tmp_path, rng):
    arr = rng.randn(10, 4).astype(np.float32)
    arr[3, 2] = np.nan
    save_memmap(str(tmp_path), "db", arr)
    data, shape = load_memmap_data(str(tmp_path), "db", display=False)
    assert tuple(shape) == (10, 4)
    assert data[3, 2] == 0.0
    arr[3, 2] = 0.0
    np.testing.assert_array_equal(np.asarray(data), arr)


def test_memmap_append_extra_length(tmp_path, rng):
    arr = rng.randn(6, 4).astype(np.float32)
    save_memmap(str(tmp_path), "dummy_db", arr)
    data, shape = load_memmap_data(
        str(tmp_path), "dummy_db", append_extra_length=3, display=False
    )
    assert tuple(shape) == (9, 4)
    data[6:9] = 1.0
    data.flush()


def test_memmap_writer_streaming(tmp_path, rng):
    w = MemmapWriter(str(tmp_path), "q", dim=4, capacity=100)
    a, b = rng.randn(7, 4).astype(np.float32), rng.randn(5, 4).astype(np.float32)
    w.append(a)
    w.append(b)
    n, d = w.close()
    assert (n, d) == (12, 4)
    data, shape = load_memmap_data(str(tmp_path), "q", display=False)
    assert tuple(shape) == (12, 4)
    np.testing.assert_array_equal(np.asarray(data), np.concatenate([a, b]))


def test_exact_topk_streaming_matches_dense(rng):
    from grafp_tpu.retrieval.search import exact_topk_streaming

    q = rng.randn(6, 16).astype(np.float32)
    db = rng.randn(531, 16).astype(np.float32)
    s0, i0 = exact_topk(jnp.asarray(q), jnp.asarray(db), 7)
    s1, i1 = exact_topk_streaming(q, db, 7, host_block=100, device_block=32)
    np.testing.assert_array_equal(np.asarray(i0), i1)
    np.testing.assert_allclose(np.asarray(s0), s1, rtol=1e-4, atol=1e-5)
    # memmap input path
    import tempfile, os
    tmp = tempfile.mkdtemp()
    mm = np.memmap(os.path.join(tmp, "db.mm"), dtype=np.float32, mode="w+",
                   shape=db.shape)
    mm[:] = db
    s2, i2 = exact_topk_streaming(q, mm, 7, host_block=200)
    np.testing.assert_array_equal(np.asarray(i0), i2)


def test_approx_topk_ip(rng):
    from grafp_tpu.retrieval.search import approx_topk_ip

    q = rng.randn(8, 32).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    db = rng.randn(400, 32).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    _, i_ex = exact_topk(jnp.asarray(q), jnp.asarray(db), 5, metric="ip")
    _, i_ap = approx_topk_ip(jnp.asarray(q), jnp.asarray(db), 5)
    # high agreement on top-1
    assert np.mean(np.asarray(i_ap)[:, 0] == np.asarray(i_ex)[:, 0]) >= 0.75


def test_memmap_writer_grows(tmp_path, rng):
    w = MemmapWriter(str(tmp_path), "g", dim=4, capacity=8)
    data = rng.randn(30, 4).astype(np.float32)
    for j in range(0, 30, 5):
        w.append(data[j:j + 5])
    n, d = w.close()
    assert (n, d) == (30, 4)
    out, shape = load_memmap_data(str(tmp_path), "g", display=False)
    assert tuple(shape) == (30, 4)
    np.testing.assert_array_equal(np.asarray(out), data)


def test_streaming_device_block_default_avoids_v5e_pathology():
    """The >HBM streaming path must default to >= DB_BLOCK_ROWS device
    blocks: 256k-row f32 blocks are ~100x slower on v5e (CLAUDE.md
    shape-pathology (a)); round-1 shipped exactly that bad default."""
    import inspect

    from grafp_tpu.retrieval import index as index_mod
    from grafp_tpu.retrieval.search import DB_BLOCK_ROWS, exact_topk_streaming

    default = inspect.signature(exact_topk_streaming).parameters[
        "device_block"
    ].default
    assert default >= DB_BLOCK_ROWS >= (1 << 20)
    assert index_mod._DB_BLOCK == DB_BLOCK_ROWS
