import jax
import jax.numpy as jnp
import pytest

from grafp_tpu.core.mesh import (
    DATA_AXIS,
    DB_AXIS,
    data_sharding,
    db_sharding,
    local_batch_size,
    make_mesh,
    replicated_sharding,
)


def test_virtual_devices_present():
    assert len(jax.devices()) == 8
    assert jax.default_backend() == "cpu"


def test_make_mesh_defaults():
    m = make_mesh()
    assert m.shape[DATA_AXIS] == 8 and m.shape[DB_AXIS] == 1


def test_make_mesh_2d():
    m = make_mesh(n_data=4, n_db=2)
    assert m.shape[DATA_AXIS] == 4 and m.shape[DB_AXIS] == 2


def test_make_mesh_oversubscribed_raises():
    with pytest.raises(ValueError):
        make_mesh(n_data=16, n_db=1)


def test_shard_and_gather_roundtrip():
    m = make_mesh()
    x = jnp.arange(32.0).reshape(16, 2)
    xs = jax.device_put(x, data_sharding(m, 2))
    assert len(xs.sharding.device_set) == 8
    assert jnp.allclose(jax.device_get(xs), x)
    xr = jax.device_put(x, replicated_sharding(m))
    assert jnp.allclose(xr, x)
    xd = jax.device_put(x, db_sharding(make_mesh(n_data=1, n_db=8)))
    assert jnp.allclose(xd, x)


def test_local_batch_size():
    m = make_mesh()
    assert local_batch_size(256, m) == 32
    with pytest.raises(ValueError):
        local_batch_size(10, m)
