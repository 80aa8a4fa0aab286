"""Multi-host (pod) skeleton: host-major mesh layout + pod feeding recipe.

No multi-host hardware exists in CI, so these tests exercise the
single-process simulation path of ``parallel.multihost`` on the 8-device
virtual CPU mesh (conftest): the mesh partitioner and collective placement
are identical to a real pod's; only the physical transport differs.
Reference analog: MPI rank-parallel likelihoods around MultiNest
(``NestedSampling_0.py:329-334``) — the only distribution the reference has.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from archnemesis_tpu.parallel import multihost


def test_initialize_single_process_noop(monkeypatch):
    # no coordinator configured -> returns process 0 without touching
    # jax.distributed (which would fail/handshake-timeout here)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert multihost.initialize() == 0
    assert multihost.initialize(num_processes=1) == 0


def test_hosts_axis_mesh_layout():
    mesh = multihost.hosts_axis_mesh(n_hosts=2)
    assert dict(mesh.shape) == {"data": 2, "wave": 4}
    # contiguous grouping: each simulated host owns a contiguous slice of
    # the device list (what process-ordered jax.devices() gives on a pod)
    dev = np.asarray(mesh.devices)
    ids = np.array([[d.id for d in row] for row in dev])
    assert (np.diff(ids.reshape(-1)) == 1).all()

    with pytest.raises(ValueError):
        multihost.hosts_axis_mesh(n_hosts=3)  # 8 devices don't split by 3


@pytest.mark.parametrize("n_hosts", [2, 4])
def test_process_local_batch_and_collective(n_hosts):
    """data-axis-sharded batch + a psum over the DCN axis == numpy."""
    mesh = multihost.hosts_axis_mesh(n_hosts=n_hosts)
    batch = np.arange(8.0 * 6).reshape(8, 6)
    arr = multihost.process_local_batch(mesh, batch)
    assert isinstance(arr.sharding, NamedSharding)
    assert arr.sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(arr), batch)

    # a jitted global reduction over the host axis lowers to a
    # cross-"DCN" collective under this layout
    with mesh:
        total = jax.jit(
            lambda x: jnp.sum(x, axis=0),
            in_shardings=NamedSharding(mesh, P("data")),
        )(arr)
    np.testing.assert_allclose(np.asarray(total), batch.sum(0), rtol=1e-12)


def test_hosts_mesh_matches_flat_mesh_forward():
    """The host-major mesh runs the same sharded program as the flat
    mesh: a wave-sharded computation with a data-sharded batch axis is
    numerically identical under both layouts."""
    from archnemesis_tpu.parallel.mesh import make_mesh

    def step(x, w):
        return jnp.sin(x) @ w

    x = np.linspace(0.0, 1.0, 4 * 16).reshape(4, 16)
    w = np.linspace(-1.0, 1.0, 16 * 3).reshape(16, 3)

    outs = []
    for mesh in (make_mesh(n_wave=4, n_data=2),
                 multihost.hosts_axis_mesh(n_hosts=2)):
        with mesh:
            xb = jax.device_put(x, NamedSharding(mesh, P("data", "wave")))
            wb = jax.device_put(w, NamedSharding(mesh, P("wave", None)))
            outs.append(np.asarray(jax.jit(step)(xb, wb)))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-12, atol=0.0)
