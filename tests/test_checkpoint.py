"""Checkpoint backends: .npz and Orbax round-trips of FotoState,
including a sharded Orbax restore onto the virtual 8-device mesh
(SURVEY.md §5 checkpoint/resume prescription, multi-host form)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofot_tpu.solvers import foto
from ofot_tpu.utils import checkpoint

import fixtures


@pytest.fixture(scope="module")
def state():
    f1, f2 = fixtures.translating_square(16)
    return foto.solve_potential(jnp.asarray(f1, jnp.float32),
                                jnp.asarray(f2, jnp.float32), 4,
                                convergence_tol=0.0, max_it=4,
                                reg_epsilon=1e-2, ops=foto.DCT_OPS)


def _assert_states_equal(a, b):
    for name in foto.FotoState._fields:
        np.testing.assert_array_equal(np.asarray(getattr(a, name)),
                                      np.asarray(getattr(b, name)),
                                      err_msg=name)


def test_npz_roundtrip(state, tmp_path):
    checkpoint.save_state(str(tmp_path / "st"), state)
    back = checkpoint.load_state(str(tmp_path / "st"))
    _assert_states_equal(state, back)


def test_orbax_roundtrip(state, tmp_path):
    checkpoint.save_state_orbax(str(tmp_path / "orb"), state)
    back = checkpoint.load_state_orbax(str(tmp_path / "orb"))
    _assert_states_equal(state, back)
    # the restored state resumes the solve exactly like the original
    f1, f2 = fixtures.translating_square(16)
    a = foto.solve_potential(jnp.asarray(f1, jnp.float32),
                             jnp.asarray(f2, jnp.float32), 4,
                             convergence_tol=0.0, max_it=8,
                             reg_epsilon=1e-2, ops=foto.DCT_OPS, init=state)
    b = foto.solve_potential(jnp.asarray(f1, jnp.float32),
                             jnp.asarray(f2, jnp.float32), 4,
                             convergence_tol=0.0, max_it=8,
                             reg_epsilon=1e-2, ops=foto.DCT_OPS, init=back)
    np.testing.assert_allclose(np.asarray(a.phi), np.asarray(b.phi),
                               atol=1e-12)


def test_orbax_sharded_restore(state, tmp_path):
    """Restore distributed: abstract_state with NamedShardings lays the
    arrays out over the (y, x) mesh at load time — no host gather."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    checkpoint.save_state_orbax(str(tmp_path / "orb_sh"), state)

    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("y", "x"))

    def spec(x):
        x = jnp.asarray(x)
        if x.ndim >= 2:     # trailing (Ny, Nx) tiled over the mesh
            parts = [None] * (x.ndim - 2) + ["y", "x"]
            return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    abstract = foto.FotoState(**{
        k: jax.ShapeDtypeStruct(jnp.asarray(v).shape,
                                jnp.asarray(v).dtype, sharding=spec(v))
        for k, v in state._asdict().items()})
    back = checkpoint.load_state_orbax(str(tmp_path / "orb_sh"),
                                       abstract_state=abstract)
    _assert_states_equal(state, back)
    assert back.phi.sharding.mesh.shape == {"y": 2, "x": 2}
