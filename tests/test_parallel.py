"""Distribution tests on a virtual 8-device CPU mesh.

Tile-vs-whole equivalence is the framework's race detector for
halo-exchange and reduction bugs (SURVEY.md §4e, §5).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ofot_tpu.ops import operators
from ofot_tpu.parallel import mesh as meshlib
from ofot_tpu.parallel import halo, sweep, gspmd, foto_sharded
from ofot_tpu.solvers import foto, gn
import fixtures

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def mesh4():
    return meshlib.spatial_mesh(2, 2)


@pytest.fixture(scope="module")
def mesh8():
    return meshlib.make_mesh({"data": 2, "y": 2, "x": 2})


RNG = np.random.default_rng(23)


class TestHaloStencils:
    """Each distributed stencil == its single-device twin."""

    @pytest.mark.parametrize("op_pair", [
        ("laplacian_st", "laplacian_st"),
        ("grad_st", "grad_st"),
    ])
    def test_ops_tiled_equal_whole(self, mesh4, op_pair):
        sops = halo.ShardedOps("y", "x", 2, 2)
        name, _ = op_pair
        phi = jnp.asarray(RNG.standard_normal((3, 8, 12)))

        want = getattr(operators, name)(phi, bc="N")
        out_spec = (P(None, None, "y", "x") if name == "grad_st"
                    else P(None, "y", "x"))
        fn = shard_map(lambda p: getattr(sops, name)(p, bc="N"),
                       mesh=mesh4, in_specs=P(None, "y", "x"),
                       out_specs=out_spec)
        got = jax.jit(fn)(phi)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-12)

    def test_div_st_tiled_equal_whole(self, mesh4):
        sops = halo.ShardedOps("y", "x", 2, 2)
        mu = jnp.asarray(RNG.standard_normal((3, 3, 8, 12)))
        want = operators.div_st(mu, bc="N")
        fn = shard_map(lambda m: sops.div_st(m, bc="N"),
                       mesh=mesh4, in_specs=P(None, None, "y", "x"),
                       out_specs=P(None, "y", "x"))
        got = jax.jit(fn)(mu)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-12)

    def test_psum_reduction(self, mesh4):
        sops = halo.ShardedOps("y", "x", 2, 2)
        x = jnp.asarray(RNG.standard_normal((8, 12)))
        fn = shard_map(lambda v: sops.sum(v * v), mesh=mesh4,
                       in_specs=P("y", "x"), out_specs=P())
        np.testing.assert_allclose(float(jax.jit(fn)(x)),
                                   float(jnp.sum(x * x)), rtol=1e-12)


class TestTiledFoto:
    def test_tiled_solve_equals_single_device(self, mesh4):
        """Tile-vs-whole equivalence.  CG dot products reduce in a different
        order under psum than the serial sum, so iterates diverge within the
        CG tolerance (SURVEY.md §7 hard part 4); with a tight cg_rtol the
        solves agree to fp-roundoff-amplified tolerance."""
        f1, f2 = fixtures.translating_square(24)
        kw = dict(r=1.0, convergence_tol=1e-6, reg_epsilon=1e-2, max_it=8,
                  cg_rtol=1e-13)
        whole = foto.solve_potential(jnp.asarray(f1), jnp.asarray(f2), 4, **kw)
        tiled = foto_sharded.solve_potential_tiled(
            jnp.asarray(f1), jnp.asarray(f2), 4, mesh4, **kw)
        np.testing.assert_allclose(np.asarray(tiled.phi),
                                   np.asarray(whole.phi), atol=1e-8)
        np.testing.assert_allclose(np.asarray(tiled.mu),
                                   np.asarray(whole.mu), atol=1e-8)
        np.testing.assert_allclose(float(tiled.crit), float(whole.crit),
                                   rtol=1e-6)
        assert int(tiled.iteration) == int(whole.iteration)

    def test_tile_shape_validation(self, mesh4):
        with pytest.raises(ValueError):
            foto_sharded.solve_potential_tiled(
                jnp.zeros((7, 8)), jnp.zeros((7, 8)), 4, mesh4)


class TestTiledWfr:
    def test_tiled_wfr_equals_single_device(self, mesh4):
        """Tile-vs-whole equivalence for the unbalanced solver (VERDICT.md
        r2 weak #5: WFR now runs the same shard_map + ppermute machinery
        as FOTO via ops injection).  Whole-grid uses the injected CG ops
        too so both sides solve stepA identically."""
        from ofot_tpu.parallel import wfr_sharded
        from ofot_tpu.solvers import wfr
        f1, f2 = fixtures.smooth_blob_pair(16, 24)
        f2 = 1.3 * f2                   # genuinely unbalanced pair
        kw = dict(delta=10.0, r=0.5, convergence_tol=1e-6,
                  reg_epsilon=1e-2, max_it=8, cg_rtol=1e-13)
        whole = wfr.solve_potential(jnp.asarray(f1), jnp.asarray(f2), 4,
                                    ops=foto.DEFAULT_OPS, **kw)
        tiled = wfr_sharded.solve_potential_tiled(
            jnp.asarray(f1), jnp.asarray(f2), 4, mesh4, **kw)
        np.testing.assert_allclose(np.asarray(tiled.phi),
                                   np.asarray(whole.phi), atol=1e-8)
        np.testing.assert_allclose(np.asarray(tiled.mu),
                                   np.asarray(whole.mu), atol=1e-8)
        assert int(tiled.iteration) == int(whole.iteration)

    def test_tiled_wfr_shape_validation(self, mesh4):
        from ofot_tpu.parallel import wfr_sharded
        with pytest.raises(ValueError):
            wfr_sharded.solve_potential_tiled(
                jnp.zeros((7, 8)), jnp.zeros((7, 8)), 4, mesh4)


class TestTiledGN:
    def test_tiled_gn_equals_single_device(self, mesh4):
        from ofot_tpu.parallel import gn_sharded
        f1, f2 = fixtures.smooth_blob_pair(16, 24)
        whole = gn.solve_fields(jnp.asarray(f1), jnp.asarray(f2),
                                precond="jacobi", rtol=1e-12)
        tiled = gn_sharded.solve_fields_tiled(
            jnp.asarray(f1), jnp.asarray(f2), mesh4, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(tiled.u), np.asarray(whole.u),
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(tiled.v), np.asarray(whole.v),
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(tiled.m), np.asarray(whole.m),
                                   atol=1e-8)

    def test_tiled_gn_shape_validation(self, mesh4):
        from ofot_tpu.parallel import gn_sharded
        with pytest.raises(ValueError):
            gn_sharded.solve_fields_tiled(jnp.zeros((7, 8)),
                                          jnp.zeros((7, 8)), mesh4)


class TestGspmd:
    def test_foto_gspmd_sharded_equals_whole(self, mesh4):
        f1, f2 = fixtures.translating_square(24)
        kw = dict(r=1.0, convergence_tol=1e-6, reg_epsilon=1e-2, max_it=6)
        whole = foto.solve_potential(jnp.asarray(f1), jnp.asarray(f2), 4, **kw)
        sharded = gspmd.solve_foto_sharded(
            jnp.asarray(f1), jnp.asarray(f2), 4, mesh4, **kw)
        np.testing.assert_allclose(np.asarray(sharded.phi),
                                   np.asarray(whole.phi), atol=1e-8)

    def test_foto_gspmd_dct_sharded_equals_whole(self, mesh4):
        """Spectral stepA under GSPMD tiling: the DCT transforms become
        sharded matmuls (XLA inserts the collectives)."""
        f1, f2 = fixtures.translating_square(24)
        kw = dict(r=1.0, convergence_tol=1e-6, reg_epsilon=1e-2, max_it=6,
                  ops=foto.DCT_OPS)
        whole = foto.solve_potential(jnp.asarray(f1), jnp.asarray(f2), 4, **kw)
        sharded = gspmd.solve_foto_sharded(
            jnp.asarray(f1), jnp.asarray(f2), 4, mesh4, **kw)
        np.testing.assert_allclose(np.asarray(sharded.phi),
                                   np.asarray(whole.phi), atol=1e-8)

    def test_gn_gspmd_sharded_equals_whole(self, mesh4):
        f1, f2 = fixtures.smooth_blob_pair(16, 24)
        whole = gn.solve_fields(jnp.asarray(f1), jnp.asarray(f2))
        sharded = gspmd.solve_gn_sharded(jnp.asarray(f1), jnp.asarray(f2),
                                         mesh4)
        np.testing.assert_allclose(np.asarray(sharded.u),
                                   np.asarray(whole.u), atol=1e-8)

    def test_wfr_gspmd_sharded_equals_whole(self, mesh4):
        """Unbalanced solver under GSPMD tiling, on an unbalanced pair."""
        from ofot_tpu.solvers import wfr
        f1, f2 = fixtures.smooth_blob_pair(16, 24)
        f2 = 1.3 * f2
        kw = dict(delta=10.0, r=0.5, convergence_tol=1e-6,
                  reg_epsilon=1e-2, max_it=6)
        whole = wfr.solve_potential(jnp.asarray(f1), jnp.asarray(f2), 4,
                                    **kw)
        sharded = gspmd.solve_wfr_sharded(jnp.asarray(f1),
                                          jnp.asarray(f2), 4, mesh4, **kw)
        np.testing.assert_allclose(np.asarray(sharded.phi),
                                   np.asarray(whole.phi), atol=1e-8)
        np.testing.assert_allclose(np.asarray(sharded.mu[3]),
                                   np.asarray(whole.mu[3]), atol=1e-8)


class TestSweep:
    def test_batch_matches_individual(self):
        pairs = [fixtures.translating_square(18),
                 fixtures.smooth_blob_pair(18, 18)]
        r0 = np.stack([p[0] for p in pairs])
        rT = np.stack([p[1] for p in pairs])
        kw = dict(r=1.0, convergence_tol=1e-6, reg_epsilon=1e-2, max_it=5)
        batch = sweep.solve_foto_batch(r0, rT, 4, None, **kw)
        for i, (f1, f2) in enumerate(pairs):
            single = foto.solve_potential(jnp.asarray(f1), jnp.asarray(f2),
                                          4, **kw)
            np.testing.assert_allclose(np.asarray(batch.phi[i]),
                                       np.asarray(single.phi), atol=1e-8)

    def test_data_sharded_sweep(self, mesh8):
        """Batch axis sharded over 'data' with (y, x) tiling via GSPMD."""
        f1, f2 = fixtures.translating_square(16)
        r0 = np.stack([f1, f1 * 0.9, f1 * 0.8, f1 * 0.7])
        rT = np.stack([f2, f2 * 0.9, f2 * 0.8, f2 * 0.7])
        dmesh = meshlib.make_mesh({"data": 4})
        kw = dict(r=1.0, convergence_tol=1e-6, reg_epsilon=1e-2, max_it=4)
        batch = sweep.solve_foto_batch(r0, rT, 4, dmesh, **kw)
        single = foto.solve_potential(jnp.asarray(r0[2]), jnp.asarray(rT[2]),
                                      4, **kw)
        np.testing.assert_allclose(np.asarray(batch.phi[2]),
                                   np.asarray(single.phi), atol=1e-8)

    def test_sweep_heterogeneous(self):
        pairs = [("a", *fixtures.translating_square(18)),
                 ("b", *fixtures.smooth_blob_pair(12, 16)),
                 ("c", *fixtures.smooth_blob_pair(12, 16, shift=(1.0, 2.0)))]
        dmesh = meshlib.make_mesh({"data": 2})
        kw = dict(r=1.0, convergence_tol=1e-6, reg_epsilon=1e-2, max_it=3)
        out = sweep.sweep_foto(pairs, 4, dmesh, **kw)
        assert set(out) == {"a", "b", "c"}
        assert out["a"].phi.shape == (4, 18, 18)
        assert out["b"].phi.shape == (4, 12, 16)


def test_auto_r_tiled_matches_whole():
    """auto_r's data-dependent penalty must be the GLOBAL max under
    shard_map (ops.max -> pmax); a tile-local max silently gives each
    device a different ADMM iteration (review, round 4)."""
    import jax.numpy as jnp
    from ofot_tpu.solvers import foto
    from ofot_tpu.parallel import foto_sharded
    from ofot_tpu.parallel.mesh import make_mesh
    from tests.fixtures import smooth_blob_pair

    f1, f2 = smooth_blob_pair(16, 16, dtype=np.float32)
    # non-unit peak so auto_r actually rescales; blob peak lives in ONE
    # tile, so a tile-local max would differ across devices
    a, b = jnp.asarray(f1 * 7.3), jnp.asarray(f2 * 7.3)
    kw = dict(r=1.0, reg_epsilon=1e-2, convergence_tol=0.0, max_it=6,
              cg_rtol=1e-12, cg_maxiter=300, auto_r=True)
    whole = foto.solve_potential(a, b, 4, **kw)
    tiled = foto_sharded.solve_potential_tiled(
        a, b, 4, make_mesh({"y": 2, "x": 2}), **kw)
    np.testing.assert_allclose(np.asarray(whole.phi),
                               np.asarray(tiled.phi), atol=2e-5)
