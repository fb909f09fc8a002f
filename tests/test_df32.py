"""
Double-float32 arithmetic and the df32 exact-path RK4 engine.

The df32 engine is the TPU default for ``precision='exact'`` vanilla chain
pricing (f64 scan bodies execute per-op-latency-bound on the axon backend;
PARITY.md "Double-float32 exact engine"), so its CPU parity against the
plain-f64 engine is part of the core suite.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stochvolmodels_tpu.utils import df32 as dd


class TestDf32Arithmetic:
    def test_from_f64_roundtrip(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(1000) * np.exp(rng.uniform(-8, 8, 1000))
        X = dd.from_f64(jnp.asarray(x))
        err = np.abs(np.asarray(dd.to_f64(X)) - x) / np.abs(x)
        assert np.max(err) < 1e-14

    def test_add_mul_accuracy(self):
        rng = np.random.default_rng(1)
        a = rng.standard_normal(1000) * np.exp(rng.uniform(-8, 8, 1000))
        b = rng.standard_normal(1000) * np.exp(rng.uniform(-8, 8, 1000))
        A, B = dd.from_f64(jnp.asarray(a)), dd.from_f64(jnp.asarray(b))
        s = np.asarray(dd.to_f64(dd.add(A, B)))
        m = np.asarray(dd.to_f64(dd.mul(A, B)))
        assert np.max(np.abs(s - (a + b)) / np.maximum(np.abs(a + b), 1e-30)) < 1e-12
        assert np.max(np.abs(m - a * b) / np.abs(a * b)) < 1e-13

    def test_chained_dot(self):
        """1000-term accumulated dot stays at df32 precision (the RK4
        usage pattern: long mul/add chains)."""
        rng = np.random.default_rng(2)
        x = rng.standard_normal((1000, 8))
        y = rng.standard_normal((1000, 8))
        acc = dd.df(jnp.zeros(8))
        X, Y = dd.from_f64(jnp.asarray(x)), dd.from_f64(jnp.asarray(y))
        for i in range(0, 1000, 50):  # chunked to keep the eager op count sane
            part = dd.df(jnp.zeros(8))
            for j in range(i, i + 50):
                part = dd.add(part, dd.mul(dd.DF(X.hi[j], X.lo[j]),
                                           dd.DF(Y.hi[j], Y.lo[j])))
            acc = dd.add(acc, part)
        ref = np.sum(x * y, axis=0)
        err = np.abs(np.asarray(dd.to_f64(acc)) - ref) / np.abs(ref)
        assert np.max(err) < 1e-12

    def test_scale_pow2_exact(self):
        x = dd.from_f64(jnp.asarray([1.234567890123456, -7.77e-5]))
        y = dd.scale_pow2(x, 2.0)
        np.testing.assert_array_equal(np.asarray(dd.to_f64(y)),
                                      2.0 * np.asarray(dd.to_f64(x)))


@pytest.mark.slow
class TestDf32Rk4Engine:
    def test_solver_matches_f64(self):
        """df32 RK4 vs the f64 RK4 on a small grid: same scheme, same
        steps, arithmetic agreement to ~1e-10 on well-conditioned lanes
        (near-divergent lanes are dropped by the quadrature in pricing)."""
        import stochvolmodels_tpu.models.logsv.affine as afe
        from stochvolmodels_tpu.utils.cplx import Cplx

        N = 16
        phi = Cplx(jnp.full((N,), -0.5), jnp.linspace(0.0, 10.0, N))
        psi = Cplx(jnp.zeros((N,)), jnp.zeros((N,)))
        kw = dict(ttm=0.25, theta=1.0, kappa1=2.21, kappa2=2.18, beta=0.15,
                  volvol=1.85, phi_grid=phi, psi_grid=psi,
                  expansion_order=afe.ExpansionOrder.FIRST, nb_steps=16)
        a64 = afe.solve_a_ode_grid(**kw)
        add_ = afe.solve_a_ode_grid_df32(**kw)
        np.testing.assert_allclose(np.asarray(add_.re), np.asarray(a64.re),
                                   rtol=0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(add_.im), np.asarray(a64.im),
                                   rtol=0, atol=1e-10)

    def test_chained_slices_match_f64(self):
        """slice-chained ODE state (the chain-pricer contract) through two
        maturities; also exercises the df32 divergence-freeze init."""
        import stochvolmodels_tpu.models.logsv.affine as afe
        from stochvolmodels_tpu.utils.cplx import Cplx

        N = 16
        phi = Cplx(jnp.full((N,), -0.5), jnp.linspace(0.0, 10.0, N))
        psi = Cplx(jnp.zeros((N,)), jnp.zeros((N,)))
        kw = dict(theta=1.0, kappa1=2.21, kappa2=2.18, beta=0.15,
                  volvol=1.85, phi_grid=phi, psi_grid=psi,
                  expansion_order=afe.ExpansionOrder.FIRST)
        a64 = afe.solve_a_ode_grid(ttm=0.1, nb_steps=16, **kw)
        add_ = afe.solve_a_ode_grid_df32(ttm=0.1, nb_steps=16, **kw)
        b64 = afe.solve_a_ode_grid(ttm=0.15, a_t0=a64, nb_steps=16, **kw)
        bdd = afe.solve_a_ode_grid_df32(ttm=0.15, a_t0=add_, nb_steps=16, **kw)
        np.testing.assert_allclose(np.asarray(bdd.re), np.asarray(b64.re),
                                   rtol=0, atol=1e-9)
        np.testing.assert_allclose(np.asarray(bdd.im), np.asarray(b64.im),
                                   rtol=0, atol=1e-9)
