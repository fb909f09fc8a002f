"""
Affine expansion of the MGF for the factor HJM model with a LogSV driver
(Sec. 6, Theorem 6.1 of Sepp & Rakhmonov 2025).

Rebuild of /root/reference/stochvolmodels/pricers/factor_hjm/rate_affine_expansion.py.
The ODE coefficients are time-dependent (piecewise term structures measured
under Q^A / Q^T), but enter only through seven scalar time series:
kappa0/1/2(t), vartheta^2(t), a.beta(t), a.a(t) and b(t).  Those are
interpolated onto the RK4 stage times host-side; the integrator then runs
the whole transform grid at once under ``lax.scan`` (the reference loops
scipy solve_ivp per grid point with cubic-spline coefficient interpolation,
rate_affine_expansion.py:87-164 — here stage coefficients are linear
interpolants of the same series).
"""
from __future__ import annotations

from enum import Enum
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stochvolmodels_tpu.models.logsv.affine import ExpansionOrder, get_expansion_n
from stochvolmodels_tpu.utils.cplx import Cplx

Array = jnp.ndarray


class UnderlyingType(Enum):
    """swap rate (swaptions) or log-shifted futures rate (rate futures)."""
    SWAP = 1
    FUTURES = 2


def _scalar_series(times: np.ndarray,
                   a0: np.ndarray,
                   a1: np.ndarray,
                   kappa0: np.ndarray,
                   kappa1: np.ndarray,
                   kappa2: np.ndarray,
                   beta: np.ndarray,
                   volvol: np.ndarray,
                   b: np.ndarray,
                   underlying_type: UnderlyingType
                   ) -> Array:
    """reduce the vector coefficient series to the seven scalar series
    [kappa0, kappa1, kappa2, vartheta2, a_prod_beta, a_prod_a, b].

    jnp throughout so traced (differentiable) coefficient inputs flow into
    the ODE solve — gradient-based rate calibration needs d(price)/d(beta,
    volvol, ...) through this reduction.
    """
    a0 = jnp.atleast_2d(jnp.asarray(a0).T).T  # (T, d)
    beta = jnp.atleast_2d(jnp.asarray(beta).T).T
    volvol = jnp.asarray(volvol)
    vartheta2 = jnp.einsum('td,td->t', beta, beta) + volvol ** 2
    a_prod_beta = jnp.einsum('td,td->t', a0, beta)
    a_prod_a = jnp.einsum('td,td->t', a0, a0)
    if underlying_type == UnderlyingType.FUTURES:
        a_prod_beta = a_prod_beta + jnp.asarray(a1) * volvol
        a_prod_a = a_prod_a + jnp.asarray(a1) ** 2
    T = a0.shape[0]
    return jnp.stack([jnp.broadcast_to(jnp.asarray(kappa0, dtype=float), (T,)),
                      jnp.broadcast_to(jnp.asarray(kappa1, dtype=float), (T,)),
                      jnp.broadcast_to(jnp.asarray(kappa2, dtype=float), (T,)),
                      vartheta2, a_prod_beta, a_prod_a,
                      jnp.broadcast_to(jnp.asarray(b, dtype=float), (T,))],
                     axis=0)  # (7, T)


def _rates_ode_terms(q: float, coeffs: Array, phi: Cplx, n: int
                     ) -> Tuple[Array, Cplx, Cplx]:
    """(M, L, H) panels from the scalar coefficients at one stage time.

    coeffs = [kappa0, kappa1, kappa2, vartheta2, a_prod_beta, a_prod_a, b];
    M (n,n,n) real, L = L0 + phi*L1 expanded over the grid (N,n,n) complex,
    H (N,n) complex (rate_affine_expansion.py:263-366).
    """
    kappa0, kappa1, kappa2, vartheta2, apb, apa, b = (coeffs[i] for i in range(7))
    q2 = q * q
    qv = q * vartheta2
    qv2 = q2 * vartheta2

    M = jnp.zeros((n, n, n))
    M = M.at[0, 1, 1].set(0.5 * qv2)
    M = M.at[1, 1, 1].set(qv)
    M = M.at[1, 1, 2].set(qv2).at[1, 2, 1].set(qv2)
    M = M.at[2, 1, 1].set(0.5 * vartheta2).at[2, 2, 2].set(2.0 * qv2)
    M = M.at[2, 2, 1].set(2.0 * qv).at[2, 1, 2].set(2.0 * qv)
    if n == 5:
        M = M.at[2, 1, 3].set(1.5 * qv2).at[2, 3, 1].set(1.5 * qv2)
        M = M.at[3, 2, 2].set(4.0 * qv)
        M = M.at[3, 1, 2].set(vartheta2).at[3, 2, 1].set(vartheta2)
        M = M.at[3, 1, 3].set(3.0 * qv).at[3, 3, 1].set(3.0 * qv)
        M = M.at[3, 1, 4].set(2.0 * qv2).at[3, 4, 1].set(2.0 * qv2)
        M = M.at[3, 2, 3].set(3.0 * qv2).at[3, 3, 2].set(3.0 * qv2)
        M = M.at[4, 2, 2].set(2.0 * vartheta2).at[4, 3, 3].set(4.5 * qv2)
        M = M.at[4, 1, 3].set(1.5 * vartheta2).at[4, 3, 1].set(1.5 * vartheta2)
        M = M.at[4, 1, 4].set(4.0 * qv).at[4, 4, 1].set(4.0 * qv)
        M = M.at[4, 2, 3].set(6.0 * qv).at[4, 3, 2].set(6.0 * qv)
        M = M.at[4, 2, 4].set(4.0 * qv2).at[4, 4, 2].set(4.0 * qv2)

    L0 = jnp.zeros((n, n))
    L1 = jnp.zeros((n, n))
    L0 = L0.at[0, 1].set(kappa0).at[0, 2].set(qv2)
    L1 = L1.at[0, 1].set(-q2 * apb)
    L0 = L0.at[1, 1].set(-kappa1).at[1, 2].set(2.0 * (kappa0 + qv))
    L1 = L1.at[1, 1].set(-2.0 * q * apb).at[1, 2].set(-2.0 * q2 * apb)
    L0 = L0.at[2, 1].set(-kappa2).at[2, 2].set(vartheta2 - 2.0 * kappa1)
    L1 = L1.at[2, 1].set(-apb).at[2, 2].set(-4.0 * q * apb)
    if n == 5:
        L0 = L0.at[1, 3].set(3.0 * qv2)
        L0 = L0.at[2, 3].set(3.0 * (kappa0 + 2.0 * qv)).at[2, 4].set(6.0 * qv2)
        L1 = L1.at[2, 3].set(-3.0 * q2 * apb)
        L0 = L0.at[3, 2].set(-2.0 * kappa2).at[3, 3].set(3.0 * (vartheta2 - kappa1))
        L0 = L0.at[3, 4].set(4.0 * (3.0 * qv + kappa0))
        L1 = L1.at[3, 2].set(-2.0 * apb).at[3, 3].set(-6.0 * q * apb)
        L1 = L1.at[3, 4].set(-4.0 * q2 * apb)
        L0 = L0.at[4, 3].set(-3.0 * kappa2).at[4, 4].set(2.0 * (3.0 * vartheta2 - 2.0 * kappa1))
        L1 = L1.at[4, 3].set(-3.0 * apb).at[4, 4].set(-8.0 * q * apb)

    L = Cplx(L0[None, :, :] + phi.re[:, None, None] * L1[None, :, :],
             phi.im[:, None, None] * L1[None, :, :])
    # H[k] = h_k(q) * phi * (2 b + a.a phi), h = [q^2/2, q, 1/2, 0, 0]
    h = jnp.zeros(n)
    h = h.at[0].set(0.5 * q2).at[1].set(q).at[2].set(0.5)
    inner = phi * apa + 2.0 * b      # (N,)
    hphi = phi * inner               # phi*(2b + a.a phi)
    H = Cplx(h[None, :] * hphi.re[:, None], h[None, :] * hphi.im[:, None])
    return M, L, H


def _ode_rhs(A: Cplx, M: Array, L: Cplx, H: Cplx) -> Cplx:
    """dA/dtau = A' M A + L A + H over the (N, n) panel (M real symmetric)."""
    Ma = jnp.einsum('kij,nj->nki', M, A.re)
    Mb = jnp.einsum('kij,nj->nki', M, A.im)
    quad_re = jnp.einsum('nki,ni->nk', Ma, A.re) - jnp.einsum('nki,ni->nk', Mb, A.im)
    quad_im = 2.0 * jnp.einsum('nki,ni->nk', Ma, A.im)
    lin_re = jnp.einsum('nij,nj->ni', L.re, A.re) - jnp.einsum('nij,nj->ni', L.im, A.im)
    lin_im = jnp.einsum('nij,nj->ni', L.re, A.im) + jnp.einsum('nij,nj->ni', L.im, A.re)
    return Cplx(quad_re + lin_re + H.re, quad_im + lin_im + H.im)


def _rates_ode_templates(q: float, n: int):
    """static structure tensors of the (M, L, H) panels.

    Every entry of M, L0, L1 in :func:`_rates_ode_terms` is a LINEAR
    combination of the per-stage scalars (kappa0, kappa1, kappa2,
    vartheta2, a_prod_beta) with coefficients depending only on the static
    q = theta: M = vartheta2 * TM(q), L0 = kappa0 K0 + kappa1 K1 +
    kappa2 K2 + vartheta2 V(q), L1 = a_prod_beta * P(q), H-direction
    h(q).  Precomputing the templates on host turns the per-RK4-stage
    panel assembly from ~60 scatter updates into 5 scalar-times-constant
    AXPYs — the difference between a latency-bound and a fused scan step
    on TPU (scripts/bench_cube_reprice.py).
    """
    q2 = q * q
    TM = np.zeros((n, n, n))
    TM[0, 1, 1] = 0.5 * q2
    TM[1, 1, 1] = q
    TM[1, 1, 2] = TM[1, 2, 1] = q2
    TM[2, 1, 1] = 0.5
    TM[2, 2, 2] = 2.0 * q2
    TM[2, 2, 1] = TM[2, 1, 2] = 2.0 * q
    K0 = np.zeros((n, n)); K1 = np.zeros((n, n)); K2 = np.zeros((n, n))
    V = np.zeros((n, n)); P = np.zeros((n, n))
    K0[0, 1] = 1.0
    V[0, 2] = q2
    K1[1, 1] = -1.0
    K0[1, 2] = 2.0; V[1, 2] = 2.0 * q
    K2[2, 1] = -1.0
    V[2, 2] = 1.0; K1[2, 2] = -2.0
    P[0, 1] = -q2
    P[1, 1] = -2.0 * q; P[1, 2] = -2.0 * q2
    P[2, 1] = -1.0; P[2, 2] = -4.0 * q
    if n == 5:
        TM[2, 1, 3] = TM[2, 3, 1] = 1.5 * q2
        TM[3, 2, 2] = 4.0 * q
        TM[3, 1, 2] = TM[3, 2, 1] = 1.0
        TM[3, 1, 3] = TM[3, 3, 1] = 3.0 * q
        TM[3, 1, 4] = TM[3, 4, 1] = 2.0 * q2
        TM[3, 2, 3] = TM[3, 3, 2] = 3.0 * q2
        TM[4, 2, 2] = 2.0
        TM[4, 3, 3] = 4.5 * q2
        TM[4, 1, 3] = TM[4, 3, 1] = 1.5
        TM[4, 1, 4] = TM[4, 4, 1] = 4.0 * q
        TM[4, 2, 3] = TM[4, 3, 2] = 6.0 * q
        TM[4, 2, 4] = TM[4, 4, 2] = 4.0 * q2
        V[1, 3] = 3.0 * q2
        K0[2, 3] = 3.0; V[2, 3] = 6.0 * q
        V[2, 4] = 6.0 * q2
        K2[3, 2] = -2.0
        V[3, 3] = 3.0; K1[3, 3] = -3.0
        V[3, 4] = 12.0 * q; K0[3, 4] = 4.0
        K2[4, 3] = -3.0
        V[4, 4] = 6.0; K1[4, 4] = -4.0
        P[2, 3] = -3.0 * q2
        P[3, 2] = -2.0; P[3, 3] = -6.0 * q; P[3, 4] = -4.0 * q2
        P[4, 3] = -3.0; P[4, 4] = -8.0 * q
    h = np.zeros(n)
    h[0] = 0.5 * q2; h[1] = q; h[2] = 0.5
    return tuple(jnp.asarray(t) for t in (TM, K0, K1, K2, V, P, h))


def _ode_rhs_from_templates(A: Cplx, phi: Cplx, c, templates) -> Cplx:
    """rhs of one RK4 stage directly from the 7 stage scalars ``c`` and the
    static templates — mathematically identical to
    ``_ode_rhs(A, *_rates_ode_terms(q, c, phi, n))`` (tested), but with no
    scatters and only (N, n) x (n, n) matmuls inside the scan."""
    TM, K0, K1, K2, V, P, h = templates
    kappa0, kappa1, kappa2, vartheta2, apb, apa, b = (c[i] for i in range(7))
    L0 = kappa0 * K0 + kappa1 * K1 + kappa2 * K2 + vartheta2 * V
    L1 = apb * P
    qr = (jnp.einsum('kij,ni,nj->nk', TM, A.re, A.re)
          - jnp.einsum('kij,ni,nj->nk', TM, A.im, A.im))
    qi = 2.0 * jnp.einsum('kij,ni,nj->nk', TM, A.re, A.im)
    B_re = A.re @ L1.T
    B_im = A.im @ L1.T
    lin_re = A.re @ L0.T + phi.re[:, None] * B_re - phi.im[:, None] * B_im
    lin_im = A.im @ L0.T + phi.re[:, None] * B_im + phi.im[:, None] * B_re
    inner = phi * apa + 2.0 * b
    hphi = phi * inner
    return Cplx(vartheta2 * qr + lin_re + h[None, :] * hphi.re[:, None],
                vartheta2 * qi + lin_im + h[None, :] * hphi.im[:, None])


def solve_a_ode_grid(phi_grid: Cplx,
                     ttm: float,
                     q: float,
                     times: np.ndarray,
                     a0: np.ndarray,
                     a1: np.ndarray,
                     kappa0: np.ndarray,
                     kappa1: np.ndarray,
                     kappa2: np.ndarray,
                     beta: np.ndarray,
                     volvol: np.ndarray,
                     b: Optional[np.ndarray] = None,
                     a_t0: Optional[Cplx] = None,
                     expansion_order: ExpansionOrder = ExpansionOrder.FIRST,
                     underlying_type: UnderlyingType = UnderlyingType.SWAP,
                     year_steps: int = 360,
                     engine: str = "f64"
                     ) -> Cplx:
    """batched RK4 for the time-dependent Riccati system over the Phi grid.

    ``engine='df32'`` routes through the double-float32 batch solver
    (P=1) — the fused f32 scan path on the axon backend; requires a zero
    initial condition (the batch solver's contract; every swaption/rates
    slice starts from A(0)=0)."""
    n = get_expansion_n(expansion_order)
    n_grid = phi_grid.shape[0]
    use_df32 = engine == "df32" and a_t0 is None
    if a_t0 is None:
        a_t0 = Cplx(jnp.zeros((n_grid, n)), jnp.zeros((n_grid, n)))
    if b is None:
        b = np.zeros_like(np.asarray(times, dtype=float))

    series = _scalar_series(times, a0, a1, kappa0, kappa1, kappa2, beta,
                            volvol, b, underlying_type)          # (7, T)
    nb_steps = max(int(np.ceil(year_steps * float(ttm))), 16)
    dt = float(ttm) / nb_steps
    # stage times in tau; coefficients evaluated at t = ttm - tau
    tau0 = np.arange(nb_steps) * dt
    stage_taus = np.stack([tau0, tau0 + 0.5 * dt, tau0 + dt], axis=1)  # (S, 3)
    t_eval = jnp.asarray(float(ttm) - stage_taus)
    times_f = jnp.asarray(np.asarray(times, dtype=float))
    coeffs = jax.vmap(
        lambda s: jnp.interp(t_eval.ravel(), times_f, s))(series)
    coeffs = jnp.moveaxis(coeffs.reshape(7, nb_steps, 3), 0, 1)  # (S, 7, 3)

    if use_df32:
        out = solve_a_ode_grid_batch_df32(
            phi_grid, jnp.asarray([dt]), coeffs[None], q=q,
            expansion_order=expansion_order)
        return Cplx(out.re[0], out.im[0])

    # Sticky divergence-freeze (same policy as models/logsv/affine.py): the
    # RK4 is only stable while |A| stays moderate; at extreme |phi| (the far
    # tail of a fixed tanh-sinh panel) the mode rate a.a|phi|^2 exceeds 1/dt
    # and A blows up.  Clamping keeps every primal finite (so reverse-mode
    # stays NaN-free), and a diverged node is frozen at re=-BIG => its
    # integrand contribution is exactly 0 — the quadrature truncates there,
    # which is what the reference's adaptive loop does by stopping early.
    CLAMP = 1.0e3
    DEAD_RE = -1.0e4

    templates = _rates_ode_templates(q, n)

    def rk4_step(carry, c):
        a_re, a_im, dead = carry
        A = Cplx(a_re, a_im)
        k1 = _ode_rhs_from_templates(A, phi_grid, c[:, 0], templates)
        k2 = _ode_rhs_from_templates(A + k1 * (0.5 * dt), phi_grid,
                                     c[:, 1], templates)
        k3 = _ode_rhs_from_templates(A + k2 * (0.5 * dt), phi_grid,
                                     c[:, 1], templates)
        k4 = _ode_rhs_from_templates(A + k3 * dt, phi_grid, c[:, 2],
                                     templates)
        A1 = A + (k1 + k2 * 2.0 + k3 * 2.0 + k4) * (dt / 6.0)
        re = jnp.clip(A1.re, -CLAMP, CLAMP)
        im = jnp.clip(A1.im, -CLAMP, CLAMP)
        dead = dead | jnp.any((jnp.abs(A1.re) >= CLAMP)
                              | (jnp.abs(A1.im) >= CLAMP)
                              | ~jnp.isfinite(A1.re)
                              | ~jnp.isfinite(A1.im), axis=-1)
        re = jnp.where(dead[:, None],
                       jnp.concatenate([jnp.full_like(re[:, :1], DEAD_RE),
                                        jnp.zeros_like(re[:, 1:])], axis=1),
                       re)
        im = jnp.where(dead[:, None], jnp.zeros_like(im), im)
        return (re, im, dead), None

    dead0 = jnp.zeros(n_grid, dtype=bool)
    # no unroll: the axon backend is per-step latency-bound and unroll
    # measures ZERO gain (scripts/bench_scan_floor.py) while multiplying
    # XLA compile time — the round-3 MULTICHIP timeout was one 2m41s CPU
    # compile of this scan's consumer
    (a_re, a_im, _), _ = jax.lax.scan(rk4_step, (a_t0.re, a_t0.im, dead0),
                                      coeffs)
    return Cplx(a_re, a_im)


def compute_logsv_a_mgf_grid(ttm: float,
                             phi_grid: Cplx,
                             sigma0: float,
                             q: float,
                             times: np.ndarray,
                             a0: np.ndarray,
                             a1: np.ndarray,
                             kappa0: np.ndarray,
                             kappa1: np.ndarray,
                             kappa2: np.ndarray,
                             beta: np.ndarray,
                             volvol: np.ndarray,
                             b: Optional[np.ndarray] = None,
                             expansion_order: ExpansionOrder = ExpansionOrder.FIRST,
                             underlying_type: UnderlyingType = UnderlyingType.SWAP,
                             a_t0: Optional[Cplx] = None,
                             engine: str = "f64",
                             **kwargs
                             ) -> Tuple[Cplx, Cplx]:
    """(A(tau) panel, log MGF) for the rates model
    (rate_affine_expansion.py:40-83)."""
    a_t1 = solve_a_ode_grid(phi_grid=phi_grid, ttm=ttm, q=q, times=times,
                            a0=a0, a1=a1, kappa0=kappa0, kappa1=kappa1,
                            kappa2=kappa2, beta=beta, volvol=volvol, b=b,
                            a_t0=a_t0, expansion_order=expansion_order,
                            underlying_type=underlying_type, engine=engine)
    y = sigma0 - q
    if expansion_order == ExpansionOrder.FIRST:
        ys = jnp.array([1.0, y, y * y])
    elif expansion_order == ExpansionOrder.SECOND:
        y2 = y * y
        ys = jnp.array([1.0, y, y2, y2 * y, y2 * y2])
    else:
        raise NotImplementedError
    log_mgf = Cplx(a_t1.re @ ys, a_t1.im @ ys)
    return a_t1, log_mgf


# ----------------------------------------------------------------------------
# batched cube solver: many (expiry, tenor) slices in ONE program
# ----------------------------------------------------------------------------

def solve_a_ode_grid_batch(phi_grid: Cplx,
                           dts: Array,
                           stage_coeffs: Array,
                           q: float,
                           expansion_order: ExpansionOrder = ExpansionOrder.FIRST,
                           ) -> Cplx:
    """vmapped RK4 Riccati solve over a batch of P slices.

    ``dts`` is (P,) — each slice integrates S shared steps of its own dt
    (S * dt_p = expiry_p), ``stage_coeffs`` is (P, S, 7, 3) — the seven
    scalar coefficient series evaluated at each slice's RK4 stage times.
    Shares :func:`_rates_ode_terms` / :func:`_ode_rhs` and the sticky
    divergence-freeze with the single-slice :func:`solve_a_ode_grid`; the
    whole swaption cube prices as one ``vmap(scan)`` program instead of one
    program per (expiry, tenor) — the reference loops scipy solve_ivp per
    slice per grid point (rate_affine_expansion.py:87-164).
    Returns A(expiry) as a Cplx of shape (P, N, n).
    """
    n = get_expansion_n(expansion_order)
    n_grid = phi_grid.shape[0]
    CLAMP = 1.0e3
    DEAD_RE = -1.0e4

    templates = _rates_ode_templates(q, n)

    def solve_one(dt, coeffs):
        def rk4_step(carry, c):
            a_re, a_im, dead = carry
            A = Cplx(a_re, a_im)
            k1 = _ode_rhs_from_templates(A, phi_grid, c[:, 0], templates)
            k2 = _ode_rhs_from_templates(A + k1 * (0.5 * dt), phi_grid,
                                         c[:, 1], templates)
            k3 = _ode_rhs_from_templates(A + k2 * (0.5 * dt), phi_grid,
                                         c[:, 1], templates)
            k4 = _ode_rhs_from_templates(A + k3 * dt, phi_grid, c[:, 2],
                                         templates)
            A1 = A + (k1 + k2 * 2.0 + k3 * 2.0 + k4) * (dt / 6.0)
            re = jnp.clip(A1.re, -CLAMP, CLAMP)
            im = jnp.clip(A1.im, -CLAMP, CLAMP)
            dead = dead | jnp.any((jnp.abs(A1.re) >= CLAMP)
                                  | (jnp.abs(A1.im) >= CLAMP)
                                  | ~jnp.isfinite(A1.re)
                                  | ~jnp.isfinite(A1.im), axis=-1)
            re = jnp.where(dead[:, None],
                           jnp.concatenate([jnp.full_like(re[:, :1], DEAD_RE),
                                            jnp.zeros_like(re[:, 1:])], axis=1),
                           re)
            im = jnp.where(dead[:, None], jnp.zeros_like(im), im)
            return (re, im, dead), None

        init = (jnp.zeros((n_grid, n)), jnp.zeros((n_grid, n)),
                jnp.zeros(n_grid, dtype=bool))
        # unroll dropped: zero measured gain on the latency-bound backend,
        # ~8x compile-surface inflation (see the note on the single-slice
        # solver above)
        (a_re, a_im, _), _ = jax.lax.scan(rk4_step, init, coeffs)
        return a_re, a_im

    a_re, a_im = jax.vmap(solve_one)(jnp.asarray(dts), stage_coeffs)
    return Cplx(a_re, a_im)


# ----------------------------------------------------------------------------
# double-float32 batch solver (f64-class accuracy on the fast f32 scan path)
# ----------------------------------------------------------------------------

def _df_rates_rhs(ar, ai, c, phi_re, phi_im, tmpl, n: int):
    """rhs of one RK4 stage in df32 arithmetic — the double-float32 image of
    :func:`_ode_rhs_from_templates`.

    ``ar``/``ai``: DF panels (N, n); ``c``: tuple of 7 DF stage scalars
    [kappa0, kappa1, kappa2, vartheta2, apb, apa, b]; ``phi_re``/``phi_im``:
    DF (N,); ``tmpl``: the static template tensors as DFs.  Contractions are
    broadcast-muls + tree-sums (no einsum — MXU would downcast to bf16 and
    destroy the error-free transforms; no per-index loops — they blow up
    the scan-body HLO count and XLA compile time, see
    models/logsv/affine._df_tree_sum).
    """
    from stochvolmodels_tpu.models.logsv.affine import _df_tree_sum
    from stochvolmodels_tpu.utils import df32 as dd

    TM, K0, K1, K2, V, P_, h = tmpl
    kappa0, kappa1, kappa2, vartheta2, apb, apa, b = c

    # L0 = kappa0 K0 + kappa1 K1 + kappa2 K2 + vartheta2 V;  L1 = apb P
    L0 = dd.add(dd.add(dd.mul(K0, kappa0), dd.mul(K1, kappa1)),
                dd.add(dd.mul(K2, kappa2), dd.mul(V, vartheta2)))
    L1 = dd.mul(P_, apb)

    # quadratic term: vartheta2 * sum_ij TM[k,i,j] O[i,j] with the complex
    # outer products O_re = ar_i ar_j - ai_i ai_j, O_im = ar_i ai_j
    # (TM is symmetric in its trailing axes)
    arr = dd.DF(ar.hi[:, :, None], ar.lo[:, :, None])
    arc = dd.DF(ar.hi[:, None, :], ar.lo[:, None, :])
    air = dd.DF(ai.hi[:, :, None], ai.lo[:, :, None])
    aic = dd.DF(ai.hi[:, None, :], ai.lo[:, None, :])
    O_re = dd.sub(dd.mul(arr, arc), dd.mul(air, aic))
    O_im = dd.mul(arr, aic)
    TMk = dd.DF(TM.hi[None, :, :, :], TM.lo[None, :, :, :])

    def qcontract(O):
        t = dd.mul(TMk, dd.DF(O.hi[:, None, :, :], O.lo[:, None, :, :]))
        N = t.hi.shape[0]
        t = dd.DF(t.hi.reshape(N, n, n * n), t.lo.reshape(N, n, n * n))
        return _df_tree_sum(t, axis=2)                            # (N, n)

    quad_re = dd.mul(qcontract(O_re), vartheta2)
    quad_im = dd.scale_pow2(dd.mul(qcontract(O_im), vartheta2), 2.0)

    # linear term: A @ L0' + phi * (A @ L1')   (L0, L1 real)
    ar_b = dd.DF(ar.hi[:, None, :], ar.lo[:, None, :])            # (N, 1, n)
    ai_b = dd.DF(ai.hi[:, None, :], ai.lo[:, None, :])
    r0_re = _df_tree_sum(dd.mul(L0, ar_b), axis=2)
    r0_im = _df_tree_sum(dd.mul(L0, ai_b), axis=2)
    b_re = _df_tree_sum(dd.mul(L1, ar_b), axis=2)
    b_im = _df_tree_sum(dd.mul(L1, ai_b), axis=2)
    pr = dd.DF(phi_re.hi[:, None], phi_re.lo[:, None])            # (N, 1)
    pi = dd.DF(phi_im.hi[:, None], phi_im.lo[:, None])
    lin_re = dd.add(r0_re, dd.sub(dd.mul(pr, b_re), dd.mul(pi, b_im)))
    lin_im = dd.add(r0_im, dd.add(dd.mul(pr, b_im), dd.mul(pi, b_re)))

    # forcing: H = h * (phi * (apa phi + 2 b)) per lane
    inner_re = dd.add(dd.mul(phi_re, apa), dd.scale_pow2(b, 2.0))
    inner_im = dd.mul(phi_im, apa)
    hphi_re = dd.sub(dd.mul(phi_re, inner_re), dd.mul(phi_im, inner_im))
    hphi_im = dd.add(dd.mul(phi_re, inner_im), dd.mul(phi_im, inner_re))
    H_re = dd.mul(h, dd.DF(hphi_re.hi[:, None], hphi_re.lo[:, None]))
    H_im = dd.mul(h, dd.DF(hphi_im.hi[:, None], hphi_im.lo[:, None]))

    out_re = dd.add(dd.add(quad_re, lin_re), H_re)
    out_im = dd.add(dd.add(quad_im, lin_im), H_im)
    return out_re, out_im


def solve_a_ode_grid_batch_df32(phi_grid: Cplx,
                                dts: Array,
                                stage_coeffs: Array,
                                q: float,
                                expansion_order: ExpansionOrder = ExpansionOrder.FIRST,
                                ) -> Cplx:
    """:func:`solve_a_ode_grid_batch` in double-float32 arithmetic.

    f64 in, f64 out, ~1e-13-accurate — but the scan body is pure f32, so
    on the axon TPU backend it runs on the fused f32 scan path instead of
    the per-op-latency-bound f64 path that made the warm 12-slice cube
    reprice cost 672 ms at year_steps=48 (~2.8 ms/RK4-step; PARITY.md
    "Swaption-cube latency study" / "Double-float32 exact engine").  The
    RK4 scheme, shared step count, per-slice dt, and sticky
    divergence-freeze semantics match the f64 batch solver exactly; only
    the arithmetic carrier differs.  Differentiable: df32 primitives are
    plain f32 adds/muls whose composite is the exactly-rounded value, so
    AD tangents equal the mathematical derivatives to f32 accuracy (the
    LM cube calibration tolerates that Jacobian noise).
    """
    from stochvolmodels_tpu.utils import df32 as dd

    n = get_expansion_n(expansion_order)
    n_grid = phi_grid.shape[0]
    CLAMP = jnp.float32(1.0e3)
    DEAD_RE = jnp.float32(-1.0e4)

    tmpl = tuple(dd.from_f64(jnp.asarray(t, jnp.float64))
                 for t in _rates_ode_templates(q, n))
    phi_re = dd.from_f64(phi_grid.re)
    phi_im = dd.from_f64(phi_grid.im)

    def mul_add(a, k, dtc):
        """a + k * dtc, componentwise complex DF."""
        return (dd.add(a[0], dd.mul(k[0], dtc)),
                dd.add(a[1], dd.mul(k[1], dtc)))

    def solve_one(dt, c_hi, c_lo):
        dt_half = dd.from_f64(0.5 * dt)
        dt_full = dd.from_f64(dt)
        dt_sixth = dd.from_f64(dt / 6.0)

        def stage_scalars(ch, cl, col):
            return tuple(dd.DF(ch[i, col], cl[i, col]) for i in range(7))

        def rk4_step(carry, cx):
            ch, cl = cx
            (rh, rl, ih, il, dead) = carry
            A = (dd.DF(rh, rl), dd.DF(ih, il))
            c0 = stage_scalars(ch, cl, 0)
            c1 = stage_scalars(ch, cl, 1)
            c2 = stage_scalars(ch, cl, 2)
            k1 = _df_rates_rhs(A[0], A[1], c0, phi_re, phi_im, tmpl, n)
            k2 = _df_rates_rhs(*mul_add(A, k1, dt_half), c1, phi_re, phi_im,
                               tmpl, n)
            k3 = _df_rates_rhs(*mul_add(A, k2, dt_half), c1, phi_re, phi_im,
                               tmpl, n)
            k4 = _df_rates_rhs(*mul_add(A, k3, dt_full), c2, phi_re, phi_im,
                               tmpl, n)
            ksum = (dd.add(dd.add(k1[0], dd.scale_pow2(dd.add(k2[0], k3[0]),
                                                       2.0)), k4[0]),
                    dd.add(dd.add(k1[1], dd.scale_pow2(dd.add(k2[1], k3[1]),
                                                       2.0)), k4[1]))
            A1 = mul_add(A, ksum, dt_sixth)
            bad_elem = (~(jnp.abs(A1[0].hi) < CLAMP)
                        | ~(jnp.abs(A1[1].hi) < CLAMP)
                        | ~jnp.isfinite(A1[0].hi) | ~jnp.isfinite(A1[1].hi))
            dead = dead | jnp.any(bad_elem, axis=-1)
            zero = jnp.zeros_like(rh)
            dead_re = jnp.concatenate(
                [jnp.full_like(rh[:, :1], DEAD_RE),
                 jnp.zeros_like(rh[:, 1:])], axis=1)
            rh1 = jnp.where(dead[:, None], dead_re,
                            jnp.clip(A1[0].hi, -CLAMP, CLAMP))
            rl1 = jnp.where(dead[:, None] | (jnp.abs(A1[0].hi) >= CLAMP),
                            zero, A1[0].lo)
            ih1 = jnp.where(dead[:, None], zero,
                            jnp.clip(A1[1].hi, -CLAMP, CLAMP))
            il1 = jnp.where(dead[:, None] | (jnp.abs(A1[1].hi) >= CLAMP),
                            zero, A1[1].lo)
            return (rh1, rl1, ih1, il1, dead), None

        z32 = jnp.zeros((n_grid, n), jnp.float32)
        init = (z32, z32, z32, z32, jnp.zeros(n_grid, dtype=bool))
        (rh, rl, ih, il, _), _ = jax.lax.scan(rk4_step, init, (c_hi, c_lo))
        return rh, rl, ih, il

    # split the f64 stage coefficients into exact (hi, lo) f32 pairs OUTSIDE
    # the scan so the body stays pure f32
    sc = jnp.asarray(stage_coeffs)
    sc_hi = sc.astype(jnp.float32)
    sc_lo = (sc - sc_hi.astype(jnp.float64)).astype(jnp.float32)
    rh, rl, ih, il = jax.vmap(solve_one)(jnp.asarray(dts), sc_hi, sc_lo)
    from stochvolmodels_tpu.utils.df32 import DF, to_f64
    return Cplx(to_f64(DF(rh, rl)), to_f64(DF(ih, il)))
