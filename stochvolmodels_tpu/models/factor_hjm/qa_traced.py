"""
Traced (on-device) annuity-measure structural panels for the factor-HJM
LogSV model.

The host path (``MultiFactRateLogSvParams.qa_structural_panels``,
rebuilding /root/reference/stochvolmodels/pricers/factor_hjm/
rate_logsv_params.py:390-503) integrates the frozen-drift mean-state ODE
with scipy ``solve_ivp`` and freezes the resulting panels (swap-rate
gradient, annuity log-derivative, factor vols C) into every compiled cube
program as constants.  That makes the factor-vol levels ``A``, the
mean-reversion pair ``(kappa1, kappa2)`` and ``sigma0`` *structural*
constants: a calibration that moves A must re-freeze and re-trace the whole
cube (fast_calibration.prefit_A_to_atm), and A-sensitivities are jvps
through a frozen structure.

This module moves the whole panel pipeline on device:

* everything that depends only on static *geometry* — the swap schedule,
  the integrated bond bases B_P/B~_P evaluated at the (static) RK4 stage
  times, the stub discount-curve ratios, the basis generating matrices,
  the linear Omega operator — is precomputed on host once per
  (expiry, tenor) into a :class:`QAGeometry` stack;
* everything that depends on calibratable parameters — C(A) = B^-1 diag(A)
  chol(R), M = C C', Omega(M), the mean-state ODE for (X, Y, sigma), the
  swap gradient / annuity log-derivative panels, and the Riccati
  coefficient series (term0/1/2, a, beta) — is traced JAX, so
  ``jax.grad``/``jax.jvp`` flow through the *structure*, not around it.

The mean-state ODE (Eq. 37, drift freezing of Theorem 3.1) is a fixed-step
RK4 ``lax.scan`` vmapped over the slice batch, replacing the per-slice
scipy ``solve_ivp`` loop.  The right-hand side only needs the annuity and
its factor gradient, which the static geometry reduces to one
exp-of-matmul per stage.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stochvolmodels_tpu.utils.rate_core import (
    bracket,
    df_fast,
    generate_ttms_grid,
    get_default_swap_term_structure,
)

Array = jnp.ndarray


def omega_linear_operator(basis) -> np.ndarray:
    """static (n_aux, d, d) tensor W with ``calc_Omega(M) == einsum('aij,ij->a', W, M)``.

    ``calc_Omega`` is linear in the covariance M for every basis
    (rate_factor_basis.py:339-355 and the CheyettePEND analogue), so probing
    it with unit matrices once on host yields an exact traced replacement.
    """
    d = basis.nb_factors
    W = np.zeros((basis.nb_aux_factors, d, d))
    for i in range(d):
        for j in range(d):
            E = np.zeros((d, d))
            E[i, j] = 1.0
            W[:, i, j] = basis.calc_Omega(E)
    return W


@dataclass
class QAGeometry:
    """static geometry stack for P (expiry, tenor) swaption slices.

    Shapes: P slices, T grid points per slice (shared ``nb_grid_pts``),
    S = (T-1) * n_sub mean-ODE steps, 3 RK4 stage times per step,
    n_sw_max padded swap schedule dates, d factors, n_aux aux factors.
    Padded schedule dates carry dcf = 0 so they drop out of every sum.
    """
    t_grids: np.ndarray        # (P, T) panel grid times
    dts_mean: np.ndarray       # (P,) mean-ODE step size
    idx_t: np.ndarray          # (P, T) term-structure segment at grid times
    seg_stage: np.ndarray      # (S, 3, P) segment at mean-ODE stage times
    # mean-ODE stage geometry (annuity terms)
    BX_st: np.ndarray          # (S, 3, P, n_sw, d)
    BY_st: np.ndarray          # (S, 3, P, n_sw, n_aux)
    P0r_st: np.ndarray         # (S, 3, P, n_sw)
    dcf: np.ndarray            # (P, n_sw)
    # grid-time geometry (panel assembly: annuity + swap numerator)
    BX_g: np.ndarray           # (P, T, n_sw, d)
    BY_g: np.ndarray           # (P, T, n_sw, n_aux)
    P0r_g: np.ndarray          # (P, T, n_sw)
    BX_first: np.ndarray       # (P, T, d)   bond basis at ts_sw[0]
    BY_first: np.ndarray       # (P, T, n_aux)
    P0r_first: np.ndarray      # (P, T)
    BX_last: np.ndarray        # (P, T, d)   bond basis at ts_sw[-1]
    BY_last: np.ndarray        # (P, T, n_aux)
    P0r_last: np.ndarray       # (P, T)
    # basis statics
    D_X: np.ndarray            # (d, d)
    D_Y: np.ndarray            # (n_aux, n_aux)
    W_omega: np.ndarray        # (n_aux, d, d)
    inv_B: np.ndarray          # (d, d)
    R_chol: np.ndarray         # (d, d)
    n_sub: int


def build_qa_geometry(params,
                      slices: Sequence[Tuple[float, float]],
                      nb_grid_pts: int = 31,
                      n_sub: int = 2) -> QAGeometry:
    """precompute the static geometry stack for ``slices`` (host, once).

    ``params`` supplies the basis, currency and term-structure knots; none
    of its calibratable values enter the output.  ``n_sub`` RK4 substeps
    per panel-grid interval integrate the mean-state ODE (the reference
    solves it with scipy defaults rtol=1e-3; RK4 at n_sub=2 on a 31-point
    grid is ~1e-9 from the tight-tolerance solution, see
    tests/test_qa_traced.py).
    """
    basis, ccy = params.basis, params.ccy
    d = basis.nb_factors
    n_aux = basis.nb_aux_factors
    P = len(slices)
    T = nb_grid_pts
    S = (T - 1) * n_sub
    n_sw_max = max(get_default_swap_term_structure(e, tn).size
                   for e, tn in slices)

    t_grids = np.zeros((P, T))
    dts_mean = np.zeros(P)
    idx_t = np.zeros((P, T), dtype=np.int32)
    seg_stage = np.zeros((S, 3, P), dtype=np.int32)
    BX_st = np.zeros((S, 3, P, n_sw_max, d))
    BY_st = np.zeros((S, 3, P, n_sw_max, n_aux))
    P0r_st = np.ones((S, 3, P, n_sw_max))
    dcf = np.zeros((P, n_sw_max))
    BX_g = np.zeros((P, T, n_sw_max, d))
    BY_g = np.zeros((P, T, n_sw_max, n_aux))
    P0r_g = np.ones((P, T, n_sw_max))
    BX_first = np.zeros((P, T, d))
    BY_first = np.zeros((P, T, n_aux))
    P0r_first = np.ones((P, T))
    BX_last = np.zeros((P, T, d))
    BY_last = np.zeros((P, T, n_aux))
    P0r_last = np.ones((P, T))

    ts_knots = np.asarray(params.ts)

    def _geom(t: float, T_date: float):
        bx, by = basis.bond_coeffs(max(T_date - t, 0.0))
        return bx, by, float(df_fast(T_date, ccy) / df_fast(t, ccy))

    for p, (expiry, tenor) in enumerate(slices):
        expiry = float(expiry)
        ts_sw = get_default_swap_term_structure(expiry, float(tenor))
        n_sw = ts_sw.size
        t_grid = generate_ttms_grid(np.array([expiry]), nb_pts=T)
        assert t_grid.size == T, (t_grid.size, T)
        t_grids[p] = t_grid
        dts_mean[p] = (t_grid[1] - t_grid[0]) / n_sub  # uniform grid
        idx_t[p] = [bracket(ts_knots[1:], float(t), throw_if_not_found=True)
                    for t in t_grid]
        dcf[p, 1:n_sw] = np.diff(ts_sw)

        # stage times of the mean ODE: substep RK4 inside each grid interval
        for s in range(S):
            i_grid, i_sub = divmod(s, n_sub)
            t0 = t_grid[i_grid] + i_sub * dts_mean[p]
            # piecewise-constant coefficients: the whole step lives in the
            # segment of its MIDPOINT (a step start on a knot belongs to the
            # left segment under the host bracket convention but the ODE on
            # (t0, t0+h] uses the right one — the O(h) stage mismatch was a
            # 1e-6 mean-state error before this)
            seg_mid = bracket(ts_knots[1:],
                              min(t0 + 0.5 * dts_mean[p], expiry),
                              throw_if_not_found=True)
            for j, toff in enumerate((0.0, 0.5 * dts_mean[p], dts_mean[p])):
                t = t0 + toff
                seg_stage[s, j, p] = seg_mid
                for i in range(n_sw):
                    bx, by, pr = _geom(t, ts_sw[i])
                    BX_st[s, j, p, i] = bx
                    BY_st[s, j, p, i] = by
                    P0r_st[s, j, p, i] = pr

        for k, t in enumerate(t_grid):
            for i in range(n_sw):
                bx, by, pr = _geom(float(t), ts_sw[i])
                BX_g[p, k, i] = bx
                BY_g[p, k, i] = by
                P0r_g[p, k, i] = pr
            BX_first[p, k], BY_first[p, k] = BX_g[p, k, 0], BY_g[p, k, 0]
            P0r_first[p, k] = P0r_g[p, k, 0]
            BX_last[p, k], BY_last[p, k] = BX_g[p, k, n_sw - 1], BY_g[p, k, n_sw - 1]
            P0r_last[p, k] = P0r_g[p, k, n_sw - 1]

    B = basis.get_matrix_B()
    return QAGeometry(
        t_grids=t_grids, dts_mean=dts_mean, idx_t=idx_t, seg_stage=seg_stage,
        BX_st=BX_st, BY_st=BY_st, P0r_st=P0r_st, dcf=dcf,
        BX_g=BX_g, BY_g=BY_g, P0r_g=P0r_g,
        BX_first=BX_first, BY_first=BY_first, P0r_first=P0r_first,
        BX_last=BX_last, BY_last=BY_last, P0r_last=P0r_last,
        D_X=basis.get_generating_matrix(),
        D_Y=basis.get_aux_generating_matrix(),
        W_omega=omega_linear_operator(basis),
        inv_B=np.linalg.inv(B),
        R_chol=np.linalg.cholesky(params.R),
        n_sub=n_sub)


def factor_vols_traced(geom: QAGeometry, A_xs: Array) -> Array:
    """traced C(t) = B^-1 diag(A) chol(R) per term-structure segment.

    ``A_xs`` is (n_seg, d); returns (n_seg, d, d).  Mirrors
    ``MultiFactRateLogSvParams.calc_factor_vols`` (Eq. 7) with the static
    B^-1 and chol(R) factored out on host.
    """
    inv_B = jnp.asarray(geom.inv_B)
    R_chol = jnp.asarray(geom.R_chol)
    return jnp.einsum('ij,sj,jk->sik', inv_B, A_xs, R_chol)


def _annuity_terms(x: Array, y: Array, BX: Array, BY: Array, P0r: Array,
                   dcf: Array) -> Tuple[Array, Array]:
    """(ann0 (P,), d log(ann)/dx (P, d)) across the slice batch.

    x (P, d), y (P, n_aux); BX (P, n_sw, d), BY (P, n_sw, n_aux),
    P0r/dcf (P, n_sw).  bond_i = P0r_i exp(-BX_i.x - BY_i.y); padded dates
    have dcf = 0.
    """
    expo = -(jnp.einsum('pid,pd->pi', BX, x) + jnp.einsum('pia,pa->pi', BY, y))
    bonds = P0r * jnp.exp(expo)                       # (P, n_sw)
    w = dcf * bonds                                   # (P, n_sw)
    ann0 = jnp.sum(w, axis=1)                         # (P,)
    ann1 = -jnp.einsum('pi,pid->pd', w, BX)           # gradient wrt x
    return ann0, ann1 / ann0[:, None]


def qa_mean_states_traced(geom: QAGeometry,
                          A_xs: Array,
                          kappa1: Array,
                          kappa2: Array,
                          theta: Array,
                          sigma0: Array,
                          beta_xs: Array,
                          x0: Optional[Array] = None,
                          y0: Optional[Array] = None,
                          ) -> Tuple[Array, Array, Array]:
    """traced annuity-measure mean states at the panel grid times.

    RK4 ``lax.scan`` over the (static) stage-time geometry, vmapped across
    the P slices; replaces ``calc_QA_mean_states``'s per-slice scipy
    solve_ivp (rate_logsv_params.py:255-283).  Returns
    (mx (P, T, d), my (P, T, n_aux), msig (P, T)).
    """
    P, T = geom.t_grids.shape
    d = geom.D_X.shape[0]
    n_aux = geom.D_Y.shape[0]
    C_seg = factor_vols_traced(geom, A_xs)                     # (n_seg,d,d)
    M_seg = jnp.einsum('sik,sjk->sij', C_seg, C_seg)
    Om_seg = jnp.einsum('aij,sij->sa', jnp.asarray(geom.W_omega), M_seg)
    D_X = jnp.asarray(geom.D_X)
    D_Y = jnp.asarray(geom.D_Y)
    dts = jnp.asarray(geom.dts_mean)                           # (P,)
    dcf = jnp.asarray(geom.dcf)
    beta_xs = jnp.asarray(beta_xs)

    def rhs(x, y, sig, stage):
        BX, BY, P0r, seg = stage
        loga = _annuity_terms(x, y, BX, BY, P0r, dcf)[1]       # (P, d)
        M_t = M_seg[seg]                                       # (P, d, d)
        Om_t = Om_seg[seg]
        C_t = C_seg[seg]
        beta_t = beta_xs[seg]                                  # (P, d)
        sig2 = sig * sig
        dx = (x @ D_X.T) + sig2[:, None] * jnp.einsum('pij,pj->pi', M_t, loga)
        dy = (y @ D_Y.T) + sig2[:, None] * Om_t
        vol_adj = jnp.einsum('pd,ped,pe->p', beta_t, C_t, loga)
        dsig = (kappa1 + kappa2 * sig) * (theta - sig) + sig2 * vol_adj
        return dx, dy, dsig

    BX_st = jnp.asarray(geom.BX_st)
    BY_st = jnp.asarray(geom.BY_st)
    P0r_st = jnp.asarray(geom.P0r_st)
    seg_st = jnp.asarray(geom.seg_stage)

    def step(carry, inp):
        x, y, sig = carry
        BX, BY, P0r, seg = inp
        s1, s2, s3 = ((BX[0], BY[0], P0r[0], seg[0]),
                      (BX[1], BY[1], P0r[1], seg[1]),
                      (BX[2], BY[2], P0r[2], seg[2]))
        h = dts
        k1 = rhs(x, y, sig, s1)
        k2 = rhs(x + 0.5 * h[:, None] * k1[0], y + 0.5 * h[:, None] * k1[1],
                 sig + 0.5 * h * k1[2], s2)
        k3 = rhs(x + 0.5 * h[:, None] * k2[0], y + 0.5 * h[:, None] * k2[1],
                 sig + 0.5 * h * k2[2], s2)
        k4 = rhs(x + h[:, None] * k3[0], y + h[:, None] * k3[1],
                 sig + h * k3[2], s3)
        x1 = x + (h[:, None] / 6.0) * (k1[0] + 2.0 * (k2[0] + k3[0]) + k4[0])
        y1 = y + (h[:, None] / 6.0) * (k1[1] + 2.0 * (k2[1] + k3[1]) + k4[1])
        sig1 = sig + (h / 6.0) * (k1[2] + 2.0 * (k2[2] + k3[2]) + k4[2])
        return (x1, y1, sig1), (x1, y1, sig1)

    x_init = jnp.zeros((P, d)) if x0 is None else jnp.broadcast_to(x0, (P, d))
    y_init = (jnp.zeros((P, n_aux)) if y0 is None
              else jnp.broadcast_to(y0, (P, n_aux)))
    sig_init = jnp.broadcast_to(jnp.asarray(sigma0), (P,))
    _, traj = jax.lax.scan(step, (x_init, y_init, sig_init),
                           (BX_st, BY_st, P0r_st, seg_st))
    # keep the states at panel grid times: every n_sub-th step, plus t=0
    sel = np.arange(geom.n_sub - 1, (T - 1) * geom.n_sub, geom.n_sub)
    mx = jnp.concatenate([x_init[None], traj[0][sel]], axis=0)   # (T, P, d)
    my = jnp.concatenate([y_init[None], traj[1][sel]], axis=0)
    msig = jnp.concatenate([sig_init[None], traj[2][sel]], axis=0)
    return (jnp.moveaxis(mx, 0, 1), jnp.moveaxis(my, 0, 1),
            jnp.moveaxis(msig, 0, 1))


def qa_panels_traced(geom: QAGeometry,
                     A_xs: Array,
                     kappa1: Array,
                     kappa2: Array,
                     theta: Array,
                     sigma0: Array,
                     beta_xs: Array,
                     volvol_xs: Array,
                     x0: Optional[Array] = None,
                     y0: Optional[Array] = None,
                     ):
    """traced annuity-measure Riccati coefficient panels for the cube.

    Returns ``(a (P,T,d), kappa0 (P,T), kappa1 (P,T), kappa2 (P,T),
    beta (P,T,d), volvol (P,T))`` — the traced equivalents of
    ``MultiFactRateLogSvParams.transform_QA_params`` outputs, with every
    dependency on (A, kappa1, kappa2, theta, sigma0, beta, volvol) kept
    inside the trace (reference frozen-coefficient construction:
    rate_logsv_params.py:390-449).
    """
    mx, my, msig = qa_mean_states_traced(geom, A_xs, kappa1, kappa2, theta,
                                         sigma0, beta_xs, x0=x0, y0=y0)
    P, T = geom.t_grids.shape
    dcf = jnp.asarray(geom.dcf)
    BX_g = jnp.asarray(geom.BX_g)
    BY_g = jnp.asarray(geom.BY_g)
    P0r_g = jnp.asarray(geom.P0r_g)

    def panel_at(k):
        x, y = mx[:, k, :], my[:, k, :]
        ann0, loga = _annuity_terms(x, y, BX_g[:, k], BY_g[:, k],
                                    P0r_g[:, k], dcf)
        # swap-rate gradient by the quotient rule (rate_core.swap_grad)
        def bond_pair(BX, BY, P0r):
            expo = -(jnp.einsum('pd,pd->p', BX, x)
                     + jnp.einsum('pa,pa->p', BY, y))
            b = P0r * jnp.exp(expo)
            return b, -b[:, None] * BX
        bf0, bf1 = bond_pair(jnp.asarray(geom.BX_first[:, k]),
                             jnp.asarray(geom.BY_first[:, k]),
                             jnp.asarray(geom.P0r_first[:, k]))
        bl0, bl1 = bond_pair(jnp.asarray(geom.BX_last[:, k]),
                             jnp.asarray(geom.BY_last[:, k]),
                             jnp.asarray(geom.P0r_last[:, k]))
        numer0, numer1 = bf0 - bl0, bf1 - bl1
        expo = -(jnp.einsum('pid,pd->pi', BX_g[:, k], x)
                 + jnp.einsum('pia,pa->pi', BY_g[:, k], y))
        den1 = -jnp.einsum('pi,pid->pd', dcf * P0r_g[:, k] * jnp.exp(expo),
                           BX_g[:, k])
        swap_gr = (numer1 / ann0[:, None]
                   - (numer0[:, None] * den1) / (ann0 * ann0)[:, None])
        return swap_gr, loga

    panels = [panel_at(k) for k in range(T)]
    swap_gr = jnp.stack([pk[0] for pk in panels], axis=1)      # (P, T, d)
    loga_der = jnp.stack([pk[1] for pk in panels], axis=1)     # (P, T, d)

    C_seg = factor_vols_traced(geom, A_xs)
    idx_t = jnp.asarray(geom.idx_t)                            # (P, T)
    C_panel = C_seg[idx_t]                                     # (P, T, d, d)
    beta_interp = beta_xs[idx_t]                               # (P, T, d)
    volvol_interp = volvol_xs[idx_t]                           # (P, T)
    a_interp = jnp.einsum('ptd,ptde->pte', swap_gr, C_panel)
    CT_loga = jnp.einsum('ptde,ptd->pte', C_panel, loga_der)
    beta2 = jnp.einsum('ptd,ptd->pt', beta_interp, CT_loga)
    kappa0_s = beta2 * theta * theta
    kappa1_s = kappa1 - kappa2 * theta + 2.0 * (kappa2 - beta2) * theta
    kappa2_s = kappa2 - beta2
    return a_interp, kappa0_s, kappa1_s, kappa2_s, beta_interp, volvol_interp
