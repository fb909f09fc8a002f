"""
Affine expansion of the LogSV moment generating function (Sec. 4 of Sepp &
Rakhmonov 2024).

TPU rebuild of /root/reference/stochvolmodels/pricers/logsv/affine_expansion.py.
The coefficient vector A(tau) per transform point solves the quadratic ODE

    dA^(k)/dtau = A' M^(k) A + (L^(k)(p))' A + H^(k)(p),        (Eq. 4.14)

with n = 3 (first order) or 5 (second order, the production default)
coefficients.  Design deltas from the reference:

* the reference loops 1000 separate ``scipy.solve_ivp`` calls per maturity
  (affine_expansion.py:491-529) — the analytic-path bottleneck.  Here the ODE
  is integrated for the WHOLE grid at once: the state is a (N, n) complex
  panel carried as (re, im) float64 pairs, the RHS is a handful of einsums
  (M is real and phi-independent; L is linear in phi, so L = L0 + phi*L1 with
  real L0, L1), and a fixed-step RK4 under ``lax.scan`` advances all N points
  together — fully differentiable for gradient-based calibration;
* the step count is chosen from the maturity at trace time (static shapes);
  RK4 at ~2x daily steps reproduces a tight-tolerance solve_ivp reference to
  ~1e-10 on the default Phi grid (see tests/test_logsv.py).
"""
from __future__ import annotations

from enum import Enum
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stochvolmodels_tpu.config import VariableType
from stochvolmodels_tpu.utils.cplx import Cplx

Array = jnp.ndarray


class ExpansionOrder(Enum):
    """truncation order of the affine expansion (affine_expansion.py:43-54)."""
    ZERO = 0
    FIRST = 1
    SECOND = 2


def get_expansion_n(expansion_order: ExpansionOrder = ExpansionOrder.FIRST) -> int:
    """number of coefficients A^(k): 3 at first order, 5 at second."""
    return 3 if expansion_order == ExpansionOrder.FIRST else 5


def func_a_ode_quadratic_terms(theta,
                               kappa1,
                               kappa2,
                               beta,
                               volvol,
                               phi=None,
                               psi=None,
                               is_spot_measure: bool = True,
                               expansion_order: ExpansionOrder = ExpansionOrder.SECOND,
                               vol_backbone_eta=1.0
                               ):
    """assemble the phi-independent pieces of M^(k), L^(k)(p), H^(k)(p)
    (affine_expansion.py:67-184).

    Because L is linear in phi and M does not depend on phi at all
    (Remark 4.1), the full grid tensors factor as

        L(phi) = L0 + phi * L1,     H(phi, psi) = h * (phi(phi+p) - 2 psi),

    with real L0, L1 (n, n) and h (n,).  Returns (M, L0, L1, h); all real
    arrays (params may be traced scalars).  With ``phi``/``psi`` given (the
    reference's per-point signature), returns the combined complex
    (M, L, H) instead.
    """
    if phi is not None:
        out = func_a_ode_quadratic_terms(
            theta, kappa1, kappa2, beta, volvol,
            is_spot_measure=is_spot_measure, expansion_order=expansion_order,
            vol_backbone_eta=vol_backbone_eta)
        M, L0, L1, h = map(np.asarray, out)
        phi = complex(phi)
        psi = complex(0.0 if psi is None else psi)
        p = 1.0 if is_spot_measure else -1.0
        return M, L0 + phi * L1, h * (phi * (phi + p) - 2.0 * psi)
    n = get_expansion_n(expansion_order)
    theta2 = theta * theta
    vartheta2 = beta * beta + volvol * volvol
    qv = theta * vartheta2
    qv2 = theta2 * vartheta2
    eta = vol_backbone_eta
    eta2 = eta * eta
    bb = beta * eta  # beta * vol_backbone_eta, the phi-coefficient scale
    if is_spot_measure:
        lamda = 0.0 * theta
        kappa2_p = kappa2
        kappa_p = kappa1 + kappa2 * theta
    else:
        lamda = beta * theta2 * eta
        kappa2_p = kappa2 - beta * eta
        kappa_p = kappa1 + kappa2 * theta - 2.0 * beta * theta * eta

    # build the tensors in the params' dtype: under an x64 trace with f32
    # params (the mixed-precision fast path) a bare jnp.zeros here would be
    # f64 and silently promote the whole RK4 scan body to f64 — on the
    # axon backend f64 scans execute per-op-latency-bound (~6 us/op), which
    # turned the 32 ms warm fast reprice into 575 ms (PARITY.md "Tunnel
    # health and the f64-scan regression")
    dt_p = jnp.result_type(theta, kappa1, kappa2, beta, volvol)
    z = jnp.zeros((), dt_p)
    M = jnp.zeros((n, n, n), dt_p)
    M = M.at[0, 1, 1].set(0.5 * qv2)
    M = M.at[1, 1, 1].set(qv)
    M = M.at[1, 1, 2].set(qv2).at[1, 2, 1].set(qv2)
    M = M.at[2, 1, 1].set(0.5 * vartheta2).at[2, 2, 2].set(2.0 * qv2)
    M = M.at[2, 2, 1].set(2.0 * qv).at[2, 1, 2].set(2.0 * qv)
    if expansion_order == ExpansionOrder.SECOND:
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

    L0 = jnp.zeros((n, n), dt_p)
    L1 = jnp.zeros((n, n), dt_p)
    L0 = L0.at[0, 1].set(lamda).at[0, 2].set(qv2)
    L1 = L1.at[0, 1].set(-theta2 * bb)
    L0 = L0.at[1, 1].set(-kappa_p).at[1, 2].set(2.0 * (lamda + qv))
    L1 = L1.at[1, 1].set(-2.0 * theta * bb).at[1, 2].set(-2.0 * theta2 * bb)
    L0 = L0.at[2, 1].set(-kappa2_p).at[2, 2].set(vartheta2 - 2.0 * kappa_p)
    L1 = L1.at[2, 1].set(-bb).at[2, 2].set(-4.0 * theta * bb)
    if expansion_order == ExpansionOrder.SECOND:
        L0 = L0.at[1, 3].set(3.0 * qv2)
        L0 = L0.at[2, 3].set(6.0 * qv).at[2, 4].set(6.0 * qv2)
        L1 = L1.at[2, 3].set(-3.0 * theta2 * bb)
        L0 = L0.at[3, 2].set(-2.0 * kappa2_p).at[3, 3].set(3.0 * (vartheta2 - kappa_p)).at[3, 4].set(12.0 * qv)
        L1 = L1.at[3, 2].set(-2.0 * bb).at[3, 3].set(-6.0 * theta * bb).at[3, 4].set(-4.0 * theta2 * bb)
        L0 = L0.at[4, 3].set(-3.0 * kappa2_p).at[4, 4].set(2.0 * (vartheta2 - 2.0 * kappa_p))
        L1 = L1.at[4, 3].set(-3.0 * bb).at[4, 4].set(-8.0 * theta * bb)

    h = jnp.zeros(n, dt_p)
    h = h.at[0].set(0.5 * theta2 * eta2).at[1].set(theta * eta2).at[2].set(0.5 * eta2)
    return M, L0, L1, h


def build_grid_ode_terms(M: Array, L0: Array, L1: Array, h: Array,
                         phi_grid: Cplx, psi_grid: Cplx,
                         is_spot_measure: bool) -> Tuple[Cplx, Cplx]:
    """expand (L0, L1, h) against the transform grid: L (N, n, n), H (N, n)."""
    L = Cplx(L0[None, :, :] + phi_grid.re[:, None, None] * L1[None, :, :],
             phi_grid.im[:, None, None] * L1[None, :, :])
    p = 1.0 if is_spot_measure else -1.0
    rhs = phi_grid * (phi_grid + p) - psi_grid * 2.0      # (N,)
    H = Cplx(h[None, :] * rhs.re[:, None], h[None, :] * rhs.im[:, None])
    return L, H


def _ode_rhs(A: Cplx, M: Array, L: Cplx, H: Cplx) -> Cplx:
    """dA/dtau = A' M A + L A + H for the whole (N, n) panel.

    M is real and symmetric in its trailing axes, so for A = a + ib:
    A' M A = a'Ma - b'Mb + 2i a'Mb.
    """
    Ma = jnp.einsum('kij,nj->nki', M, A.re)
    Mb = jnp.einsum('kij,nj->nki', M, A.im)
    quad_re = jnp.einsum('nki,ni->nk', Ma, A.re) - jnp.einsum('nki,ni->nk', Mb, A.im)
    quad_im = 2.0 * jnp.einsum('nki,ni->nk', Ma, A.im)
    lin_re = jnp.einsum('nij,nj->ni', L.re, A.re) - jnp.einsum('nij,nj->ni', L.im, A.im)
    lin_im = jnp.einsum('nij,nj->ni', L.re, A.im) + jnp.einsum('nij,nj->ni', L.im, A.re)
    return Cplx(quad_re + lin_re + H.re, quad_im + lin_im + H.im)


def solve_a_ode_grid(phi_grid: Cplx,
                     psi_grid: Cplx,
                     ttm: float,
                     theta,
                     kappa1,
                     kappa2,
                     beta,
                     volvol,
                     is_spot_measure: bool = True,
                     a_t0: Cplx = None,
                     is_stiff_solver: bool = False,
                     expansion_order: ExpansionOrder = ExpansionOrder.SECOND,
                     vol_backbone_eta=1.0,
                     nb_steps: Optional[int] = None,
                     year_steps: int = 720,
                     unroll: int = 4,
                     warmup_scale: Optional[float] = None
                     ) -> Cplx:
    """advance A over [0, ttm] for the whole grid by fixed-step RK4.

    ``ttm`` must be concrete (static step count); params may be traced.
    Replaces the reference's per-point solve_ivp loop
    (affine_expansion.py:491-529) and its daily-stepped fixed-point scheme
    (:306-384) with one batched integrator.

    ``warmup_scale``: stiffness scale of the initial transient (≈ vartheta2 ·
    max|A(0)|).  Non-zero A(0) (the SIGMA density path seeds A^(1)(0) = -Θ
    with |Θ| up to 600, get_init_conditions_a) decays on a 1/warmup_scale
    timescale that a uniform grid cannot resolve; a ramp from
    0.01/warmup_scale growing as dt = 0.05·t tracks the decaying stiffness
    (the reference leans on scipy's adaptive RK45/BDF for this,
    affine_expansion.py:229-303).  ``is_stiff_solver=True`` (the reference's
    BDF switch) selects a conservative explicit schedule instead: the
    warmup scale is derived from the data when not supplied
    (vartheta² · max(1, |A(0)|)) and the uniform phase runs 4x finer —
    RK4 with graded steps covers the same regimes as BDF here because the
    stiffness is a decaying initial transient, not a persistent fast mode.
    """
    n = get_expansion_n(expansion_order)
    if is_stiff_solver:
        year_steps = 4 * year_steps
        nb_steps = None if nb_steps is None else 4 * nb_steps
        if warmup_scale is None and a_t0 is not None:
            try:  # params/ICs may be traced — then only the 4x refinement applies
                vartheta2 = float(beta) ** 2 + float(volvol) ** 2
                a0_mag = float(jnp.max(jnp.sqrt(a_t0.re ** 2 + a_t0.im ** 2)))
                warmup_scale = vartheta2 * max(1.0, a0_mag)
            except (TypeError, jax.errors.TracerArrayConversionError,
                    jax.errors.ConcretizationTypeError):
                pass
    if a_t0 is None:
        a_t0 = Cplx(jnp.zeros((phi_grid.shape[0], n)),
                    jnp.zeros((phi_grid.shape[0], n)))
    if nb_steps is None:
        nb_steps = max(int(np.ceil(year_steps * float(ttm))), 16)
    dt = float(ttm) / nb_steps

    if warmup_scale is not None and warmup_scale * dt > 0.2:
        # dt ∝ elapsed time tracks the 1/t decay of the Riccati transient's
        # stiffness (|A(t)| ~ 1/(c t) ⇒ stable dt ~ t); 0.05·t keeps a 20x
        # safety margin for the higher-order quadratic couplings
        warmup_dts = []
        d, t_acc = 0.01 / warmup_scale, 0.0
        while d < dt and t_acc + d < 0.5 * float(ttm):
            warmup_dts.append(d)
            t_acc += d
            d = max(d, 0.05 * t_acc)
        rem = float(ttm) - t_acc
        nb_uniform = max(int(np.ceil(rem / dt)), 16)
        dts = np.concatenate([np.asarray(warmup_dts),
                              np.full(nb_uniform, rem / nb_uniform)])
        return _solve_a_ode_grid_dts(dts, theta, kappa1, kappa2, beta, volvol,
                                     phi_grid, psi_grid, a_t0, is_spot_measure,
                                     expansion_order, vol_backbone_eta, unroll)

    M, L0, L1, h = func_a_ode_quadratic_terms(
        theta=theta, kappa1=kappa1, kappa2=kappa2, beta=beta, volvol=volvol,
        is_spot_measure=is_spot_measure, expansion_order=expansion_order,
        vol_backbone_eta=vol_backbone_eta)
    L, H = build_grid_ode_terms(M, L0, L1, h, phi_grid, psi_grid, is_spot_measure)

    # Divergence freeze: large-phi lanes of the Riccati blow up in finite
    # time (the reference lets them go NaN and nansum drops them,
    # mgf_pricer.py nansum semantics).  Letting a lane reach inf/NaN here
    # poisons the scan's VJP — the dropped lane's zero cotangent times a
    # NaN local Jacobian contaminates the shared parameter gradient (acute
    # in float32).  Instead, once |A| passes CAP the lane is frozen
    # (sticky) at re=CAP, im=0: a constant with zero partials that
    # _nansum_re always drops (CAP > its exp cap), so semantics match the
    # reference's once-NaN-always-dropped behavior.
    cap = 1e3 if jnp.result_type(a_t0.re) == jnp.float32 else 1e6

    def rk4_step(carry, _):
        a_re, a_im, dead = carry
        A = Cplx(a_re, a_im)
        k1 = _ode_rhs(A, M, L, H)
        k2 = _ode_rhs(A + k1 * (0.5 * dt), M, L, H)
        k3 = _ode_rhs(A + k2 * (0.5 * dt), M, L, H)
        k4 = _ode_rhs(A + k3 * dt, M, L, H)
        A1 = A + (k1 + k2 * 2.0 + k3 * 2.0 + k4) * (dt / 6.0)
        # ~(x < cap) is also True for NaN
        bad = dead | ~(jnp.abs(A1.re) < cap) | ~(jnp.abs(A1.im) < cap)
        a_re = jnp.where(bad, cap, A1.re)
        a_im = jnp.where(bad, 0.0, A1.im)
        return (a_re, a_im, bad), None

    dead0 = ~(jnp.abs(a_t0.re) < cap) | ~(jnp.abs(a_t0.im) < cap)
    (a_re, a_im, _), _ = jax.lax.scan(
        rk4_step, (jnp.where(dead0, cap, a_t0.re),
                   jnp.where(dead0, 0.0, a_t0.im), dead0),
        None, length=nb_steps, unroll=unroll)
    return Cplx(a_re, a_im)


_DTS_CHUNK = 16384
# df32 lane chunk: the tree-sum quad contraction holds (N, n, n, n) f32
# hi/lo temporaries — 8192 lanes keeps them ~4 MB each, inside VMEM, and
# the 1k/5k-lane vanilla/SIGMA grids run as single programs.  (Chunk size
# does NOT influence the 40k-lane QVAR compile-after-run tunnel hazard —
# measured identically at 4096/8192/unchunked; see PARITY.md "QVAR df32
# and the compile-after-run hazard".)
_DF32_CHUNK = 8192


def _solve_a_ode_grid_dts(dts: np.ndarray, theta, kappa1, kappa2, beta,
                          volvol, phi_grid: Cplx, psi_grid: Cplx, a_t0: Cplx,
                          is_spot_measure: bool,
                          expansion_order: ExpansionOrder,
                          vol_backbone_eta, unroll: int) -> Cplx:
    """RK4 over an explicit (possibly non-uniform) step schedule; same
    divergence-freeze semantics as solve_a_ode_grid.

    Grids beyond ~20k lanes are chunked host-side: a single xs-scan program
    at (40000, 5) f64 reproducibly crashes the TPU worker (observed on v5e
    via the axon tunnel), while <=20k-lane programs run fine.
    """
    n_lanes = phi_grid.re.shape[0]
    if n_lanes > _DTS_CHUNK:
        outs = []
        for lo in range(0, n_lanes, _DTS_CHUNK):
            hi = min(lo + _DTS_CHUNK, n_lanes)
            sl = slice(lo, hi)
            outs.append(_solve_a_ode_grid_dts(
                dts, theta, kappa1, kappa2, beta, volvol,
                Cplx(phi_grid.re[sl], phi_grid.im[sl]),
                Cplx(psi_grid.re[sl], psi_grid.im[sl]),
                Cplx(a_t0.re[sl], a_t0.im[sl]),
                is_spot_measure, expansion_order, vol_backbone_eta, unroll))
        return Cplx(jnp.concatenate([o.re for o in outs]),
                    jnp.concatenate([o.im for o in outs]))
    M, L0, L1, h = func_a_ode_quadratic_terms(
        theta=theta, kappa1=kappa1, kappa2=kappa2, beta=beta, volvol=volvol,
        is_spot_measure=is_spot_measure, expansion_order=expansion_order,
        vol_backbone_eta=vol_backbone_eta)
    L, H = build_grid_ode_terms(M, L0, L1, h, phi_grid, psi_grid, is_spot_measure)
    cap = 1e3 if jnp.result_type(a_t0.re) == jnp.float32 else 1e6

    def rk4_step(carry, dt):
        a_re, a_im, dead = carry
        A = Cplx(a_re, a_im)
        k1 = _ode_rhs(A, M, L, H)
        k2 = _ode_rhs(A + k1 * (0.5 * dt), M, L, H)
        k3 = _ode_rhs(A + k2 * (0.5 * dt), M, L, H)
        k4 = _ode_rhs(A + k3 * dt, M, L, H)
        A1 = A + (k1 + k2 * 2.0 + k3 * 2.0 + k4) * (dt / 6.0)
        bad = dead | ~(jnp.abs(A1.re) < cap) | ~(jnp.abs(A1.im) < cap)
        return (jnp.where(bad, cap, A1.re), jnp.where(bad, 0.0, A1.im), bad), None

    dead0 = ~(jnp.abs(a_t0.re) < cap) | ~(jnp.abs(a_t0.im) < cap)
    (a_re, a_im, _), _ = jax.lax.scan(
        rk4_step, (jnp.where(dead0, cap, a_t0.re),
                   jnp.where(dead0, 0.0, a_t0.im), dead0),
        jnp.asarray(dts), unroll=unroll)
    return Cplx(a_re, a_im)


# ----------------------------------------------------------------------------
# double-float32 RK4 (f64-class accuracy on the fast f32 scan path)
# ----------------------------------------------------------------------------

def _df_tree_sum(a, axis: int):
    """df32 reduction along ``axis`` by sequential halving (zero-padded to a
    power of two) — log2(size) dd.adds of shrinking tensors instead of a
    size-long chain of per-slice ops.  Compile-surface matters: the df32
    scan bodies are the largest programs in the package and XLA's pass
    pipeline is superlinear in body size (an early per-index-loop df32
    trace cost ~850 s of XLA:CPU compile for one 2-maturity chain)."""
    from stochvolmodels_tpu.utils import df32 as dd

    size = a.hi.shape[axis]
    p = 1
    while p < size:
        p *= 2
    if p != size:
        pad = [(0, 0)] * a.hi.ndim
        pad[axis] = (0, p - size)
        a = dd.DF(jnp.pad(a.hi, pad), jnp.pad(a.lo, pad))
    while p > 1:
        p //= 2
        lo = dd.DF(jax.lax.slice_in_dim(a.hi, 0, p, axis=axis),
                   jax.lax.slice_in_dim(a.lo, 0, p, axis=axis))
        hi = dd.DF(jax.lax.slice_in_dim(a.hi, p, 2 * p, axis=axis),
                   jax.lax.slice_in_dim(a.lo, p, 2 * p, axis=axis))
        a = dd.add(lo, hi)
    return dd.DF(jnp.squeeze(a.hi, axis), jnp.squeeze(a.lo, axis))


def _df_rhs(ar, ai, Mdf, Ldf, Hdf, n: int):
    """dA/dtau = A' M A + L A + H in df32 arithmetic.

    ``ar``/``ai`` are DF panels (N, n); ``Mdf`` a real DF (n, n, n),
    symmetric in its trailing axes; ``Ldf``/``Hdf`` complex DF pairs
    ((re, im) of DF) with shapes (N, n, n) / (N, n).  All contractions are
    elementwise df_mul broadcasts + tree-sum reductions — no jnp.dot/einsum
    (MXU would downcast to bf16, destroying the error-free
    transformations), and no per-index Python loops (each dd op is ~15-25
    HLOs, so loop-built contractions blow up the scan body and XLA compile
    time; see :func:`_df_tree_sum`).
    """
    from stochvolmodels_tpu.utils import df32 as dd

    # complex outer products (N, n, n): O_re = ar_i ar_j - ai_i ai_j,
    # O_im = ar_i ai_j (M's trailing-axes symmetry makes the i<->j
    # orientation irrelevant for the 2*sum(M O_im) imaginary part)
    arr = dd.DF(ar.hi[:, :, None], ar.lo[:, :, None])
    arc = dd.DF(ar.hi[:, None, :], ar.lo[:, None, :])
    air = dd.DF(ai.hi[:, :, None], ai.lo[:, :, None])
    aic = dd.DF(ai.hi[:, None, :], ai.lo[:, None, :])
    O_re = dd.sub(dd.mul(arr, arc), dd.mul(air, aic))
    O_im = dd.mul(arr, aic)

    # quad[k] = sum_ij M[k,i,j] O[i,j]: broadcast-mul to (N, n, n, n),
    # flatten (i, j), tree-sum
    Mk = dd.DF(Mdf.hi[None, :, :, :], Mdf.lo[None, :, :, :])

    def qcontract(O):
        t = dd.mul(Mk, dd.DF(O.hi[:, None, :, :], O.lo[:, None, :, :]))
        N = t.hi.shape[0]
        t = dd.DF(t.hi.reshape(N, n, n * n), t.lo.reshape(N, n, n * n))
        return _df_tree_sum(t, axis=2)                            # (N, n)

    quad_re = qcontract(O_re)
    quad_im = dd.scale_pow2(qcontract(O_im), 2.0)

    # lin[i] = sum_j L[i,j] a[j]   (L complex, (N, n, n))
    Lre, Lim = Ldf
    ar_b = dd.DF(ar.hi[:, None, :], ar.lo[:, None, :])            # (N, 1, n)
    ai_b = dd.DF(ai.hi[:, None, :], ai.lo[:, None, :])
    lin_re = _df_tree_sum(dd.sub(dd.mul(Lre, ar_b), dd.mul(Lim, ai_b)),
                          axis=2)
    lin_im = _df_tree_sum(dd.add(dd.mul(Lre, ai_b), dd.mul(Lim, ar_b)),
                          axis=2)

    Hre, Him = Hdf
    out_re = dd.add(dd.add(quad_re, lin_re), Hre)
    out_im = dd.add(dd.add(quad_im, lin_im), Him)
    return out_re, out_im


def solve_a_ode_grid_df32(phi_grid: Cplx,
                          psi_grid: Cplx,
                          ttm: float,
                          theta,
                          kappa1,
                          kappa2,
                          beta,
                          volvol,
                          is_spot_measure: bool = True,
                          a_t0: Cplx = None,
                          expansion_order: ExpansionOrder = ExpansionOrder.SECOND,
                          vol_backbone_eta=1.0,
                          nb_steps: Optional[int] = None,
                          year_steps: int = 720,
                          dts: Optional[np.ndarray] = None,
                          warmup_scale: Optional[float] = None,
                          ) -> Cplx:
    """``solve_a_ode_grid`` in double-float32.

    f64 in, f64 out, ~1e-13-accurate arithmetic — but the scan body is
    pure f32, so on the axon TPU backend it runs on the fused f32 scan
    path instead of the ~6 us/HLO-op f64 path (PARITY.md "Tunnel health
    and the f64-scan regression": the f64 exact reprice is entirely
    scan-latency-bound).  The RK4 scheme, step count and divergence-freeze
    semantics match solve_a_ode_grid exactly; only the arithmetic carrier
    differs (error ~2^-48 per op vs the ~1e-9 discretization floor at the
    240 steps/yr default).

    ``dts``: explicit (possibly non-uniform) step schedule — overrides
    ``nb_steps``/``year_steps``.  ``warmup_scale``: stiffness scale of the
    initial transient; when ``warmup_scale * dt > 0.2`` the same graded
    schedule as :func:`solve_a_ode_grid` is prepended (dt ramping from
    0.01/warmup_scale as 0.05·t), so SIGMA-seeded (A¹(0) = -Θ) and QVAR
    workloads can run on the df32 engine too.

    Grids beyond ~8k lanes are chunked host-side (the 40k-lane Ψ/QVAR
    grid): the quad contraction materializes (N, n, n, n) hi/lo
    temporaries whose footprint must stay within VMEM, and large single
    scan programs have crashed the TPU worker before (the f64 16384-lane
    chunking note on _solve_a_ode_grid_dts).
    """
    from stochvolmodels_tpu.utils import df32 as dd

    n = get_expansion_n(expansion_order)
    if a_t0 is None:
        a_t0 = Cplx(jnp.zeros((phi_grid.shape[0], n)),
                    jnp.zeros((phi_grid.shape[0], n)))

    n_lanes = phi_grid.re.shape[0]
    if n_lanes > _DF32_CHUNK:
        # lanes are independent: zero-pad to a chunk multiple, reshape to
        # (C, chunk, ...) and lax.map the single-chunk solver — ONE
        # compiled scan body executed sequentially per chunk (a Python
        # chunk loop compiles C separate programs: ~170 s apiece on
        # XLA:CPU for this body), with one chunk's VMEM footprint
        c = _DF32_CHUNK
        n_pad = (-n_lanes) % c
        C = (n_lanes + n_pad) // c

        def prep(x):
            x = jnp.pad(x, [(0, n_pad)] + [(0, 0)] * (x.ndim - 1))
            return x.reshape((C, c) + x.shape[1:])

        xs = (prep(phi_grid.re), prep(phi_grid.im),
              prep(psi_grid.re), prep(psi_grid.im),
              prep(a_t0.re), prep(a_t0.im))

        def one_chunk(args):
            pr, pi, sr, si, ar, ai = args
            out = solve_a_ode_grid_df32(
                phi_grid=Cplx(pr, pi), psi_grid=Cplx(sr, si), ttm=ttm,
                theta=theta, kappa1=kappa1, kappa2=kappa2, beta=beta,
                volvol=volvol, is_spot_measure=is_spot_measure,
                a_t0=Cplx(ar, ai), expansion_order=expansion_order,
                vol_backbone_eta=vol_backbone_eta, nb_steps=nb_steps,
                year_steps=year_steps, dts=dts, warmup_scale=warmup_scale)
            return out.re, out.im

        o_re, o_im = jax.lax.map(one_chunk, xs)
        o_re = o_re.reshape(C * c, n)[:n_lanes]
        o_im = o_im.reshape(C * c, n)[:n_lanes]
        return Cplx(o_re, o_im)
    if dts is None:
        if nb_steps is None:
            nb_steps = max(int(np.ceil(year_steps * float(ttm))), 16)
        dt = float(ttm) / nb_steps
        if warmup_scale is not None and warmup_scale * dt > 0.2:
            # same graded ramp as solve_a_ode_grid (dt ∝ elapsed time
            # tracks the 1/t decay of the Riccati transient's stiffness)
            warmup_dts = []
            d, t_acc = 0.01 / warmup_scale, 0.0
            while d < dt and t_acc + d < 0.5 * float(ttm):
                warmup_dts.append(d)
                t_acc += d
                d = max(d, 0.05 * t_acc)
            rem = float(ttm) - t_acc
            nb_uniform = max(int(np.ceil(rem / dt)), 16)
            dts = np.concatenate([np.asarray(warmup_dts),
                                  np.full(nb_uniform, rem / nb_uniform)])

    M, L0, L1, h = func_a_ode_quadratic_terms(
        theta=theta, kappa1=kappa1, kappa2=kappa2, beta=beta, volvol=volvol,
        is_spot_measure=is_spot_measure, expansion_order=expansion_order,
        vol_backbone_eta=vol_backbone_eta)
    L, H = build_grid_ode_terms(M, L0, L1, h, phi_grid, psi_grid,
                                is_spot_measure)
    Mdf = dd.from_f64(jnp.asarray(M, jnp.float64))
    Ldf = (dd.from_f64(L.re), dd.from_f64(L.im))
    Hdf = (dd.from_f64(H.re), dd.from_f64(H.im))

    cap = jnp.float32(1e6)

    def mul_add(a, k, dtc):
        """a + k * dtc, componentwise complex DF."""
        return (dd.add(a[0], dd.mul(k[0], dtc)),
                dd.add(a[1], dd.mul(k[1], dtc)))

    def rk4_step_with(carry, dt_half, dt_full, dt_sixth):
        (rh, rl, ih, il, dead) = carry
        A = (dd.DF(rh, rl), dd.DF(ih, il))
        k1 = _df_rhs(A[0], A[1], Mdf, Ldf, Hdf, n)
        k2 = _df_rhs(*mul_add(A, k1, dt_half), Mdf, Ldf, Hdf, n)
        k3 = _df_rhs(*mul_add(A, k2, dt_half), Mdf, Ldf, Hdf, n)
        k4 = _df_rhs(*mul_add(A, k3, dt_full), Mdf, Ldf, Hdf, n)
        ksum = (dd.add(dd.add(k1[0], dd.scale_pow2(dd.add(k2[0], k3[0]), 2.0)),
                       k4[0]),
                dd.add(dd.add(k1[1], dd.scale_pow2(dd.add(k2[1], k3[1]), 2.0)),
                       k4[1]))
        A1 = mul_add(A, ksum, dt_sixth)
        bad = dead | ~(jnp.abs(A1[0].hi) < cap) | ~(jnp.abs(A1[1].hi) < cap)
        zero = jnp.zeros_like(rh)
        rh1 = jnp.where(bad, cap, A1[0].hi)
        rl1 = jnp.where(bad, zero, A1[0].lo)
        ih1 = jnp.where(bad, zero, A1[1].hi)
        il1 = jnp.where(bad, zero, A1[1].lo)
        return (rh1, rl1, ih1, il1, bad), None

    r0 = dd.from_f64(a_t0.re)
    i0 = dd.from_f64(a_t0.im)
    dead0 = ~(jnp.abs(r0.hi) < cap) | ~(jnp.abs(i0.hi) < cap)
    zero = jnp.zeros_like(r0.hi)
    carry0 = (jnp.where(dead0, cap, r0.hi), jnp.where(dead0, zero, r0.lo),
              jnp.where(dead0, zero, i0.hi), jnp.where(dead0, zero, i0.lo),
              dead0)
    if dts is not None:
        # per-step dt constants split to exact (hi, lo) pairs OUTSIDE the
        # scan; the body stays pure f32 (same physics as the uniform path).
        # The schedule is indexed from a CONSTANT inside the body (carry
        # counter + dynamic_index) instead of scanned xs: axon xs-scan
        # executables have repeatedly proven fragile (the f64 40k-lane
        # xs-scan worker crash, and an xs-scan pdf program whose
        # re-execution failed with INVALID_ARGUMENT after large programs
        # ran in the same process)
        dts64 = np.asarray(dts, dtype=np.float64)
        stacked = np.stack([0.5 * dts64, dts64, dts64 / 6.0])    # (3, S)
        c_hi = jnp.asarray(stacked.astype(np.float32))
        c_lo = jnp.asarray((stacked - stacked.astype(np.float32)
                            .astype(np.float64)).astype(np.float32))

        def step_idx(carry, _):
            state, i = carry
            dt_half = dd.DF(c_hi[0, i], c_lo[0, i])
            dt_full = dd.DF(c_hi[1, i], c_lo[1, i])
            dt_sixth = dd.DF(c_hi[2, i], c_lo[2, i])
            state1, _ = rk4_step_with(state, dt_half, dt_full, dt_sixth)
            return (state1, i + 1), None

        (st, _), _ = jax.lax.scan(step_idx,
                                  (carry0, jnp.int32(0)), None,
                                  length=dts64.shape[0])
        rh, rl, ih, il, _ = st
    else:
        # exact df32 images of the uniform step constants (dt f64 on host)
        dt_half = dd.from_f64(jnp.asarray(0.5 * dt))
        dt_full = dd.from_f64(jnp.asarray(dt))
        dt_sixth = dd.from_f64(jnp.asarray(dt / 6.0))
        (rh, rl, ih, il, _), _ = jax.lax.scan(
            lambda c, _: rk4_step_with(c, dt_half, dt_full, dt_sixth),
            carry0, None, length=nb_steps)
    return Cplx(dd.to_f64(dd.DF(rh, rl)), dd.to_f64(dd.DF(ih, il)))


# ----------------------------------------------------------------------------
# semi-analytic exponential-Euler solver (the reference's "analytic" path)
# ----------------------------------------------------------------------------

def _expm_phi1(Lr: Array, Li: Array, dt: float, n_squarings: int = 10,
               taylor_terms: int = 10) -> Tuple[Array, Array, Array, Array]:
    """batched (expm(L dt), dt*phi1(L dt)) for complex L in (re, im) pairs.

    phi1(z) = (e^z - 1)/z = sum_k z^k/(k+1)!  gives the exact linear-step
    integral  int_0^dt expm(L s) ds = dt*phi1(L dt)  with NO matrix inverse
    and no special-casing of zero eigenvalues (the reference eigendecomposes
    L and zeroes the reciprocal of the null eigenvalue,
    affine_expansion.py:361-366 — not available on TPU: no complex eig, no
    f64 LU).  Scaling-and-squaring with the joint recurrence
    E <- E^2,  P <- (E + I)/2 P  keeps the Taylor argument tiny
    (|L dt|/2^10), so 10 terms reach ~1e-15.
    """
    def cmm(Ar, Ai, Br, Bi):
        re = jnp.einsum('nij,njk->nik', Ar, Br) - jnp.einsum('nij,njk->nik', Ai, Bi)
        im = jnp.einsum('nij,njk->nik', Ar, Bi) + jnp.einsum('nij,njk->nik', Ai, Br)
        return re, im

    scale = dt / (2.0 ** n_squarings)
    Ar, Ai = Lr * scale, Li * scale
    n = Lr.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=Lr.dtype), Lr.shape)
    zero = jnp.zeros_like(Lr)
    Tr, Ti = eye, zero           # running Taylor term A^k / k!
    Er, Ei = eye, zero           # expm accumulator
    Pr, Pi = eye, zero           # phi1 accumulator
    for k in range(1, taylor_terms + 1):
        Tr, Ti = cmm(Tr, Ti, Ar / k, Ai / k)
        Er, Ei = Er + Tr, Ei + Ti
        Pr, Pi = Pr + Tr / (k + 1.0), Pi + Ti / (k + 1.0)
    for _ in range(n_squarings):
        Pr, Pi = cmm(0.5 * (Er + eye), 0.5 * Ei, Pr, Pi)
        Er, Ei = cmm(Er, Ei, Er, Ei)
    return Er, Ei, Pr * dt, Pi * dt


def solve_analytic_ode_grid(phi_grid: Cplx,
                            psi_grid: Cplx,
                            ttm: float,
                            theta,
                            kappa1,
                            kappa2,
                            beta,
                            volvol,
                            is_spot_measure: bool = True,
                            a_t0: Optional[Cplx] = None,
                            expansion_order: ExpansionOrder = ExpansionOrder.SECOND,
                            vol_backbone_eta=1.0,
                            year_days: int = 260,
                            nfp: int = 10) -> Cplx:
    """semi-analytic alternative to :func:`solve_a_ode_grid` — the TPU
    rebuild of the reference's eigendecomposition + fixed-point scheme
    (affine_expansion.py:306-384, Sec. 6.1 cost argument).

    Daily steps (``year_days`` per year): the linear part advances exactly
    through E = expm(L dt) (solve-free scaling-squaring, batched over the
    transform grid), and the quadratic A'M A is resolved by ``nfp``
    fixed-point iterations of the exponential-midpoint update

        A_{t+dt} = E A_t + dt phi1(L dt) (H + quad((A_t + A_fp)/2)).

    This applies the exact integrating factor to BOTH the forcing and the
    quadratic, with the quadratic at the step midpoint (the reference
    applies phi1 only to H and steps the quadratic explicitly with a bare
    dt) — O(dt^3) local error where the reference's is O(dt^2), at
    identical per-step cost.  Divergence-freeze semantics match
    solve_a_ode_grid.
    """
    n = get_expansion_n(expansion_order)
    n_grid = phi_grid.shape[0]
    if a_t0 is None:
        a_t0 = Cplx(jnp.zeros((n_grid, n)), jnp.zeros((n_grid, n)))
    # The fixed point diverges once |phi| dt gets large (observed threshold
    # ~0.15 at the BTC params; the reference's fixed-10-iteration scheme has
    # the same failure mode and simply NaNs there).  Scale the step count
    # with the grid's extent so every lane stays in the contraction region:
    # dt <= 1/(25 max|phi|) keeps the error at the few-1e-5 level.
    try:
        p_max = float(np.max(np.abs(np.asarray(phi_grid.im))) +
                      np.max(np.abs(np.asarray(phi_grid.re))))
    except (TypeError, jax.errors.TracerArrayConversionError):
        p_max = 0.0  # traced grid (unusual): fall back to the daily grid
    nb_steps = max(int(np.ceil(year_days * float(ttm))),
                   int(np.ceil(25.0 * p_max * float(ttm))), 1)
    dt = float(ttm) / nb_steps

    M, L0, L1, h = func_a_ode_quadratic_terms(
        theta=theta, kappa1=kappa1, kappa2=kappa2, beta=beta, volvol=volvol,
        is_spot_measure=is_spot_measure, expansion_order=expansion_order,
        vol_backbone_eta=vol_backbone_eta)
    L, H = build_grid_ode_terms(M, L0, L1, h, phi_grid, psi_grid, is_spot_measure)
    Er, Ei, Pr, Pi = _expm_phi1(L.re, L.im, dt)
    cap = 1e3 if jnp.result_type(a_t0.re) == jnp.float32 else 1e6

    def step(carry, _):
        a_re, a_im, dead = carry
        fr, fi = a_re, a_im
        for _ in range(nfp):
            mr, mi = 0.5 * (a_re + fr), 0.5 * (a_im + fi)
            Ma = jnp.einsum('kij,nj->nki', M, mr)
            Mb = jnp.einsum('kij,nj->nki', M, mi)
            qr = (jnp.einsum('nki,ni->nk', Ma, mr)
                  - jnp.einsum('nki,ni->nk', Mb, mi)) + H.re
            qi = 2.0 * jnp.einsum('nki,ni->nk', Ma, mi) + H.im
            ear = (jnp.einsum('nij,nj->ni', Er, a_re)
                   - jnp.einsum('nij,nj->ni', Ei, a_im))
            eai = (jnp.einsum('nij,nj->ni', Er, a_im)
                   + jnp.einsum('nij,nj->ni', Ei, a_re))
            psr = (jnp.einsum('nij,nj->ni', Pr, qr)
                   - jnp.einsum('nij,nj->ni', Pi, qi))
            psi_ = (jnp.einsum('nij,nj->ni', Pr, qi)
                    + jnp.einsum('nij,nj->ni', Pi, qr))
            fr, fi = ear + psr, eai + psi_
        bad = dead | ~(jnp.abs(fr) < cap).all(-1) | ~(jnp.abs(fi) < cap).all(-1)
        fr = jnp.where(bad[:, None], cap, fr)
        fi = jnp.where(bad[:, None], 0.0, fi)
        return (fr, fi, bad), None

    dead0 = (~(jnp.abs(a_t0.re) < cap) | ~(jnp.abs(a_t0.im) < cap)).any(-1)
    (a_re, a_im, _), _ = jax.lax.scan(
        step, (jnp.where(dead0[:, None], cap, a_t0.re),
               jnp.where(dead0[:, None], 0.0, a_t0.im), dead0),
        None, length=nb_steps)
    return Cplx(a_re, a_im)


# ----------------------------------------------------------------------------
# reference-API compatibility wrappers (single-point entry points)
# ----------------------------------------------------------------------------

def _terms_np(theta, kappa1, kappa2, beta, volvol, phi, psi,
              is_spot_measure=True,
              expansion_order: ExpansionOrder = ExpansionOrder.FIRST,
              vol_backbone_eta: float = 1.0):
    """assembled numpy-complex (M, L, H) at one transform point."""
    M, L0, L1, h = func_a_ode_quadratic_terms(
        theta, kappa1, kappa2, beta, volvol, is_spot_measure=is_spot_measure,
        expansion_order=expansion_order, vol_backbone_eta=vol_backbone_eta)
    M, L0, L1, h = map(np.asarray, (M, L0, L1, h))
    L = L0 + phi * L1
    p = 1.0 if is_spot_measure else -1.0
    H = h * (phi * (phi + p) - 2.0 * psi)
    return M, L, H


def func_rhs(t, A0, M, L, H):
    """RHS of the coefficient ODEs at one point (affine_expansion.py:187-205
    signature: (t, A, M, L, H))."""
    n = A0.shape[0]
    quadratic = np.array([A0.T @ M[k] @ A0 for k in range(n)])
    return quadratic + L @ A0 + H


def func_rhs_jac(t, A0, M, L, H):
    """Jacobian of :func:`func_rhs` (affine_expansion.py:208-225)."""
    n = A0.shape[0]
    quadratic = np.stack([2.0 * M[k] @ A0 for k in range(n)])
    return quadratic + L


class _OdeResultShim:
    """stand-in for scipy OdeResult: ``.y`` (n, n_t), ``.t`` (n_t,), and a
    linear-interpolant ``.sol(t)`` when built from a dense trajectory."""

    def __init__(self, y: np.ndarray, t: Optional[np.ndarray] = None):
        self.y = y
        self.t = np.array([0.0]) if t is None else t

    def sol(self, t):
        t = np.atleast_1d(np.asarray(t, dtype=float))
        out = np.stack([np.interp(t, self.t, self.y[i])
                        for i in range(self.y.shape[0])])
        return out


def solve_ode_for_a(ttm, theta, kappa1, kappa2, beta, volvol, phi, psi,
                    is_spot_measure: bool = True, a_t0=None,
                    expansion_order: ExpansionOrder = ExpansionOrder.FIRST,
                    is_stiff_solver: bool = False, dense_output: bool = False,
                    vol_backbone_eta: float = 1.0, **kwargs) -> _OdeResultShim:
    """single-point solve matching the reference entry point
    (affine_expansion.py:229-303); backed by the batched RK4.

    ``dense_output=True`` returns the trajectory on a uniform time grid
    (``.t`` (n_t,), ``.y`` (n, n_t), linear ``.sol``) by chaining equal
    sub-interval solves; ``is_stiff_solver`` selects the conservative
    graded-step schedule (see solve_a_ode_grid).
    """
    n = get_expansion_n(expansion_order)
    phi_c = Cplx(jnp.array([np.real(phi)]), jnp.array([np.imag(phi)]))
    psi_c = Cplx(jnp.array([np.real(psi)]), jnp.array([np.imag(psi)]))
    if a_t0 is None:
        a0 = Cplx(jnp.zeros((1, n)), jnp.zeros((1, n)))
    else:
        a_t0 = np.asarray(a_t0, dtype=complex)
        a0 = Cplx(jnp.asarray(np.real(a_t0))[None, :], jnp.asarray(np.imag(a_t0))[None, :])

    common = dict(theta=theta, kappa1=kappa1, kappa2=kappa2, beta=beta,
                  volvol=volvol, phi_grid=phi_c, psi_grid=psi_c,
                  is_spot_measure=is_spot_measure,
                  expansion_order=expansion_order,
                  vol_backbone_eta=vol_backbone_eta,
                  is_stiff_solver=is_stiff_solver)

    if dense_output:
        n_seg = max(int(np.ceil(100 * float(ttm))), 16)
        t_grid = np.linspace(0.0, float(ttm), n_seg + 1)
        traj = [np.asarray(a0.re)[0] + 1j * np.asarray(a0.im)[0]]
        a_cur = a0
        dt_seg = float(ttm) / n_seg
        for _ in range(n_seg):
            a_cur = solve_a_ode_grid(ttm=dt_seg, a_t0=a_cur, **common)
            traj.append(np.asarray(a_cur.re)[0] + 1j * np.asarray(a_cur.im)[0])
        return _OdeResultShim(np.stack(traj, axis=1), t_grid)

    a1 = solve_a_ode_grid(ttm=float(ttm), a_t0=a0, **common)
    return _OdeResultShim((np.asarray(a1.re)[0] + 1j * np.asarray(a1.im)[0])[:, None],
                          np.array([float(ttm)]))


def solve_analytic_ode_for_a(ttm, theta, kappa1, kappa2, beta, volvol, phi,
                             psi, is_spot_measure, a_t0=None,
                             expansion_order: ExpansionOrder = ExpansionOrder.FIRST,
                             year_days: int = 260,
                             **kwargs) -> np.ndarray:
    """single-point semi-analytic solve (affine_expansion.py:306-384),
    backed by the batched exponential-Euler scheme
    (:func:`solve_analytic_ode_grid`)."""
    n = get_expansion_n(expansion_order)
    if a_t0 is None:
        a0 = Cplx(jnp.zeros((1, n)), jnp.zeros((1, n)))
    else:
        a_t0 = np.asarray(a_t0, dtype=complex)
        a0 = Cplx(jnp.asarray(np.real(a_t0))[None, :],
                  jnp.asarray(np.imag(a_t0))[None, :])
    a1 = solve_analytic_ode_grid(
        ttm=float(ttm), theta=theta, kappa1=kappa1, kappa2=kappa2, beta=beta,
        volvol=volvol,
        phi_grid=Cplx(jnp.array([np.real(phi)]), jnp.array([np.imag(phi)])),
        psi_grid=Cplx(jnp.array([np.real(psi)]), jnp.array([np.imag(psi)])),
        a_t0=a0, is_spot_measure=is_spot_measure,
        expansion_order=expansion_order, year_days=year_days)
    return np.asarray(a1.re)[0] + 1j * np.asarray(a1.im)[0]


def solve_analytic_ode_for_a0(t_span, theta, kappa1, kappa2, beta, volvol,
                              phi, psi,
                              expansion_order: ExpansionOrder = ExpansionOrder.FIRST
                              ) -> np.ndarray:
    """compat alias (affine_expansion.py:387-453, superseded path)."""
    return solve_analytic_ode_for_a(ttm=t_span[1] - t_span[0], theta=theta,
                                    kappa1=kappa1, kappa2=kappa2, beta=beta,
                                    volvol=volvol, phi=phi, psi=psi,
                                    is_spot_measure=True,
                                    expansion_order=expansion_order)


def solve_analytic_ode_grid_phi(phi_grid, psi_grid, ttm, theta, kappa1,
                                kappa2, beta, volvol,
                                is_spot_measure: bool = True, a_t0=None,
                                expansion_order: ExpansionOrder = ExpansionOrder.FIRST,
                                use_analytic_scheme: bool = True
                                ) -> np.ndarray:
    """grid solve with numpy-complex in/out (affine_expansion.py:456-488),
    backed by the semi-analytic exponential-Euler scheme (set
    ``use_analytic_scheme=False`` for the RK4 path)."""
    phi_grid = np.asarray(phi_grid, dtype=complex)
    psi_grid = np.asarray(psi_grid, dtype=complex)
    n = get_expansion_n(expansion_order)
    if a_t0 is None:
        a0 = get_init_conditions_a(Cplx(jnp.real(jnp.asarray(phi_grid)),
                                        jnp.imag(jnp.asarray(phi_grid))),
                                   Cplx(jnp.real(jnp.asarray(psi_grid)),
                                        jnp.imag(jnp.asarray(psi_grid))),
                                   Cplx(jnp.zeros(1), jnp.zeros(1)), n)
    else:
        a_t0 = np.asarray(a_t0, dtype=complex)
        a0 = Cplx(jnp.asarray(np.real(a_t0)), jnp.asarray(np.imag(a_t0)))
    solver = solve_analytic_ode_grid if use_analytic_scheme else solve_a_ode_grid
    a1 = solver(ttm=float(ttm), theta=theta, kappa1=kappa1,
                kappa2=kappa2, beta=beta, volvol=volvol,
                phi_grid=Cplx(jnp.asarray(np.real(phi_grid)),
                              jnp.asarray(np.imag(phi_grid))),
                psi_grid=Cplx(jnp.asarray(np.real(psi_grid)),
                              jnp.asarray(np.imag(psi_grid))),
                a_t0=a0, is_spot_measure=is_spot_measure,
                expansion_order=expansion_order)
    return np.asarray(a1.re) + 1j * np.asarray(a1.im)


def get_init_conditions_a(phi_grid: Cplx,
                          psi_grid: Cplx,
                          theta_grid: Cplx,
                          n_terms: int,
                          variable_type: VariableType = VariableType.LOG_RETURN
                          ) -> Cplx:
    """A(0) over the grid: zeros, except SIGMA seeds A^(1)(0) = -Theta
    (affine_expansion.py:532-567)."""
    if variable_type == VariableType.LOG_RETURN:
        n_grid = phi_grid.shape[0]
    elif variable_type == VariableType.Q_VAR:
        n_grid = psi_grid.shape[0]
    elif variable_type == VariableType.SIGMA:
        n_grid = theta_grid.shape[0]
    else:
        raise NotImplementedError
    # grid-dtype zeros: a bare f64 A(0) under an x64 trace makes the f32
    # fast path's scan carry f64 and the whole RK4 scan f64-emulated
    re = jnp.zeros((n_grid, n_terms), phi_grid.re.dtype)
    im = jnp.zeros((n_grid, n_terms), phi_grid.re.dtype)
    if variable_type == VariableType.SIGMA:
        re = re.at[:, 1].set(-theta_grid.re)
        im = im.at[:, 1].set(-theta_grid.im)
    return Cplx(re, im)


def compute_logsv_a_mgf_grid(ttm: float,
                             phi_grid: Cplx,
                             psi_grid: Cplx,
                             theta_grid: Cplx,
                             sigma0,
                             theta,
                             kappa1,
                             kappa2,
                             beta,
                             volvol,
                             variable_type: VariableType = VariableType.LOG_RETURN,
                             expansion_order: ExpansionOrder = ExpansionOrder.SECOND,
                             a_t0: Optional[Cplx] = None,
                             is_stiff_solver: bool = False,
                             is_analytic: bool = False,
                             is_spot_measure: bool = True,
                             vol_backbone_eta=1.0,
                             nb_steps: Optional[int] = None,
                             engine: str = "f64",
                             **kwargs
                             ) -> Tuple[Cplx, Cplx]:
    """solve the coefficient ODEs and contract against powers of
    Y = sigma0 - theta (affine_expansion.py:570-685).

    Returns (A(tau) panel (N, n), log MGF (N,)).  ``is_analytic=True``
    selects the semi-analytic exponential-Euler scheme
    (:func:`solve_analytic_ode_grid`, the reference's cheaper daily-stepped
    alternative, affine_expansion.py:306-384); the default is the batched
    RK4 with graded stiff warmup.  ``is_stiff_solver`` selects the
    conservative RK4 schedule (see solve_a_ode_grid).  ``engine='df32'``
    runs the RK4 on the double-float32 carrier (fused f32 scan path on the
    axon TPU backend — PARITY.md "Double-float32 exact engine"); graded
    warmup and lane chunking carry over.
    """
    n_terms = get_expansion_n(expansion_order)
    if a_t0 is None:
        a_t0 = get_init_conditions_a(phi_grid=phi_grid, psi_grid=psi_grid,
                                     theta_grid=theta_grid, n_terms=n_terms,
                                     variable_type=variable_type)
    warmup_scale = None
    if variable_type in (VariableType.SIGMA, VariableType.Q_VAR):
        # SIGMA seeds A^(1)(0) = -Theta (|Theta| up to 600); Q_VAR forces the
        # Riccati with -2psi (|psi| up to 4000).  Both transients are stiff on
        # a ~1/(vartheta2 * max|transform|) timescale that the uniform grid
        # cannot resolve.  Traced params fall back to the uniform grid (the
        # pdf/QVAR pricing paths pass concrete floats).
        grid_span = theta_grid.im if variable_type == VariableType.SIGMA \
            else psi_grid.im
        try:
            span = float(np.max(np.abs(np.asarray(grid_span))) + 1.0)
        except (jax.errors.TracerArrayConversionError,
                jax.errors.ConcretizationTypeError):
            # grid built INSIDE a jit trace (the jitted pdf path): fall
            # back to the reference grid extents — Θ in [0, 600]
            # (mgf_pricer.py:50-58), Ψ in [0, 4000] (:37-47) — so the
            # warmup/step schedules match the eager path exactly for the
            # standard grids
            span = 601.0 if variable_type == VariableType.SIGMA else 4001.0
        try:
            vartheta2 = float(beta) ** 2 + float(volvol) ** 2
            rate = max(vartheta2, float(kappa1) + float(kappa2))
        except (TypeError, jax.errors.TracerArrayConversionError):
            # traced params (jitted QVAR pricing path): conservative static
            # bound — vartheta2 <= 40 covers volvol to ~6.3; extra warmup
            # steps from overshooting cost O(100) RK4 steps only
            rate = 40.0
        warmup_scale = rate * span
        if variable_type == VariableType.Q_VAR and nb_steps is None:
            # the Q_VAR Riccati keeps oscillating at amplitude ~ sqrt(psi)
            # (no 1/t decay), so the uniform step must shrink ~ 1/sqrt(psi):
            # empirically dt = 1/720 is stable to |psi| ~ 1000 — scale from
            # there with a 2x margin
            year_steps_eff = int(720 * max(1.0, 2.0 * np.sqrt(span / 1000.0)))
            nb_steps = max(int(np.ceil(year_steps_eff * float(ttm))), 16)
    if is_analytic and variable_type == VariableType.LOG_RETURN:
        # the fixed-point scheme assumes a mild transient; the SIGMA/Q_VAR
        # seeds need the graded-warmup RK4 regardless of the selector
        a_t1 = solve_analytic_ode_grid(
            ttm=ttm, theta=theta, kappa1=kappa1, kappa2=kappa2,
            beta=beta, volvol=volvol, phi_grid=phi_grid, psi_grid=psi_grid,
            a_t0=a_t0, is_spot_measure=is_spot_measure,
            expansion_order=expansion_order,
            vol_backbone_eta=vol_backbone_eta)
    elif engine == "df32":
        a_t1 = solve_a_ode_grid_df32(
            ttm=ttm, theta=theta, kappa1=kappa1, kappa2=kappa2,
            beta=beta, volvol=volvol, phi_grid=phi_grid, psi_grid=psi_grid,
            a_t0=a_t0, is_spot_measure=is_spot_measure,
            expansion_order=expansion_order,
            vol_backbone_eta=vol_backbone_eta, nb_steps=nb_steps,
            warmup_scale=warmup_scale)
    else:
        a_t1 = solve_a_ode_grid(ttm=ttm, theta=theta, kappa1=kappa1, kappa2=kappa2,
                                beta=beta, volvol=volvol,
                                phi_grid=phi_grid, psi_grid=psi_grid, a_t0=a_t0,
                                is_spot_measure=is_spot_measure,
                                expansion_order=expansion_order,
                                vol_backbone_eta=vol_backbone_eta,
                                nb_steps=nb_steps, warmup_scale=warmup_scale,
                                is_stiff_solver=is_stiff_solver)
    y = sigma0 - theta
    if expansion_order == ExpansionOrder.FIRST:
        ys = jnp.stack([jnp.ones_like(jnp.asarray(y)), y, y * y])
    else:
        y2 = y * y
        ys = jnp.stack([jnp.ones_like(jnp.asarray(y)), y, y2, y2 * y, y2 * y2])
    log_mgf = Cplx(a_t1.re @ ys, a_t1.im @ ys)
    return a_t1, log_mgf
