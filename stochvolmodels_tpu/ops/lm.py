"""
On-device Levenberg-Marquardt for small calibration problems.

The reference calibrates every model by host-side SLSQP with one
host<->device roundtrip per objective evaluation (e.g.
/root/reference/stochvolmodels/pricers/logsv_pricer.py:205-453,
heston_pricer.py:109-166).  On TPU the tunnel latency of those roundtrips
dominates; here the entire damped Gauss-Newton loop is staged into the
caller's jit: ``lax.fori_loop`` over (residuals, jacfwd Jacobian, tiny-CG
normal solve, box projection).  Parameter vectors are tiny (<=8), so the
normal system is solved by conjugate gradients in pure XLA ops —
``jnp.linalg.solve``'s LU custom call is disproportionately slow on TPU
inside a loop.

Constraints: box bounds by projection; inequality constraints should be
appended to the residual vector as one-sided penalty terms by the caller.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def cg_solve(A: Array, b: Array, iters: int = 8) -> Array:
    """conjugate-gradient solve of a tiny SPD system (exact in dim steps)."""
    x = jnp.zeros_like(b)
    r = b
    p = r
    rs = r @ r

    def body(_, st):
        x, r, p, rs = st
        Ap = A @ p
        alpha = rs / jnp.maximum(p @ Ap, 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = r @ r
        beta = rs_new / jnp.maximum(rs, 1e-30)
        p = r + beta * p
        return x, r, p, rs_new

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rs))
    return x


def lm_minimize(residuals_fn: Callable[[Array], Array],
                p0: Array,
                lower: Array,
                upper: Array,
                nb_iters: int = 16,
                lam0: float = 1e-2,
                ) -> Tuple[Array, Array]:
    """minimize ||residuals_fn(p)||^2 over the box [lower, upper].

    Returns (best_params, best_cost).  Trace-time only — call inside jit.
    The residual Jacobian comes from one batched ``jacfwd`` pass (a handful
    of tangent columns), so an iteration costs ~3 forward-pass latencies;
    any custom operations inside ``residuals_fn`` must support forward-mode
    AD (use ``jax.custom_jvp``, not ``custom_vjp``).
    """
    n = p0.shape[0]
    eye = jnp.eye(n, dtype=p0.dtype)

    def body(_, state):
        pars, lam, best_pars, best_cost = state
        r = residuals_fn(pars)
        J = jax.jacfwd(residuals_fn)(pars)
        cost = jnp.sum(r * r)
        g = J.T @ r
        JTJ = J.T @ J
        # scale-invariant damping (Marquardt): lambda * diag(JTJ)
        D = jnp.diag(jnp.maximum(jnp.diagonal(JTJ), 1e-10))
        step = cg_solve(JTJ + lam * D + 1e-12 * eye, -g, iters=n + 3)
        cand = jnp.clip(pars + step, lower, upper)
        new_cost = jnp.sum(jnp.square(residuals_fn(cand)))
        accept = new_cost < cost
        pars = jnp.where(accept, cand, pars)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-8),
                        jnp.minimum(lam * 4.0, 1e6))
        better = new_cost < best_cost
        best_pars = jnp.where(better, cand, best_pars)
        best_cost = jnp.where(better, new_cost, best_cost)
        return pars, lam, best_pars, best_cost

    init = (p0, jnp.asarray(lam0, dtype=p0.dtype), p0,
            jnp.sum(jnp.square(residuals_fn(p0))))
    _, _, best_pars, best_cost = jax.lax.fori_loop(0, nb_iters, body, init)
    return best_pars, best_cost
