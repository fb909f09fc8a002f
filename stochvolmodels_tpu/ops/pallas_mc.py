"""
Pallas TPU kernels for the Monte-Carlo path loops.

The reference's hot MC kernel is the numba Euler loop over (steps x paths)
pre-drawn normal blocks (logsv_pricer.py:843-940) — that layout is
memory-infeasible at 1e6 paths x 360+ steps.  Here the whole simulation runs
inside one Pallas kernel per path block: the PRNG generates normals on-chip
(Box-Muller over `pltpu.prng_random_bits` uniforms), the state never leaves
VMEM, and only the terminal (x, sigma, qvar) is written back to HBM.  Path
blocks are independent grid programs seeded by block index — embarrassingly
parallel, and the same layout shards over a device mesh.

Parameters are passed through SMEM so calibration iterations do NOT
recompile; step count and dt are static per maturity (chain maturities are
fixed at trace time).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stochvolmodels_tpu.utils.funcs import set_time_grid

Array = jnp.ndarray

LANES = 128
BLOCK_ROWS = 256          # paths per program = BLOCK_ROWS * LANES = 32768
TWO_PI = 6.2831853071795864


def _uniform_from_bits(bits) -> Array:
    """uint32 -> (0, 1) float32 via the exponent-trick bitcast: set the
    exponent to 127 so the mantissa spans [1, 2), subtract 1."""
    f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return jnp.maximum(f - 1.0, 1.1754944e-38)  # keep log(u) finite


def _hash_u32(x: Array) -> Array:
    """murmur3 finalizer: full-avalanche uint32 mix (counter-based PRNG for
    the interpret path — the Mosaic interpreter stubs the hardware PRNG)."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    return x ^ (x >> 16)


def _counter_bits(shape, seed: Array, salt: Array, stream: int) -> Array:
    """stateless counter-based uint32 panel: hash(path-index ^ hash(seed,
    step, stream)).  Statistically adequate for MC (distinct full-avalanche
    inputs per draw); used only when ``interpret`` is set."""
    row = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    idx = row * jnp.uint32(shape[1]) + lane
    seed = jnp.asarray(seed).astype(jnp.uint32)
    salt = jnp.asarray(salt).astype(jnp.uint32)
    key = _hash_u32(seed * jnp.uint32(0x9E3779B9)
                    + salt * jnp.uint32(0x7FEB352D)
                    + jnp.uint32(stream) * jnp.uint32(0x846CA68B))
    return _hash_u32(idx ^ key)


# near-minimax coefficients for ln(1+f)/f on f in [0,1): least squares on
# Chebyshev nodes; |abs err of ln| < 2e-6 (validated in test_pallas_mc)
_LOG_NODES = 0.5 - 0.5 * np.cos((2 * np.arange(1, 201) - 1) * np.pi / 400)
_LOG_C = np.polyfit(_LOG_NODES, np.log1p(_LOG_NODES) / _LOG_NODES,
                    6).astype(np.float32)


def _poly_log(u: Array) -> Array:
    """ln(u) for f32 u in (0,1): exponent extraction + degree-6 poly for
    ln(1+mantissa).  Runs on the plain vector ALUs — measured ~20% faster
    end-to-end than the special-function-unit ln inside the MC step loop
    (see scripts/bench_pallas_variants.py).  Max abs err ~2e-6."""
    bits = pltpu.bitcast(u, jnp.int32)
    e = (bits >> 23) - 127
    f = pltpu.bitcast((bits & jnp.int32(0x007FFFFF)) | jnp.int32(0x3F800000),
                      jnp.float32) - 1.0
    p = jnp.full_like(f, _LOG_C[0])
    for c in _LOG_C[1:]:
        p = p * f + c
    return e.astype(jnp.float32) * np.float32(0.6931471805599453) + f * p


def _poly_cospi(u: Array) -> Array:
    """cos(pi*u) for u in [0,1) via the odd sin minimax on [-pi/2, pi/2):
    cos(pi u) = -sin(pi(u - 1/2)).  Max abs err ~6e-6."""
    x = (2.0 * u - 1.0) * np.float32(np.pi / 2.0)
    x2 = x * x
    s = x * (1.0 + x2 * (np.float32(-0.16666658) + x2 * (
        np.float32(0.008332824) + x2 * (np.float32(-0.00019810997)
                                        + x2 * np.float32(2.7525562e-06)))))
    return -s


def _box_muller(shape, *, interpret: bool = False, seed: Array = None,
                salt: Array = None, poly_bm: bool = True
                ) -> Tuple[Array, Array]:
    """two independent standard normal panels.

    Hardware path: on-chip PRNG bits (`pltpu.prng_random_bits`, seeded once
    per program).  Interpret path (CI on CPU): the interpreter stubs the
    hardware PRNG to zeros, so a counter-based hash over (seed, step-salt,
    path-index) supplies the bits instead — same kernel structure, real
    randomness.

    ``poly_bm`` (default): Box-Muller with polynomial ln and cos(pi x), plus
    the sign-bit trick for the second coordinate — (cos t, ±sqrt(1-cos²t))
    with an independent sign is exactly uniform on the circle.  The step
    loop is bottlenecked on the VPU special-function unit; moving ln/cos to
    plain FMA polynomials is ~20% faster end-to-end and accurate to ~6e-6
    in the draw (scripts/bench_pallas_variants.py has the variant table).
    ``poly_bm=False`` is the classic SFU ln/cos/sin Box-Muller.
    """
    if interpret:
        b1 = _counter_bits(shape, seed, salt, 0)
        b2 = _counter_bits(shape, seed, salt, 1)
    else:
        b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    u1 = _uniform_from_bits(b1)
    u2 = _uniform_from_bits(b2)
    if poly_bm:
        r = jnp.sqrt(jnp.maximum(-2.0 * _poly_log(u1), 0.0))
        c = _poly_cospi(u2)
        # spare low bit of b2 (the mantissa trick uses bits 9..31) -> ±1
        sign = jnp.where((b2 & jnp.uint32(1)) == 0, jnp.float32(1.0),
                         jnp.float32(-1.0))
        s = sign * jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))
        return r * c, r * s
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    t = TWO_PI * u2
    return r * jnp.cos(t), r * jnp.sin(t)


def _logsv_kernel(seed_ref, params_ref, x0_ref, lns0_ref, qv0_ref,
                  x_ref, sig_ref, qvar_ref, *, nb_steps: int, dt: float,
                  alpha: float, interpret: bool = False,
                  poly_bm: bool = True):
    """full-horizon LogSV Euler loop for one (BLOCK_ROWS, LANES) path block.

    params (SMEM): [theta, kappa1, kappa2, beta, volvol, vol_backbone_eta, adj].
    State stays in registers/VMEM; only terminal values are stored.
    """
    seed = seed_ref[0] + jnp.int32(pl.program_id(0))
    if not interpret:
        pltpu.prng_seed(seed)
    theta = params_ref[0]
    kappa1 = params_ref[1]
    kappa2 = params_ref[2]
    beta = params_ref[3]
    volvol = params_ref[4]
    eta = params_ref[5]
    adj = params_ref[6]
    vartheta2 = beta * beta + volvol * volvol
    eta2 = eta * eta
    sdt = np.float32(np.sqrt(dt))
    dtf = np.float32(dt)
    alpha_f = np.float32(alpha)

    def body(salt, carry):
        x, lns, sigma, qvar = carry
        z0, z1 = _box_muller(x.shape, interpret=interpret, seed=seed,
                             salt=salt, poly_bm=poly_bm)
        w0 = z0 * sdt
        w1 = z1 * sdt
        sig2dt = eta2 * sigma * sigma * dtf
        x = x + alpha_f * 0.5 * sig2dt + eta * sigma * w0
        # approx reciprocal: ~2^-12 relative error on a term already O(dt)
        lns = lns + ((kappa1 * theta * pl.reciprocal(sigma, approx=True) - kappa1)
                     + kappa2 * (theta - sigma) + adj * sigma
                     - 0.5 * vartheta2) * dtf + beta * w0 + volvol * w1
        sigma_new = jnp.exp(lns)
        qvar = qvar + 0.5 * (sig2dt + eta2 * sigma_new * sigma_new * dtf)
        return x, lns, sigma_new, qvar

    def body2(i, carry):
        # manual 2-step unroll (Mosaic supports only unroll=1 or full);
        # salts 2i / 2i+1 keep the interpret-path counter PRNG advancing
        return body(2 * i + 1, body(2 * i, carry))

    lns0 = lns0_ref[:]
    carry = (x0_ref[:], lns0, jnp.exp(lns0), qv0_ref[:])
    x, lns, sigma, qvar = jax.lax.fori_loop(0, nb_steps // 2, body2, carry)
    if nb_steps % 2:
        x, lns, sigma, qvar = body(nb_steps - 1, (x, lns, sigma, qvar))
    x_ref[:] = x
    sig_ref[:] = sigma
    qvar_ref[:] = qvar


@functools.partial(jax.jit,
                   static_argnames=("nb_steps", "dt", "alpha", "nb_path",
                                    "interpret", "poly_bm"))
def _run_logsv_kernel(seed, params, x0, lns0, qv0, nb_steps, dt, alpha,
                      nb_path, interpret=False, poly_bm=True):
    # Mosaic cannot lower i64; trace the kernel in 32-bit mode (the global
    # config enables x64 for the pricing layer)
    with jax.enable_x64(False):
        return _run_logsv_kernel_32(seed, params, x0, lns0, qv0, nb_steps,
                                    dt, alpha, nb_path, interpret, poly_bm)


def _run_logsv_kernel_32(seed, params, x0, lns0, qv0, nb_steps, dt, alpha,
                         nb_path, interpret=False, poly_bm=True):
    rows = nb_path // LANES
    grid = pl.cdiv(rows, BLOCK_ROWS)
    kernel = functools.partial(_logsv_kernel, nb_steps=nb_steps, dt=dt,
                               alpha=alpha, interpret=interpret,
                               poly_bm=poly_bm)
    shape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    state_spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  state_spec, state_spec, state_spec],
        out_specs=(state_spec, state_spec, state_spec),
        out_shape=(shape, shape, shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=10 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=30 * nb_steps * nb_path,
            bytes_accessed=6 * nb_path * 4,
            transcendentals=4 * nb_steps * nb_path),
        # TPU interpret mode: emulates the Mosaic primitives (on-chip PRNG,
        # SMEM) on CPU so the kernels run in CI without a TPU
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, params, x0, lns0, qv0)


def simulate_logsv_terminal_pallas(seed: int,
                                   x0: Array,
                                   sigma0: Array,
                                   qvar0: Array,
                                   ttm: float,
                                   theta: float,
                                   kappa1: float,
                                   kappa2: float,
                                   beta: float,
                                   volvol: float,
                                   vol_backbone_eta: float = 1.0,
                                   is_spot_measure: bool = True,
                                   nb_steps_per_year: int = 360,
                                   interpret: bool = False,
                                   poly_bm: bool = True
                                   ) -> Tuple[Array, Array, Array]:
    """terminal (x, sigma, qvar) by the on-chip-PRNG Pallas kernel (float32).

    Same discretization as models.logsv.pricer.simulate_logsv_terminal; state
    arrays are (nb_path,) with nb_path a multiple of 128 (pad if needed).
    ``interpret=True`` runs the kernel under the Pallas TPU interpreter
    (CPU-executable, used by CI).
    """
    nb_path = x0.shape[0]
    assert nb_path % LANES == 0, f"nb_path must be a multiple of {LANES}"
    nb_steps, dt, _ = set_time_grid(ttm=ttm, nb_steps_per_year=nb_steps_per_year)
    if is_spot_measure:
        alpha, adj = -1.0, 0.0
    else:
        alpha, adj = 1.0, beta * vol_backbone_eta
    params = jnp.asarray([theta, kappa1, kappa2, beta, volvol,
                          vol_backbone_eta, adj], dtype=jnp.float32)
    rows = nb_path // LANES
    to_block = lambda a: jnp.asarray(a, dtype=jnp.float32).reshape(rows, LANES)
    x, sig, qvar = _run_logsv_kernel(
        jnp.asarray([seed], dtype=jnp.int32), params,
        to_block(x0), to_block(jnp.log(jnp.asarray(sigma0))), to_block(qvar0),
        nb_steps=nb_steps, dt=float(dt), alpha=alpha, nb_path=nb_path,
        interpret=interpret, poly_bm=poly_bm)
    return x.reshape(-1), sig.reshape(-1), qvar.reshape(-1)


def _heston_kernel(seed_ref, params_ref, x0_ref, v0_ref, qv0_ref,
                   x_ref, var_ref, qvar_ref, *, nb_steps: int, dt: float,
                   interpret: bool = False):
    """full-truncation Heston Euler loop for one path block.

    params (SMEM): [theta, kappa, rho, volvol]."""
    seed = seed_ref[0] + jnp.int32(pl.program_id(0))
    if not interpret:
        pltpu.prng_seed(seed)
    theta = params_ref[0]
    kappa = params_ref[1]
    rho = params_ref[2]
    volvol = params_ref[3]
    rho_1 = jnp.sqrt(1.0 - rho * rho)
    sdt = np.float32(np.sqrt(dt))
    dtf = np.float32(dt)

    def body(i, carry):
        x, var, qvar = carry
        z0, z1 = _box_muller(x.shape, interpret=interpret, seed=seed, salt=i)
        w0 = z0 * sdt
        w1 = z1 * sdt
        sigma = jnp.sqrt(var)
        var_dt = var * dtf
        x = x - 0.5 * var_dt + sigma * w0
        qvar = qvar + var_dt
        var = var + kappa * (theta - var) * dtf + sigma * volvol * (rho * w0 + rho_1 * w1)
        var = jnp.maximum(var, 1e-4)
        return x, var, qvar

    x, var, qvar = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(nb_steps), body,
        (x0_ref[:], v0_ref[:], qv0_ref[:]))
    x_ref[:] = x
    var_ref[:] = var
    qvar_ref[:] = qvar


@functools.partial(jax.jit,
                   static_argnames=("nb_steps", "dt", "nb_path", "interpret"))
def _run_heston_kernel(seed, params, x0, v0, qv0, nb_steps, dt, nb_path,
                       interpret=False):
    with jax.enable_x64(False):
        return _run_heston_kernel_32(seed, params, x0, v0, qv0, nb_steps, dt,
                                     nb_path, interpret)


def _run_heston_kernel_32(seed, params, x0, v0, qv0, nb_steps, dt, nb_path,
                          interpret=False):
    rows = nb_path // LANES
    grid = pl.cdiv(rows, BLOCK_ROWS)
    kernel = functools.partial(_heston_kernel, nb_steps=nb_steps, dt=dt,
                               interpret=interpret)
    shape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    state_spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  state_spec, state_spec, state_spec],
        out_specs=(state_spec, state_spec, state_spec),
        out_shape=(shape, shape, shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=10 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=25 * nb_steps * nb_path,
            bytes_accessed=6 * nb_path * 4,
            transcendentals=3 * nb_steps * nb_path),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, params, x0, v0, qv0)


def simulate_heston_terminal_pallas(seed: int,
                                    x0: Array,
                                    var0: Array,
                                    qvar0: Array,
                                    ttm: float,
                                    theta: float,
                                    kappa: float,
                                    rho: float,
                                    volvol: float,
                                    nb_steps_per_year: int = 360,
                                    interpret: bool = False
                                    ) -> Tuple[Array, Array, Array]:
    """terminal (x, var, qvar) under Heston by the Pallas kernel (float32)."""
    nb_path = x0.shape[0]
    assert nb_path % LANES == 0, f"nb_path must be a multiple of {LANES}"
    nb_steps, dt, _ = set_time_grid(ttm=ttm, nb_steps_per_year=nb_steps_per_year)
    params = jnp.asarray([theta, kappa, rho, volvol], dtype=jnp.float32)
    rows = nb_path // LANES
    to_block = lambda a: jnp.asarray(a, dtype=jnp.float32).reshape(rows, LANES)
    x, var, qvar = _run_heston_kernel(
        jnp.asarray([seed], dtype=jnp.int32), params,
        to_block(x0), to_block(var0), to_block(qvar0),
        nb_steps=nb_steps, dt=float(dt), nb_path=nb_path, interpret=interpret)
    return x.reshape(-1), var.reshape(-1), qvar.reshape(-1)


# ----------------------------------------------------------------------------
# rough LogSV (Markovian lift, Strang splitting)
# ----------------------------------------------------------------------------

def _rough_kernel(seed_ref, params_ref, x_ref, vw_ref, y_ref, *,
                  nb_steps: int, dt: float, n_nodes: int,
                  interpret: bool = False):
    """full-horizon Strang-splitting loop for the rough LogSV Markovian lift
    (models/rough/simulation.py strang_step, reference
    split_simulation.py:254-329), one (BLOCK_ROWS, LANES) path block.

    params (SMEM): [theta, kappa1, kappa2, rho, volvol, v0_factor,
    nodes[0..n-1], weights[0..n-1]].  The n_nodes factor panels are unrolled
    at trace time (n <= 5 in practice), so the whole lifted state lives in
    VMEM and only terminal (log-spot, weighted vol, integrated var) is
    written back.  Every slice of a chain restarts from t=0 with the same
    seed, so short maturities see a prefix of the long maturity's draws —
    the reference's shared-block contract."""
    seed = seed_ref[0] + jnp.int32(pl.program_id(0))
    if not interpret:
        pltpu.prng_seed(seed)
    theta = params_ref[0]
    kappa1 = params_ref[1]
    kappa2 = params_ref[2]
    rho = params_ref[3]
    volvol = params_ref[4]
    v0f = params_ref[5]
    nodes = [params_ref[6 + i] for i in range(n_nodes)]
    weights = [params_ref[6 + n_nodes + i] for i in range(n_nodes)]
    w_sum = weights[0]
    for w in weights[1:]:
        w_sum = w_sum + w
    hf = np.float32(dt)
    h2 = np.float32(0.5 * dt)
    sqh = np.float32(np.sqrt(dt))
    rho_comp = jnp.sqrt(jnp.maximum(1.0 - rho * rho, 0.0))
    volvol_s = volvol * w_sum
    w_inv = 1.0 / w_sum
    wlam_sum = weights[0] * nodes[0]
    for w, x in zip(weights[1:], nodes[1:]):
        wlam_sum = wlam_sum + w * x

    def wdot(vs):
        acc = weights[0] * vs[0]
        for w, v in zip(weights[1:], vs[1:]):
            acc = acc + w * v
        return acc

    def drift_rhs(vs):
        zw = wdot(vs)
        g = (kappa1 + kappa2 * zw) * (theta - zw)
        return [-x * (v - v0f) + g for x, v in zip(nodes, vs)]

    def drift_rk4(vs, h):
        s1 = drift_rhs(vs)
        s2 = drift_rhs([v + 0.5 * h * s for v, s in zip(vs, s1)])
        s3 = drift_rhs([v + 0.5 * h * s for v, s in zip(vs, s2)])
        s4 = drift_rhs([v + h * s for v, s in zip(vs, s3)])
        return [v + (h / 6.0) * (a + 2.0 * b + 2.0 * c + d)
                for v, a, b, c, d in zip(vs, s1, s2, s3, s4)]

    def body(salt, carry):
        log_s, y = carry[0], carry[1]
        vs = list(carry[2:])
        z0, z1 = _box_muller(log_s.shape, interpret=interpret, seed=seed,
                             salt=salt)
        d_inn = drift_rk4(vs, h2)
        # exact log-normal diffusion on the weighted sum, increment spread
        # equally across factors (simulation.py diffus_sde_exact)
        yw = wdot(d_inn)
        Yh = yw * jnp.exp(-0.5 * volvol_s * volvol_s * hf
                          + volvol_s * (z0 * sqh))
        Q = (Yh - yw) * w_inv
        s_inn = [v + Q for v in d_inn]
        vol_h = drift_rk4(s_inn, h2)

        w_vol_h = wdot(vol_h)
        bad = jnp.isnan(w_vol_h) | (w_vol_h <= 0.0)
        vol_h = [jnp.where(bad, np.float32(1e-6), v) for v in vol_h]

        vw = wdot(vs)
        volw_h = wdot(vol_h)
        sq_vw = vw * vw
        sq_vhw = volw_h * volw_h

        def wlam_dot(vs_):
            acc = weights[0] * nodes[0] * vs_[0]
            for w, x, v in zip(weights[1:], nodes[1:], vs_[1:]):
                acc = acc + w * x * v
            return acc

        w_lam_vol = wlam_dot(vs)
        w_lam_vol_h = wlam_dot(vol_h)
        w_lam_v0 = wlam_sum * v0f   # v0 is the same scalar for every factor

        term1 = (1.0 / volvol) * (
            ((volw_h - vw) / hf + 0.5 * w_lam_vol + 0.5 * w_lam_vol_h
             - w_lam_v0) * w_inv
            - kappa1 * theta + (kappa1 - kappa2 * theta) * (0.5 * vw + 0.5 * volw_h)
            + kappa2 * (0.5 * sq_vw + 0.5 * sq_vhw)) * hf
        term2 = 0.5 * hf * sq_vw + 0.5 * hf * sq_vhw
        log_s = log_s - 0.5 * term2 + rho * term1 \
            + rho_comp * jnp.sqrt(jnp.maximum(term2, 0.0)) * z1
        y = y + 0.5 * hf * (sq_vw + sq_vhw)
        return tuple([log_s, y] + vol_h)

    def body2(i, carry):
        return body(2 * i + 1, body(2 * i, carry))

    shape_like = x_ref[:]
    zero = jnp.zeros_like(shape_like)
    carry = tuple([zero, zero] + [jnp.full_like(zero, 1.0) * v0f
                                  for _ in range(n_nodes)])
    carry = jax.lax.fori_loop(0, nb_steps // 2, body2, carry)
    if nb_steps % 2:
        carry = body(nb_steps - 1, carry)
    x_ref[:] = carry[0]
    y_ref[:] = carry[1]
    vw_acc = weights[0] * carry[2]
    for i in range(1, n_nodes):
        vw_acc = vw_acc + weights[i] * carry[2 + i]
    vw_ref[:] = vw_acc


@functools.partial(jax.jit,
                   static_argnames=("nb_steps", "dt", "n_nodes", "nb_path",
                                    "interpret"))
def _run_rough_kernel(seed, params, nb_steps, dt, n_nodes, nb_path,
                      interpret=False):
    with jax.enable_x64(False):
        return _run_rough_kernel_32(seed, params, nb_steps, dt, n_nodes,
                                    nb_path, interpret)


def _run_rough_kernel_32(seed, params, nb_steps, dt, n_nodes, nb_path,
                         interpret=False):
    rows = nb_path // LANES
    grid = pl.cdiv(rows, BLOCK_ROWS)
    kernel = functools.partial(_rough_kernel, nb_steps=nb_steps, dt=dt,
                               n_nodes=n_nodes, interpret=interpret)
    shape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    state_spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(state_spec, state_spec, state_spec),
        out_shape=(shape, shape, shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=(90 + 30 * n_nodes) * nb_steps * nb_path,
            bytes_accessed=3 * nb_path * 4,
            transcendentals=5 * nb_steps * nb_path),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, params)


def simulate_rough_terminal_pallas(seed: int,
                                   nb_path: int,
                                   ttm: float,
                                   sigma0: float,
                                   theta: float,
                                   kappa1: float,
                                   kappa2: float,
                                   rho: float,
                                   volvol: float,
                                   nodes,
                                   weights,
                                   nb_steps_per_year: int = 360,
                                   interpret: bool = False
                                   ) -> Tuple[Array, Array, Array]:
    """terminal (log-spot, weighted vol, integrated var) for the rough LogSV
    lift by the on-chip-PRNG Pallas kernel (float32).

    Drop-in MC engine for rough_logsv_mc_chain_pricer's per-slice
    simulation: restarting every slice from t=0 with the same seed
    reproduces the shared-stream truncation contract."""
    assert nb_path % LANES == 0, f"nb_path must be a multiple of {LANES}"
    nodes = np.asarray(nodes, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64)
    n = len(nodes)
    nb_steps, dt, _ = set_time_grid(ttm=ttm, nb_steps_per_year=nb_steps_per_year)
    v0f = float(sigma0) / float(np.sum(weights))
    params = jnp.asarray([theta, kappa1, kappa2, rho, volvol, v0f,
                          *nodes.tolist(), *weights.tolist()],
                         dtype=jnp.float32)
    x, vw, y = _run_rough_kernel(
        jnp.asarray([seed], dtype=jnp.int32), params,
        nb_steps=nb_steps, dt=float(dt), n_nodes=n, nb_path=nb_path,
        interpret=interpret)
    return x.reshape(-1), vw.reshape(-1), y.reshape(-1)


# ----------------------------------------------------------------------------
# Hawkes jump-diffusion (intensity thinning)
# ----------------------------------------------------------------------------

def _random_u32(shape, *, interpret: bool, seed, salt, stream: int):
    if interpret:
        return _counter_bits(shape, seed, salt, stream)
    return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)


def _hawkes_kernel(seed_ref, params_ref, x0_ref, lp0_ref, lm0_ref,
                   x_ref, lp_ref, lm_ref, *,
                   nb_steps: int, dt: float, interpret: bool = False):
    """Euler + intensity-thinning loop for the two-sided Hawkes JD model
    (models/hawkes_jd.py simulate_hawkesjd_terminal, reference
    hawkes_jd_pricer.py:718-779), one (BLOCK_ROWS, LANES) path block.

    A jump fires when lambda > -ln(U)/dt; jump sizes are shifted
    exponentials.  All draws come from the on-chip PRNG; the exponentials
    use the same ALU-polynomial ln as the Box-Muller normals, so the whole
    step is special-function-unit free except two sqrt.

    params (SMEM): [mu, sigma, shift_p, mean_p, shift_m, mean_m,
    theta_p, kappa_p, beta1_p, beta2_p, theta_m, kappa_m, beta1_m, beta2_m,
    compensator_p_dt, compensator_m_dt] (compensators precomputed outside —
    they need scalar exp, cheaper in the surrounding XLA program)."""
    seed = seed_ref[0] + jnp.int32(pl.program_id(0))
    if not interpret:
        pltpu.prng_seed(seed)
    (mu, sigma, shift_p, mean_p, shift_m, mean_m, theta_p, kappa_p,
     beta1_p, beta2_p, theta_m, kappa_m, beta1_m, beta2_m,
     comp_p_dt, comp_m_dt) = [params_ref[i] for i in range(16)]
    sdt = np.float32(np.sqrt(dt))
    dtf = np.float32(dt)
    inv_dt = np.float32(1.0 / dt)
    drift_dt = (mu - 0.5 * sigma * sigma) * dtf

    def body(salt, carry):
        x, lam_p, lam_m = carry
        shape = x.shape
        # one standard normal: radius x cos, the sin coordinate is unused
        u1 = _uniform_from_bits(_random_u32(shape, interpret=interpret,
                                            seed=seed, salt=salt, stream=0))
        u2 = _uniform_from_bits(_random_u32(shape, interpret=interpret,
                                            seed=seed, salt=salt, stream=1))
        z = jnp.sqrt(jnp.maximum(-2.0 * _poly_log(u1), 0.0)) * _poly_cospi(u2)
        e_up = -_poly_log(_uniform_from_bits(_random_u32(
            shape, interpret=interpret, seed=seed, salt=salt, stream=2)))
        e_um = -_poly_log(_uniform_from_bits(_random_u32(
            shape, interpret=interpret, seed=seed, salt=salt, stream=3)))
        e_jp = -_poly_log(_uniform_from_bits(_random_u32(
            shape, interpret=interpret, seed=seed, salt=salt, stream=4)))
        e_jm = -_poly_log(_uniform_from_bits(_random_u32(
            shape, interpret=interpret, seed=seed, salt=salt, stream=5)))

        j_p = shift_p + e_jp * mean_p
        j_m = shift_m - e_jm * (-mean_m)
        diffusion = drift_dt - comp_p_dt * lam_p - comp_m_dt * lam_m \
            + sigma * (z * sdt)
        jump_p = jnp.where(lam_p > e_up * inv_dt, j_p, 0.0)
        jump_m = jnp.where(lam_m > e_um * inv_dt, j_m, 0.0)
        x = x + diffusion + jump_p + jump_m
        load_p = beta1_p * jump_p + beta2_p * jump_m
        load_m = beta1_m * jump_p + beta2_m * jump_m
        lam_p = lam_p + kappa_p * (theta_p - lam_p) * dtf + load_p
        lam_m = lam_m + kappa_m * (theta_m - lam_m) * dtf + load_m
        return x, lam_p, lam_m

    def body2(i, carry):
        return body(2 * i + 1, body(2 * i, carry))

    carry = (x0_ref[:], lp0_ref[:], lm0_ref[:])
    carry = jax.lax.fori_loop(0, nb_steps // 2, body2, carry)
    if nb_steps % 2:
        carry = body(nb_steps - 1, carry)
    x_ref[:] = carry[0]
    lp_ref[:] = carry[1]
    lm_ref[:] = carry[2]


@functools.partial(jax.jit,
                   static_argnames=("nb_steps", "dt", "nb_path", "interpret"))
def _run_hawkes_kernel(seed, params, x0, lp0, lm0, nb_steps, dt, nb_path,
                       interpret=False):
    with jax.enable_x64(False):
        rows = nb_path // LANES
        grid = pl.cdiv(rows, BLOCK_ROWS)
        kernel = functools.partial(_hawkes_kernel, nb_steps=nb_steps, dt=dt,
                                   interpret=interpret)
        shape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
        state_spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      state_spec, state_spec, state_spec],
            out_specs=(state_spec, state_spec, state_spec),
            out_shape=(shape, shape, shape),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=10 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=90 * nb_steps * nb_path,
                bytes_accessed=6 * nb_path * 4,
                transcendentals=2 * nb_steps * nb_path),
            interpret=pltpu.InterpretParams() if interpret else False,
        )(seed, params, x0, lp0, lm0)


def simulate_hawkesjd_terminal_pallas(seed: int,
                                      ttm: float,
                                      x0: Array,
                                      lambda_p0: Array,
                                      lambda_m0: Array,
                                      mu: float,
                                      sigma: float,
                                      shift_p: float,
                                      mean_p: float,
                                      shift_m: float,
                                      mean_m: float,
                                      theta_p: float,
                                      kappa_p: float,
                                      beta1_p: float,
                                      beta2_p: float,
                                      theta_m: float,
                                      kappa_m: float,
                                      beta1_m: float,
                                      beta2_m: float,
                                      nb_steps_per_year: int = 1800,
                                      interpret: bool = False
                                      ) -> Tuple[Array, Array, Array]:
    """terminal (x, lambda_p, lambda_m) under the Hawkes JD model by the
    on-chip-PRNG Pallas kernel (float32); same thinning scheme as
    models/hawkes_jd.py simulate_hawkesjd_terminal."""
    nb_path = x0.shape[0]
    assert nb_path % LANES == 0, f"nb_path must be a multiple of {LANES}"
    nb_steps, dt, _ = set_time_grid(ttm=ttm, nb_steps_per_year=nb_steps_per_year)
    comp_p_dt = float(dt) * (np.exp(shift_p) / (1.0 - mean_p) - 1.0)
    comp_m_dt = float(dt) * (np.exp(shift_m) / (1.0 - mean_m) - 1.0)
    params = jnp.asarray([mu, sigma, shift_p, mean_p, shift_m, mean_m,
                          theta_p, kappa_p, beta1_p, beta2_p,
                          theta_m, kappa_m, beta1_m, beta2_m,
                          comp_p_dt, comp_m_dt], dtype=jnp.float32)
    rows = nb_path // LANES
    to_block = lambda a: jnp.asarray(a, dtype=jnp.float32).reshape(rows, LANES)
    x, lp, lm = _run_hawkes_kernel(
        jnp.asarray([seed], dtype=jnp.int32), params,
        to_block(x0), to_block(lambda_p0), to_block(lambda_m0),
        nb_steps=nb_steps, dt=float(dt), nb_path=nb_path, interpret=interpret)
    return x.reshape(-1), lp.reshape(-1), lm.reshape(-1)


def pallas_engine_setup(seed, nb_path: int,
                        default_seed: int = 24) -> Tuple[int, int, bool]:
    """shared preamble for the engine='pallas' chain pricers.

    Returns (padded path count, integer base seed, interpret?).  Seeds must
    be Python/numpy integers (or None -> the reference default 24): threefry
    keys parameterize the scan engine only, and silently coercing them
    would make different keys produce identical streams."""
    if seed is None:
        base_seed = default_seed
    elif isinstance(seed, (int, np.integer)):
        base_seed = int(seed)
    elif isinstance(seed, float) and float(seed).is_integer():
        base_seed = int(seed)
    else:
        raise TypeError(
            f"engine='pallas' needs an integer seed (got {type(seed).__name__}); "
            "jax PRNG keys drive the scan engine only")
    nb_pad = ((nb_path + LANES - 1) // LANES) * LANES
    interpret = jax.devices()[0].platform == "cpu"
    return nb_pad, base_seed, interpret
