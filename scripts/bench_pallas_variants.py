"""Pallas LogSV MC kernel variant benchmark (run on the real TPU).

Measures path-steps/sec for kernel variants to locate the bottleneck:

  full-fast    current production kernel (fast_sincos Box-Muller)
  full-sincos  classic Box-Muller (cos+sin)
  no-normals   Box-Muller replaced by a 2-uniform sum (NOT a valid normal;
               isolates the transcendental cost of normal generation)
  no-exp       sigma update without exp (wrong dynamics; isolates exp cost)
  alu-floor    all transcendentals removed (pure ALU/loop floor)

Usage: PYTHONPATH="/root/.axon_site:/root/repo" python scripts/bench_pallas_variants.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import stochvolmodels_tpu  # noqa: F401
from stochvolmodels_tpu.ops.pallas_mc import (  # production helpers — the
    _poly_cospi,  # ablation must measure the SAME polynomials the kernels use
    _poly_log,
    _uniform_from_bits as _uniform,
)

LANES = 128
BLOCK_ROWS = 256
TWO_PI = 6.2831853071795864


def _poly_exp_small(x):
    """exp(x) for |x| <~ 1: degree-6 Taylor-ish, rel err ~1e-5 at |x|=1."""
    return 1.0 + x * (1.0 + x * (0.5 + x * (np.float32(0.16666667) + x * (
        np.float32(0.041666666) + x * (np.float32(0.008333452)
        + x * np.float32(0.0013908))))))


def _normals(shape, variant):
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    u1 = _uniform(b1)
    u2 = _uniform(b2)
    if variant == "no-normals":
        s = np.float32(np.sqrt(6.0))  # var(u1+u2-1)=1/6; NOT normal
        return s * (u1 + u2 - 1.0), s * (u2 - u1)
    if variant in ("poly-bm", "poly-all",
                   # panel-reduction variants MUST ride the same polynomial
                   # ln/cospi path as the production poly-bm baseline —
                   # otherwise the A/B confounds panel count with the
                   # transcendental cost (advisor finding, ADVICE r02)
                   "sigma-carry", "no-qvar", "sigma-carry-noqvar"):
        r = jnp.sqrt(-2.0 * _poly_log(u1))
        c = _poly_cospi(u2)
        sign = jnp.where((b2 & jnp.uint32(1)) == 0, jnp.float32(1.0),
                         jnp.float32(-1.0))
        s = sign * jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))
        return r * c, r * s
    if variant == "poly-bm2":
        # second coordinate by an even cos minimax instead of sqrt(1-c^2)
        r = jnp.sqrt(-2.0 * _poly_log(u1))
        x = (2.0 * u2 - 1.0) * np.float32(np.pi / 2.0)
        x2 = x * x
        sp = x * (1.0 + x2 * (np.float32(-0.16666658) + x2 * (
            np.float32(0.008332824) + x2 * (np.float32(-0.00019810997)
                                            + x2 * np.float32(2.7525562e-06)))))
        cp = 0.99999999 + x2 * (np.float32(-0.49999997) + x2 * (
            np.float32(0.041666418) + x2 * (np.float32(-0.0013888397)
                                            + x2 * np.float32(0.0000247609))))
        sign = jnp.where((b2 & jnp.uint32(1)) == 0, jnp.float32(1.0),
                         jnp.float32(-1.0))
        return r * (-sp), r * (sign * cp)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    if variant == "full-sincos":
        t = TWO_PI * u2
        return r * jnp.cos(t), r * jnp.sin(t)
    c = jnp.cos(np.float32(0.5 * TWO_PI) * u2)
    sign = jnp.where((b2 & jnp.uint32(1)) == 0, jnp.float32(1.0), jnp.float32(-1.0))
    s = sign * jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))
    return r * c, r * s


def _kernel(seed_ref, x0_ref, x_ref, *, nb_steps, dt, variant, unroll=2):
    pltpu.prng_seed(seed_ref[0] + jnp.int32(pl.program_id(0)))
    theta, kappa1, kappa2, beta, volvol = (np.float32(1.04), np.float32(3.18),
                                           np.float32(3.06), np.float32(0.15),
                                           np.float32(1.85))
    vartheta2 = beta * beta + volvol * volvol
    sdt = np.float32(np.sqrt(dt))
    dtf = np.float32(dt)

    def body(i, carry):
        # panel-reduction variants carry fewer state panels:
        #   sigma-carry:        (x, sigma, qvar) — sigma updated
        #                       multiplicatively, no lns panel
        #   no-qvar:            (x, lns, sigma)  — vanilla-only pricing
        #   sigma-carry-noqvar: (x, sigma)       — minimal state
        if variant == "sigma-carry":
            x, sigma, qvar = carry
            lns = None
        elif variant == "no-qvar":
            x, lns, sigma = carry
            qvar = None
        elif variant == "sigma-carry-noqvar":
            x, sigma = carry
            lns = qvar = None
        else:
            x, lns, sigma, qvar = carry
        if variant == "alu-floor":
            b1 = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
            b2 = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
            z0 = _uniform(b1) - 0.5
            z1 = _uniform(b2) - 0.5
        elif variant == "one-prng":
            b = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
            hi = pltpu.bitcast(b >> 16, jnp.int32)          # 0..65535
            lo = pltpu.bitcast(b & jnp.uint32(0xFFFF), jnp.int32)
            u1 = (hi.astype(jnp.float32) + 0.5) * np.float32(2.0 ** -16)
            u2 = (lo.astype(jnp.float32) + 0.5) * np.float32(2.0 ** -16)
            r = jnp.sqrt(-2.0 * jnp.log(u1))
            c = jnp.cos(np.float32(0.5 * TWO_PI) * u2)
            sign = jnp.where((b & jnp.uint32(0x10000)) == 0, jnp.float32(1.0),
                             jnp.float32(-1.0))
            z0 = r * c
            z1 = sign * r * jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))
        elif variant == "no-prng":
            z0 = x * np.float32(1e-6) + 0.01
            z1 = z0 * np.float32(0.5)
        else:
            z0, z1 = _normals(x.shape, variant)
        w0 = z0 * sdt
        w1 = z1 * sdt
        sig2dt = sigma * sigma * dtf
        x = x - 0.5 * sig2dt + sigma * w0
        dln = ((kappa1 * theta * pl.reciprocal(sigma, approx=True) - kappa1)
               + kappa2 * (theta - sigma) - 0.5 * vartheta2) * dtf \
            + beta * w0 + volvol * w1
        if lns is not None:
            lns = lns + dln
        if variant in ("no-exp", "alu-floor", "no-prng"):
            sigma_new = jnp.abs(1.0 + lns)  # wrong dynamics; ALU only
        elif variant in ("poly-exp", "poly-all"):
            sigma_new = sigma * _poly_exp_small(dln)
        elif lns is None:
            sigma_new = sigma * jnp.exp(dln)  # multiplicative, no lns panel
        else:
            sigma_new = jnp.exp(lns)
        if qvar is not None:
            qvar = qvar + 0.5 * (sig2dt + sigma_new * sigma_new * dtf)
        if variant == "sigma-carry":
            return x, sigma_new, qvar
        if variant == "no-qvar":
            return x, lns, sigma_new
        if variant == "sigma-carry-noqvar":
            return x, sigma_new
        return x, lns, sigma_new, qvar

    def bodyn(i, carry):
        for k in range(unroll):
            carry = body(unroll * i + k, carry)
        return carry

    x0 = x0_ref[:]
    lns0 = np.float32(np.log(0.84))  # consistent with sigma0 (a zero seed
    # makes step 1 jump sigma 0.84 -> ~1 and the sanity mean meaningless)
    if variant == "sigma-carry":
        carry = (x0, jnp.full_like(x0, 0.84), jnp.zeros_like(x0))
    elif variant == "no-qvar":
        carry = (x0, jnp.full_like(x0, lns0), jnp.full_like(x0, 0.84))
    elif variant == "sigma-carry-noqvar":
        carry = (x0, jnp.full_like(x0, 0.84))
    else:
        carry = (x0, jnp.full_like(x0, lns0), jnp.full_like(x0, 0.84),
                 jnp.zeros_like(x0))
    carry = jax.lax.fori_loop(0, nb_steps // unroll, bodyn, carry)
    if variant == "sigma-carry":
        x, sigma, qvar = carry
    elif variant == "no-qvar":
        x, _, sigma = carry
        qvar = jnp.zeros_like(x)
    elif variant == "sigma-carry-noqvar":
        x, sigma = carry
        qvar = jnp.zeros_like(x)
    else:
        x, _, sigma, qvar = carry
    x_ref[:] = x + sigma + qvar


@functools.partial(jax.jit, static_argnames=("nb_steps", "variant", "nb_path",
                                             "block_rows", "unroll"))
def _run(seed, nb_steps, variant, nb_path, block_rows=BLOCK_ROWS, unroll=2):
    with jax.enable_x64(False):
        rows = nb_path // LANES
        spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_kernel, nb_steps=nb_steps, dt=1.0 / 360.0,
                              variant=variant, unroll=unroll),
            grid=(pl.cdiv(rows, block_rows),),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=10 * 1024 * 1024),
        )(seed, jnp.zeros((rows, LANES), jnp.float32))


def main():
    assert jax.devices()[0].platform != "cpu", (
        "variant ablation must run on the real TPU (the kernels here use "
        "raw Mosaic lowering, no interpret fallback)")
    nb_path = 1 << 20
    nb_steps = 360
    cfgs = [("poly-bm", 256, 2), ("sigma-carry", 256, 2), ("no-qvar", 256, 2),
            ("sigma-carry-noqvar", 256, 2), ("poly-bm", 256, 2),
            ("sigma-carry", 256, 2), ("sigma-carry-noqvar", 256, 2),
            ("alu-floor", 256, 2)]
    for variant, block_rows, unroll in cfgs:
        def run(seed):
            out = _run(jnp.asarray([seed], dtype=jnp.int32), nb_steps,
                       variant, nb_path, block_rows=block_rows, unroll=unroll)
            return float(jnp.sum(out))
        sanity = run(0) / nb_path   # mean of x+sigma+qvar per path: a
        # distribution-level check so a variant that is fast because it
        # produces garbage cannot silently win the ablation
        best = float("inf")
        for r in range(7):
            t0 = time.perf_counter()
            run(r + 1)
            best = min(best, time.perf_counter() - t0)
        rate = nb_path * nb_steps / best
        print(f"{variant:12s} rows={block_rows:3d} unroll={unroll}  "
              f"{rate:.3e} path-steps/s   best {best*1e3:.1f} ms   "
              f"sanity mean(x+sig+qvar)={sanity:.4f}")


if __name__ == "__main__":
    main()
