"""Pallas TPU kernel: the ENTIRE implicit CRBE solve in one fused kernel.

The scan-based stencil path (models/crbe.run_time_loop) is HBM-bandwidth
bound: every BiCGStab vector op round-trips ~0.8 MB through HBM, ~25 MB per
time step. This kernel keeps *all* solver state resident in VMEM — the 15
stencil coefficient canvases (~4 MB at 256^2), the solution, and six Krylov
work vectors — and runs the full time loop (``fori_loop`` over steps, fixed
BiCGStab iterations per step) with HBM traffic only at kernel entry/exit.

Layout: the three edge families H (n x c), V (c x n), D (c x c) are
embedded into common (n, n) zero-padded canvases. Every stencil neighbor
access is then a pure ``pltpu.roll`` of a canvas — no pads, slices or
concats inside the kernel (Mosaic rejects pad-of-slice layouts), and
roll wrap-around is harmless because every coefficient canvas is zero
wherever the neighbor is invalid.

Scope (checked by the caller): backward Euler, zero source term (both
built-in problems), final-state-only output. Under these conditions the
fused solve is the same algorithm as the general path with a fixed
iteration count:

- Dirichlet rows are identity rows with zero RHS, so once the warm start
  is boundary-masked (one elementwise multiply per step) every Krylov
  vector stays zero there; the RHS is formed from the UNMASKED state so
  the first step sees u0's boundary columns.
- The RHS is ``b = M u_prev`` (crbe.py:383-384), plus the row-masked
  ``-(dt/2) ka u_prev`` term for Crank-Nicolson (crbe.py:385-386), where
  ``ka = K + A (+ r M)`` is the assembled spatial operator including any
  first-order reaction term (folded in at crbe.assemble, so the fused
  kernels inherit it through the system canvases with no changes here);
  the source term is zero by scope. Crank-Nicolson costs NO extra VMEM:
  with ``P = diag(interior)``, ``B = I - P`` and the (diagonal) CR mass
  ``M``, the masked system is ``S = P (M + (dt/2) ka) + B``, hence
  ``-P (dt/2) ka = M_masked + B - S`` and the CN RHS is
  ``b = 2 M_masked u + B u - S u`` — one extra *system* matvec instead of
  15 extra coefficient canvases, so CN fits the same mesh sizes as BE.
- BiCGStab runs a *static* number of iterations (default 5; the adaptive
  solver needs <= 4 at 256^2 with warm starts), right-preconditioned by
  the Jacobi inverse diagonal, with the same breakdown guards as
  ops/linalg.bicgstab.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from airpollution_tpu.ops.stencil import StencilPattern

_EPS = 1e-30


def to_canvases(pattern: StencilPattern, x_fam):
    """Family-layout flat vector -> (H, V, D) canvases of shape (n, n)."""
    n, c = pattern.n, pattern.c
    nH, nV = n * c, c * n
    z = jnp.zeros((n, n), x_fam.dtype)
    H = z.at[:, :c].set(x_fam[:nH].reshape(n, c))
    V = z.at[:c, :].set(x_fam[nH:nH + nV].reshape(c, n))
    D = z.at[:c, :c].set(x_fam[nH + nV:].reshape(c, c))
    return H, V, D


def from_canvases(pattern: StencilPattern, H, V, D):
    """(H, V, D) canvases -> family-layout flat vector."""
    c = pattern.c
    return jnp.concatenate(
        [H[:, :c].ravel(), V[:c, :].ravel(), D[:c, :c].ravel()]
    )


def coeff_canvases(pattern: StencilPattern, coeffs: tuple):
    """Embed the 15 extracted coefficient grids into (n, n) canvases.

    Term order matches ops/stencil.py: 5 H-row terms, 5 V-row terms,
    5 D-row terms; each is placed at its OUT-family valid region."""
    n, c = pattern.n, pattern.c
    z = jnp.zeros((n, n), coeffs[0].dtype)
    out = []
    for i, g in enumerate(coeffs):
        if i < 5:  # H rows: (n, c)
            out.append(z.at[:, :c].set(g))
        elif i < 10:  # V rows: (c, n)
            out.append(z.at[:c, :].set(g))
        else:  # D rows: (c, c)
            out.append(z.at[:c, :c].set(g))
    return tuple(out)


def _solver_kernel(
    *refs,
    n: int, n_steps: int, n_iters: int, has_ka: bool, extrapolate: bool,
):
    # Ref layout: 15 system coefficient canvases, masked mass x3, inverse
    # diagonal x3, interior mask x3, u0 x3, outputs u x3, then 18 Krylov
    # scratch canvases (+3 previous-state canvases when extrapolate).
    # Crank-Nicolson (has_ka) reuses the system canvases via the identity
    # in the module docstring — no extra refs.
    sys_coeffs = refs[0:15]
    base = 15
    mH, mV, mD, idH, idV, idD = refs[base:base + 6]
    mkH, mkV, mkD = refs[base + 6:base + 9]
    u0H, u0V, u0D = refs[base + 9:base + 12]
    uH, uV, uD = refs[base + 12:base + 15]
    (rH, rV, rD, rhH, rhV, rhD, pH, pV, pD,
     vH, vV, vD, tH, tV, tD, wH, wV, wD) = refs[base + 15:base + 33]
    up3 = refs[base + 33:base + 36] if extrapolate else None

    def roll(x, shift, axis):
        # pltpu.roll requires non-negative shifts; -1 == n-1 circularly.
        return pltpu.roll(x, shift % n, axis)

    def matvec(coeffs, outs, xH, xV, xD):
        """One stencil application on canvases: rolls + multiply-adds.
        Wrapped-in values land only where coefficients are zero."""
        (cHH, cHVu, cHDu, cHVd, cHDd,
         cVV, cVDl, cVHl, cVHr, cVDr,
         cDD, cDVr, cDHd, cDHu, cDVl) = coeffs
        oH, oV, oD = outs
        oH[:] = (cHH[:] * xH
                 + cHVu[:] * roll(xV, -1, 1)   # V(i+1, j)
                 + cHDu[:] * xD                # D(i, j)
                 + cHVd[:] * roll(xV, 1, 0)    # V(i, j-1)
                 + cHDd[:] * roll(xD, 1, 0))   # D(i, j-1)
        oV[:] = (cVV[:] * xV
                 + cVDl[:] * roll(xD, 1, 1)    # D(i-1, j)
                 + cVHl[:] * roll(xH, 1, 1)    # H(i-1, j)
                 + cVHr[:] * roll(xH, -1, 0)   # H(i, j+1)
                 + cVDr[:] * xD)               # D(i, j)
        oD[:] = (cDD[:] * xD
                 + cDVr[:] * roll(xV, -1, 1)   # V(i+1, j)
                 + cDHd[:] * xH                # H(i, j)
                 + cDHu[:] * roll(xH, -1, 0)   # H(i, j+1)
                 + cDVl[:] * xV)               # V(i, j)

    def dot3(a3, b3):
        (a1, a2, a3_), (b1, b2, b3_) = a3, b3
        return (jnp.sum(a1[:] * b1[:]) + jnp.sum(a2[:] * b2[:])
                + jnp.sum(a3_[:] * b3_[:]))

    r3, rh3, p3 = (rH, rV, rD), (rhH, rhV, rhD), (pH, pV, pD)
    v3, t3, w3 = (vH, vV, vD), (tH, tV, tD), (wH, wV, wD)
    u3, m3, id3 = (uH, uV, uD), (mH, mV, mD), (idH, idV, idD)
    mk3 = (mkH, mkV, mkD)

    uH[:] = u0H[:]
    uV[:] = u0V[:]
    uD[:] = u0D[:]
    if extrapolate:
        for up_, u0_ in zip(up3, (u0H, u0V, u0D)):
            up_[:] = u0_[:]

    def step(_, carry):
        # Backward Euler: b = M u_prev (crbe.py:383-384); Crank-Nicolson
        # adds the row-masked -(dt/2)(K+A) u term (crbe.py:385-386) via
        # the identity b = 2 M_masked u + (1-mask) u - S u (see module
        # docstring). b is formed from the UNMASKED u (the first step's
        # u0 carries boundary values whose columns feed interior rows);
        # the warm start x is then boundary-masked, after which every
        # Krylov vector stays zero on Dirichlet rows. The (1-mask) term
        # is safe in the zero-padded canvas regions because u stays zero
        # there (u0 arrives padded-zero; every update multiplies by a
        # padded-zero canvas).
        if has_ka:
            matvec(sys_coeffs, t3, uH[:], uV[:], uD[:])
            for r_, m_, u_, t_, mk_ in zip(r3, m3, u3, t3, mk3):
                r_[:] = (2.0 * m_[:] * u_[:]
                         + (1.0 - mk_[:]) * u_[:] - t_[:])
        else:
            for r_, m_, u_ in zip(r3, m3, u3):
                r_[:] = m_[:] * u_[:]
        if extrapolate:
            # Second-order warm start: x0 = mask * (2u - u_prev). The RHS
            # above already consumed the unmasked current state.
            for u_, up_, mk_ in zip(u3, up3, mk3):
                guess = 2.0 * u_[:] - up_[:]
                up_[:] = u_[:]
                u_[:] = guess * mk_[:]
        else:
            for u_, mk_ in zip(u3, mk3):
                u_[:] = u_[:] * mk_[:]
        matvec(sys_coeffs, t3, uH[:], uV[:], uD[:])
        for r_, t_ in zip(r3, t3):
            r_[:] = r_[:] - t_[:]
        for rh_, r_ in zip(rh3, r3):
            rh_[:] = r_[:]
        for p_, v_ in zip(p3, v3):
            p_[:] = jnp.zeros_like(p_)
            v_[:] = jnp.zeros_like(v_)

        def iterate(_, state):
            rho_old, alpha, omega = state
            rho = dot3(rh3, r3)
            beta = (rho / jnp.where(rho_old == 0, _EPS, rho_old)) * (
                alpha / jnp.where(omega == 0, _EPS, omega)
            )
            for p_, r_, v_ in zip(p3, r3, v3):
                p_[:] = r_[:] + beta * (p_[:] - omega * v_[:])
            for w_, id_, p_ in zip(w3, id3, p3):
                w_[:] = id_[:] * p_[:]
            matvec(sys_coeffs, v3, wH[:], wV[:], wD[:])
            denom = dot3(rh3, v3)
            alpha = rho / jnp.where(denom == 0, _EPS, denom)
            for u_, w_ in zip(u3, w3):
                u_[:] = u_[:] + alpha * w_[:]
            for r_, v_ in zip(r3, v3):
                r_[:] = r_[:] - alpha * v_[:]  # r now holds s
            for w_, id_, r_ in zip(w3, id3, r3):
                w_[:] = id_[:] * r_[:]  # shat
            matvec(sys_coeffs, t3, wH[:], wV[:], wD[:])
            tt = dot3(t3, t3)
            omega = dot3(t3, r3) / jnp.where(tt == 0, _EPS, tt)
            for u_, w_ in zip(u3, w3):
                u_[:] = u_[:] + omega * w_[:]
            for r_, t_ in zip(r3, t3):
                r_[:] = r_[:] - omega * t_[:]
            return rho, alpha, omega

        one = jnp.ones((), uH.dtype)
        jax.lax.fori_loop(0, n_iters, iterate, (one, one, one))
        return carry

    jax.lax.fori_loop(0, n_steps, step, 0)


def _uniform_solver_kernel(
    consts, *refs,
    n: int, c: int, n_steps: int, n_iters: int, has_ka: bool,
    extrapolate: bool, method: str = "bicgstab",
    source_fn=None, source_steady: bool = False,
    source_lumped: bool = True,
):
    """Uniform-operator variant (ops/uniform.py): NO coefficient, mass,
    inverse-diagonal or mask canvases — 21 scalars in SMEM plus
    iota-derived rectangle masks. The matvec rect-masks its output (zero
    on Dirichlet rows instead of identity), which is equivalent inside
    the solve because every Krylov vector is zero there; the CN RHS
    identity term ``(1-mask) u`` is dropped for the same reason (its only
    nonzero rows are Dirichlet rows the masked RHS zeroes anyway).

    Source terms (``source_fn``: an elementwise (x, y, t) -> s callable,
    e.g. ``problem.source_xy``) are evaluated IN-KERNEL on coordinate
    canvases built from iotas — family midpoints are affine in the canvas
    (row, col) indices (row <-> y, col <-> x; H at half-integer x, V at
    half-integer y, D at both), so the load costs zero extra HBM traffic.
    The masked lumped-mass load ``dt * m_f * s`` (run_time_loop's
    corrected-D10 default; ``source_lumped=False`` reproduces the
    reference's raw ``dt * s``) is added to the RHS each step — BE
    samples t^{n+1}, CN the t^n/t^{n+1} trapezoid. ``source_steady``
    hoists the evaluation out of the step loop into 3 scratch canvases.

    Ref layout: u0 x3 (aliased to the outputs), outputs u x3, then 18
    Krylov scratch canvases (+3 previous-state canvases when extrapolate,
    +3 hoisted-load canvases when source_steady).
    """
    u0H, u0V, u0D = refs[0:3]
    uH, uV, uD = refs[3:6]
    if method == "chebyshev":
        # Three live vectors: r, d, t (matvec scratch).
        rH, rV, rD, dH, dV, dD, tH, tV, tD = refs[6:15]
        k = 15
    else:
        (rH, rV, rD, rhH, rhV, rhD, pH, pV, pD,
         vH, vV, vD, tH, tV, tD, wH, wV, wD) = refs[6:24]
        k = 24
    up3 = refs[k:k + 3] if extrapolate else None
    k += 3 if extrapolate else 0
    s3 = refs[k:k + 3] if (source_fn is not None and source_steady) \
        else None

    dtype = uH.dtype
    # Per-family interior rectangles (UniformSpec.interior_rects):
    # H rows [1, c) x cols [0, c); V rows [0, c) x cols [1, c);
    # D rows [0, c) x cols [0, c). Built once from 1D iotas; the mask
    # multiply is two broadcasts per family per matvec.
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    rowH = ((ri >= 1) & (ri < c)).astype(dtype)
    colH = (ci < c).astype(dtype)
    rowV = (ri < c).astype(dtype)
    colV = ((ci >= 1) & (ci < c)).astype(dtype)
    rowD = (ri < c).astype(dtype)
    colD = (ci < c).astype(dtype)

    def maskH(x):
        return rowH * (colH * x)

    def maskV(x):
        return rowV * (colV * x)

    def maskD(x):
        return rowD * (colD * x)

    (cHH, cHVu, cHDu, cHVd, cHDd,
     cVV, cVDl, cVHl, cVHr, cVDr,
     cDD, cDVr, cDHd, cDHu, cDVl) = (consts[i] for i in range(15))
    mcH, mcV, mcD = consts[15], consts[16], consts[17]
    idH_c, idV_c, idD_c = consts[18], consts[19], consts[20]

    def roll(x, shift, axis):
        return pltpu.roll(x, shift % n, axis)

    def matvec(outs, xH, xV, xD):
        """Rect-masked uniform stencil: mask kills both Dirichlet rows and
        roll wrap-around (wrapped values only ever land outside the
        family's interior rectangle)."""
        oH, oV, oD = outs
        oH[:] = maskH(cHH * xH
                      + cHVu * roll(xV, -1, 1)
                      + cHDu * xD
                      + cHVd * roll(xV, 1, 0)
                      + cHDd * roll(xD, 1, 0))
        oV[:] = maskV(cVV * xV
                      + cVDl * roll(xD, 1, 1)
                      + cVHl * roll(xH, 1, 1)
                      + cVHr * roll(xH, -1, 0)
                      + cVDr * xD)
        oD[:] = maskD(cDD * xD
                      + cDVr * roll(xV, -1, 1)
                      + cDHd * xH
                      + cDHu * roll(xH, -1, 0)
                      + cDVl * xV)

    def dot3(a3, b3):
        (a1, a2, a3_), (b1, b2, b3_) = a3, b3
        return (jnp.sum(a1[:] * b1[:]) + jnp.sum(a2[:] * b2[:])
                + jnp.sum(a3_[:] * b3_[:]))

    r3, t3, u3 = (rH, rV, rD), (tH, tV, tD), (uH, uV, uD)
    if method == "chebyshev":
        d3 = (dH, dV, dD)
        # Chebyshev interval scalars (power_bounds of the Jacobi-scaled
        # operator), packed after the 21 operator constants.
        lo, hi = consts[21], consts[22]
        theta = 0.5 * (hi + lo)
        delta = 0.5 * (hi - lo)
        sigma = theta / delta
    else:
        rh3, p3 = (rhH, rhV, rhD), (pH, pV, pD)
        v3, w3 = (vH, vV, vD), (wH, wV, wD)
    masks = (maskH, maskV, maskD)
    mconsts = (mcH, mcV, mcD)
    idconsts = (idH_c, idV_c, idD_c)

    if source_fn is not None:
        # Extra scalars packed after the operator constants (and the
        # chebyshev interval): grid origin, spacing, dt, chunk start
        # time. Family midpoint offsets in grid units: H (+1/2, 0),
        # V (0, +1/2), D (+1/2, +1/2) — verified against mid[perm] in
        # tests/test_pallas_solver.py.
        sbase = 23 if method == "chebyshev" else 21
        xmin, ymin, hh = consts[sbase], consts[sbase + 1], consts[sbase + 2]
        dt_s, t0_s = consts[sbase + 3], consts[sbase + 4]
        rif = ri.astype(dtype)
        cif = ci.astype(dtype)
        offs = ((0.5, 0.0), (0.0, 0.5), (0.5, 0.5))  # (x, y) per family

        def load_at(f, t):
            ox, oy = offs[f]
            x = xmin + (cif + ox) * hh   # (1, n)
            y = ymin + (rif + oy) * hh   # (n, 1)
            s = source_fn(x + 0.0 * y, y + 0.0 * x, t)
            fac = dt_s * mconsts[f] if source_lumped else dt_s
            return masks[f](fac * s)

        if source_steady:
            for f in range(3):
                s3[f][:] = load_at(f, t0_s)

        def add_load(f, r_, i):
            """RHS source load for step i (solving for t^{i+1})."""
            if source_steady:
                r_[:] = r_[:] + s3[f][:]
                return
            t_new = t0_s + (i + 1).astype(dtype) * dt_s
            if has_ka:  # CN trapezoid (run_time_loop mass_lumped branch)
                r_[:] = r_[:] + 0.5 * (load_at(f, t_new)
                                       + load_at(f, t_new - dt_s))
            else:  # BE samples t^{n+1}
                r_[:] = r_[:] + load_at(f, t_new)

    uH[:] = u0H[:]
    uV[:] = u0V[:]
    uD[:] = u0D[:]
    if extrapolate:
        for up_, u_ in zip(up3, u3):
            up_[:] = u_[:]

    def step(i, carry):
        if has_ka:
            matvec(t3, uH[:], uV[:], uD[:])
            for r_, m_, u_, t_, msk in zip(r3, mconsts, u3, t3, masks):
                r_[:] = 2.0 * m_ * msk(u_[:]) - t_[:]
        else:
            for r_, m_, u_, msk in zip(r3, mconsts, u3, masks):
                r_[:] = m_ * msk(u_[:])
        if source_fn is not None:
            for f, r_ in enumerate(r3):
                add_load(f, r_, i)
        if extrapolate:
            for u_, up_, msk in zip(u3, up3, masks):
                guess = 2.0 * u_[:] - up_[:]
                up_[:] = u_[:]
                u_[:] = msk(guess)
        else:
            for u_, msk in zip(u3, masks):
                u_[:] = msk(u_[:])
        matvec(t3, uH[:], uV[:], uD[:])
        for r_, t_ in zip(r3, t3):
            r_[:] = r_[:] - t_[:]

        if method == "chebyshev":
            # Saad Alg. 12.1: x += d; r -= A d; d = rho' rho d +
            # (2 rho'/delta) M^{-1} r — one matvec, zero reductions.
            for d_, id_, r_ in zip(d3, idconsts, r3):
                d_[:] = (id_ / theta) * r_[:]

            def iterate(_, rho):
                for u_, d_ in zip(u3, d3):
                    u_[:] = u_[:] + d_[:]
                matvec(t3, dH[:], dV[:], dD[:])
                for r_, t_ in zip(r3, t3):
                    r_[:] = r_[:] - t_[:]
                rho_new = 1.0 / (2.0 * sigma - rho)
                for d_, id_, r_ in zip(d3, idconsts, r3):
                    d_[:] = (rho_new * rho) * d_[:] + (
                        2.0 * rho_new / delta
                    ) * (id_ * r_[:])
                return rho_new

            jax.lax.fori_loop(0, n_iters, iterate, 1.0 / sigma)
            return carry

        for rh_, r_ in zip(rh3, r3):
            rh_[:] = r_[:]
        for p_, v_ in zip(p3, v3):
            p_[:] = jnp.zeros_like(p_)
            v_[:] = jnp.zeros_like(v_)

        def iterate(_, state):
            rho_old, alpha, omega = state
            rho = dot3(rh3, r3)
            beta = (rho / jnp.where(rho_old == 0, _EPS, rho_old)) * (
                alpha / jnp.where(omega == 0, _EPS, omega)
            )
            for p_, r_, v_ in zip(p3, r3, v3):
                p_[:] = r_[:] + beta * (p_[:] - omega * v_[:])
            for w_, id_, p_ in zip(w3, idconsts, p3):
                w_[:] = id_ * p_[:]
            matvec(v3, wH[:], wV[:], wD[:])
            denom = dot3(rh3, v3)
            alpha = rho / jnp.where(denom == 0, _EPS, denom)
            for u_, w_ in zip(u3, w3):
                u_[:] = u_[:] + alpha * w_[:]
            for r_, v_ in zip(r3, v3):
                r_[:] = r_[:] - alpha * v_[:]  # r now holds s
            for w_, id_, r_ in zip(w3, idconsts, r3):
                w_[:] = id_ * r_[:]  # shat
            matvec(t3, wH[:], wV[:], wD[:])
            tt = dot3(t3, t3)
            omega = dot3(t3, r3) / jnp.where(tt == 0, _EPS, tt)
            for u_, w_ in zip(u3, w3):
                u_[:] = u_[:] + omega * w_[:]
            for r_, t_ in zip(r3, t3):
                r_[:] = r_[:] - omega * t_[:]
            return rho, alpha, omega

        one = jnp.ones((), dtype)
        jax.lax.fori_loop(0, n_iters, iterate, (one, one, one))
        return carry

    jax.lax.fori_loop(0, n_steps, step, 0)


def fused_solve_uniform(spec, consts, mass_consts, inv_diag_consts, u0_fam,
                        *, n_steps: int, n_iters: int = 5,
                        use_ka: bool = False, extrapolate: bool = False,
                        method: str = "bicgstab", bounds=None,
                        source_fn=None, source_steady: bool = False,
                        source_lumped: bool = True, grid=None,
                        t0=0.0, dt=None,
                        interpret: bool = False):
    """Whole-loop fused solve with the translation-invariant operator.

    ``spec`` is an ops/uniform.UniformSpec; ``consts`` the 15 stencil
    scalars (uniform.extract_constants of the MASKED system);
    ``mass_consts``/``inv_diag_consts`` the per-family interior mass and
    1/system-diagonal scalars (uniform.family_constants). Everything else
    matches :func:`fused_solve` — but the only array input is ``u0_fam``
    (aliased into the output), so the VMEM footprint drops from 48 to
    21 canvases (24 with extrapolation): meshes to ~380^2 fit.

    Nonzero sources: pass ``source_fn`` (elementwise (x, y, t) -> s, e.g.
    ``problem.source_xy``), ``grid = (xmin, ymin, h)`` (vertex-grid origin
    and spacing), ``dt``, and the chunk start time ``t0``; the load is
    evaluated in-kernel on iota-derived coordinate canvases (see
    :func:`_uniform_solver_kernel`). ``source_steady`` hoists it out of
    the step loop (+3 scratch canvases).
    """
    n, cdim = spec.n, spec.c
    dtype = u0_fam.dtype
    u3 = to_canvases(spec, u0_fam)
    if method not in ("bicgstab", "chebyshev"):
        raise ValueError(f"unknown method {method!r}")
    if (method == "chebyshev") != (bounds is not None):
        raise ValueError("bounds must be given exactly for chebyshev")
    if source_fn is not None and (grid is None or dt is None):
        raise ValueError("source_fn requires grid=(xmin, ymin, h) and dt")
    parts = [
        jnp.asarray(consts, dtype),
        jnp.asarray(mass_consts, dtype),
        jnp.asarray(inv_diag_consts, dtype),
    ]
    if bounds is not None:
        parts.append(jnp.stack([jnp.asarray(b, dtype) for b in bounds]))
    if source_fn is not None:
        parts.append(jnp.stack([
            jnp.asarray(grid[0], dtype), jnp.asarray(grid[1], dtype),
            jnp.asarray(grid[2], dtype), jnp.asarray(dt, dtype),
            jnp.asarray(t0, dtype),
        ]))
    packed = jnp.concatenate(parts)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    kernel = partial(_uniform_solver_kernel, n=n, c=cdim, n_steps=n_steps,
                     n_iters=n_iters, has_ka=use_ka, extrapolate=extrapolate,
                     method=method, source_fn=source_fn,
                     source_steady=source_steady,
                     source_lumped=source_lumped)
    n_scratch = 9 if method == "chebyshev" else 18
    n_scratch += 3 if extrapolate else 0
    n_scratch += 3 if (source_fn is not None and source_steady) else 0
    scratch = [pltpu.VMEM((n, n), dtype) for _ in range(n_scratch)]
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((n, n), dtype) for _ in range(3)
        ),
        in_specs=[smem, vmem, vmem, vmem],
        out_specs=(vmem, vmem, vmem),
        scratch_shapes=scratch,
        input_output_aliases={1: 0, 2: 1, 3: 2},
        compiler_params=_vmem_params(n, n_scratch + 3),
        interpret=interpret,
    )(packed, *u3)
    return from_canvases(spec, *outs)


def _vmem_params(n: int, n_canvases: int):
    """Raise Mosaic's scoped-VMEM limit only when the kernel needs it.

    The default limit is 16 MB — below the physical VMEM of a v5e core —
    and blocks meshes past ~300^2 (measured: 321^2 BiCGStab needs 16.8 MB
    scoped). But a blanket high limit changes Mosaic's scheduling choices
    and measurably slows kernels that fit the default, so the limit is
    raised per-kernel from the canvas footprint: (8, 128)-tile-padded
    canvases plus 50% headroom for expression temporaries (the 321^2
    measurement: 12.1 MB of canvases -> 16.8 MB scoped)."""
    padded = -(-n // 8) * 8 * (-(-n // 128) * 128) * 4
    need = int(padded * n_canvases * 1.5) + 2 * 1024 * 1024
    if need <= 16 * 1024 * 1024:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=need)


def fused_solve(pattern: StencilPattern, coeffs: tuple, mass_masked_fam,
                inv_diag_fam, u0_fam, interior_fam, *, n_steps: int,
                n_iters: int = 5, use_ka: bool = False,
                extrapolate: bool = False, interpret: bool = False):
    """Run the full zero-source implicit time loop in one kernel.

    All vectors arrive in family layout (see ops/stencil.py).
    ``mass_masked_fam`` must be zero on Dirichlet rows; ``u0_fam`` arrives
    FULL (boundary values included — its columns feed the first step's
    RHS); ``interior_fam`` is 1 on interior DOFs and 0 on Dirichlet rows.
    For Crank-Nicolson pass ``use_ka=True``: the -(dt/2)(K+A) RHS term is
    reconstructed from the system canvases in-kernel (module docstring),
    so CN has the same VMEM footprint as backward Euler. Returns the
    final homogeneous state in family layout (no boundary lift).
    """
    n = pattern.n
    dtype = u0_fam.dtype
    ccan = coeff_canvases(pattern, coeffs)
    m3 = to_canvases(pattern, mass_masked_fam)
    id3 = to_canvases(pattern, inv_diag_fam)
    mk3 = to_canvases(pattern, jnp.asarray(interior_fam, dtype))
    u3 = to_canvases(pattern, u0_fam)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = partial(_solver_kernel, n=n, n_steps=n_steps, n_iters=n_iters,
                     has_ka=use_ka, extrapolate=extrapolate)
    n_scratch = 21 if extrapolate else 18
    scratch = [pltpu.VMEM((n, n), dtype) for _ in range(n_scratch)]
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((n, n), dtype) for _ in range(3)
        ),
        in_specs=[vmem] * 27,
        out_specs=(vmem, vmem, vmem),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*ccan, *m3, *id3, *mk3, *u3)
    return from_canvases(pattern, *outs)
