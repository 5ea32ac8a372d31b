"""FFT-based spectral preconditioner for the structured CRBE system.

On the structured triangulation with constant (v, D), the assembled
operator ``S = M + c dt (K + A)`` is translation-invariant in the mesh
interior: every interior row of each edge family (H, V, D — see
ops/stencil.py) has the SAME 5 coefficients. Embedding the three families
into common (n, n) canvases (the fused kernel's layout,
ops/pallas_solver.py) makes the interior operator a 3x3-BLOCK CIRCULANT
stencil, which a 2D FFT diagonalizes exactly: per Fourier mode k the
operator is a dense 3x3 complex matrix ("symbol")

    S_hat(k)[F, G] = sum_terms c_term * exp(-2 pi i k . s_term / n)

with s_term the canvas roll shift of that term. The preconditioner
inverts the symbol once (host-free, (n, n, 3, 3) ``jnp.linalg.inv``) and
applies M^{-1} r as 3 forward FFTs, one per-mode 3x3 mat-vec, and 3
inverse FFTs — O(n^2 log n), comparable to one stencil matvec.

It is EXACT for the periodic interior operator (unit-tested: applying it
to S x reproduces x wherever the wrap-around and Dirichlet rows are not
involved), so Krylov iterations stop growing with 1/h — the measured
Jacobi iteration counts grow 3.0 -> 7.3 from 256^2 to 1024^2 as dt D/h^2
leaves the mass-dominated regime (DESIGN.md section 6), which this
preconditioner is built to flatten. Dirichlet and wrap-around rows are
where it is only approximate; BiCGStab absorbs that.

STATUS — mathematically validated, NOT wall-clock competitive on TPU
(``preconditioner="spectral"`` is opt-in and deliberately not the
default): it cuts BiCGStab to ~1.2 iterations/step (measured) but XLA's
TPU FFT costs ~10 stencil matvecs per application, so it LOSES
wall-clock to Jacobi at every measured size (512^2: 503 vs 2,121
steps/s on the scan path). Large-mesh wall-clock is instead served by
the HBM stripe kernel (ops/pallas_hbm.py), whose fixed-iteration
Chebyshev inside a fused sweep sidesteps the iteration-growth question
entirely; this module remains the right starting point only if a
Pallas-native FFT (or a hardware FFT primitive) ever brings the
transform under ~2 matvecs.
"""

from __future__ import annotations

import jax.numpy as jnp

from airpollution_tpu.ops.pallas_solver import from_canvases, to_canvases
from airpollution_tpu.ops.stencil import StencilPattern

# Term tables: (out_family, in_family, canvas roll shift (s0, s1)) in the
# exact order of ops/stencil.py's 15 extracted coefficient grids. A term
# y = roll(x, s) has symbol factor exp(-2 pi i k . s / n).
_FAM = {"H": 0, "V": 1, "D": 2}
_TERMS = (
    # H rows (out F=H)
    ("H", "H", (0, 0)),
    ("H", "V", (0, -1)),   # V(i+1, j)
    ("H", "D", (0, 0)),
    ("H", "V", (1, 0)),    # V(i, j-1)
    ("H", "D", (1, 0)),    # D(i, j-1)
    # V rows
    ("V", "V", (0, 0)),
    ("V", "D", (0, 1)),    # D(i-1, j)
    ("V", "H", (0, 1)),    # H(i-1, j)
    ("V", "H", (-1, 0)),   # H(i, j+1)
    ("V", "D", (0, 0)),
    # D rows
    ("D", "D", (0, 0)),
    ("D", "V", (0, -1)),   # V(i+1, j)
    ("D", "H", (0, 0)),
    ("D", "H", (-1, 0)),   # H(i, j+1)
    ("D", "V", (0, 0)),
)


def interior_coefficients(pattern: StencilPattern, coeffs: tuple):
    """The 15 translation-invariant interior values (one per term), read
    at a deep-interior cell of each coefficient grid."""
    c = pattern.c
    i = c // 2
    return tuple(g[i, i] for g in coeffs)


def build_symbol(pattern: StencilPattern, coeffs: tuple):
    """(n, n, 3, 3) complex symbol of the interior operator."""
    n = pattern.n
    vals = interior_coefficients(pattern, coeffs)
    k0 = jnp.arange(n)[:, None]  # axis-0 frequency index
    k1 = jnp.arange(n)[None, :]
    sym = jnp.zeros((n, n, 3, 3), jnp.complex64)
    for (fo, fi, (s0, s1)), v in zip(_TERMS, vals):
        phase = jnp.exp(
            (-2j * jnp.pi / n) * (k0 * s0 + k1 * s1)
        ).astype(jnp.complex64)
        sym = sym.at[:, :, _FAM[fo], _FAM[fi]].add(
            v.astype(jnp.complex64) * phase
        )
    return sym


def spectral_preconditioner(pattern: StencilPattern, coeffs: tuple):
    """Returns ``precond(x_fam) -> z_fam`` applying the inverse symbol.

    ``x_fam`` is a family-layout flat vector (ops/stencil.py). The
    inverse symbols are precomputed once per solve; each application is
    3 FFTs + one per-mode 3x3 mat-vec + 3 inverse FFTs.
    """
    inv_sym = jnp.linalg.inv(build_symbol(pattern, coeffs))

    def apply(x_fam):
        H, V, D = to_canvases(pattern, x_fam)
        xh = jnp.stack(
            [jnp.fft.fft2(H), jnp.fft.fft2(V), jnp.fft.fft2(D)], axis=-1
        )
        zh = jnp.einsum("nmfg,nmg->nmf", inv_sym, xh)
        z = [
            jnp.real(jnp.fft.ifft2(zh[..., f])).astype(x_fam.dtype)
            for f in range(3)
        ]
        return from_canvases(pattern, *z)

    return apply
