"""Translation-invariant (uniform) stencil operator for structured meshes.

On the structured triangulation (airpollution_tpu.mesh.structured) every
cell is congruent — the two triangle shapes A/B repeat by pure translation.
With constant problem coefficients ``v`` and ``D`` (true of both built-in
problems, and of the reference's ``Problem`` ABC, common.py:15-30, which
stores them as plain scalars/vectors) the assembled CRBE operator
(crbe.py:326-362 semantics) is therefore *translation-invariant*: each of
the 15 stencil terms (ops/stencil.py neighbor table) carries a single
scalar coefficient over its whole validity region, Dirichlet rows are
exactly identity rows (the one-time row masking), and within each edge
family the 15 validity regions collapse to ONE rectangle — the family's
interior (non-Dirichlet) band.

Consequence: the operator needs NO stored coefficient arrays. A matvec is
15 scalar-times-shifted-array multiply-adds plus one boundary fixup — the
15 coefficient-canvas reads of the canvas stencil path (ops/stencil.py)
and the 15 VMEM-resident canvases of the fused Pallas solver
(ops/pallas_solver.py) disappear entirely. That cuts the HBM traffic of
one matvec from ~19 arrays to ~2 (read x, write y) and frees enough VMEM
to fit much larger meshes in the fused kernel.

The scalar constants are extracted from the assembled ELL values at one
static interior location per term (a traced gather of 15 elements), so
traced ``D``/``v`` (the vmapped sensitivity sweeps) work unchanged. The
assembled canvases differ from the single constant only by floating-point
rounding of the mesh coordinates (~1e-7 relative in float32 when the grid
spacing is not binary-exact; zero when it is) — the uniform operator is
the exact-arithmetic discretization of the uniform grid.

Scope guard: uniformity is a property of ``create_mesh`` grids plus
constant coefficients. Unstructured meshes take the ELL path; a problem
with spatially varying coefficients would need the canvas path (none of
the reference's problems do — Problem common.py:32-76 and the square-pulse
problem3.py:30-46 both have constant v, D).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from airpollution_tpu.ops.stencil import StencilPattern


@dataclasses.dataclass(frozen=True)
class UniformSpec:
    """Static (host-side) description of the uniform operator.

    center_slots: (15,) flat indices into the ELL value array — one
      interior sample point per stencil term (the scalar coefficients).
    center_dofs: (3,) global DOF ids of one interior H, V, D DOF (for
      sampling diagonal/mass constants from global vectors).
    """

    n: int
    c: int
    center_slots: np.ndarray
    center_dofs: np.ndarray

    @property
    def interior_rects(self):
        """Per-family interior rectangle in (n, n)-canvas coordinates:
        rows/cols [lo, hi) outside which family DOFs are Dirichlet rows or
        canvas padding. H: rows 1..c-1 (rows 0 and c are the bottom/top
        boundary edges), cols 0..c-1. V: rows 0..c-1, cols 1..c-1 (cols 0
        and c are the left/right boundary edges). D: all of 0..c-1 (no
        diagonal edge lies on the domain boundary)."""
        n, c = self.n, self.c
        return {
            "H": (1, c, 0, c),
            "V": (0, c, 1, c),
            "D": (0, c, 0, c),
        }


def build_uniform_spec(pattern: StencilPattern) -> UniformSpec:
    """Derive the static uniform-operator spec from a stencil pattern.

    Requires n >= 3 (at n == 2 every DOF is a Dirichlet row and no
    interior sample exists)."""
    n, c = pattern.n, pattern.c
    if n < 3:
        raise ValueError("uniform operator requires n_points_per_axis >= 3")

    # One interior sample per term: the center of the term's family grid.
    # Family interiors exclude H rows {0, c} and V cols {0, c}; each
    # term's validity region contains the full interior band, so the grid
    # center (n//2 or c//2 per axis) is valid for every term at n >= 3.
    slots = []
    for t, (slot_grid, valid) in enumerate(
        zip(pattern.term_slots, pattern.term_valid)
    ):
        r, col = valid.shape[0] // 2, valid.shape[1] // 2
        if not valid[r, col]:
            raise AssertionError(
                f"stencil term {t}: grid center not in validity region"
            )
        slots.append(slot_grid[r, col])

    # Global DOF ids of one interior DOF per family, via the family-layout
    # permutation (H block first, then V, then D — ops/stencil.py perm).
    h_idx = (n // 2) * c + c // 2
    v_idx = n * c + (c // 2) * n + n // 2
    d_idx = n * c + c * n + (c // 2) * c + c // 2
    center_dofs = pattern.perm[np.array([h_idx, v_idx, d_idx])]

    return UniformSpec(
        n=n, c=c,
        center_slots=np.asarray(slots, dtype=np.int64),
        center_dofs=np.asarray(center_dofs, dtype=np.int64),
    )


def make_spec_lite(n: int) -> UniformSpec:
    """A UniformSpec carrying only the grid geometry (n, c) — for use
    with patch-extracted constants (:func:`patch_constants`), where the
    center sample indices of the BIG mesh are never needed. The matvec,
    canvas embedding, and the fused kernels read only ``n``/``c``."""
    if n < 3:
        raise ValueError("uniform operator requires n_points_per_axis >= 3")
    # -1 sentinels: a lite spec has no center-sample indices, so feeding it
    # to extract_constants/family_constants must fail loudly instead of
    # silently gathering slot 0.
    sentinel = np.full(15, -1, dtype=np.int64)
    return UniformSpec(n=n, c=n - 1, center_slots=sentinel,
                       center_dofs=np.full(3, -1, dtype=np.int64))


def patch_constants(n: int, domain_size: float, problem, dt: float,
                    order: int, stiffness_convention: str = "correct",
                    *, patch_n: int = 9, dtype=None):
    """Uniform-operator scalars WITHOUT assembling the global operator.

    Requires constant (v, D): the patch sits at its own coordinates, so a
    spatially varying field would be sampled in the wrong place — refuse
    rather than extract a silently wrong operator.

    On a structured mesh with constant (v, D) every stencil coefficient
    is determined by one congruent cell (module docstring), so the 15
    system scalars and the per-family mass/system-diagonal constants can
    be extracted from a TINY patch mesh with the same cell size
    ``h = 2 * domain_size / (n - 1)``: assembly cost O(patch_n^2) instead
    of O(n^2). This is what makes meshes past ~2000^2 reachable at all —
    the vmapped global assembly OOMs HBM near 8M triangles (measured:
    24 GB requested at 2049^2), while the fused solve itself only ever
    touches these 21 scalars.

    The patch coordinates reproduce the big mesh's spacing up to float
    rounding, so the scalars match full-mesh extraction to ~1e-7 relative
    in float32 (exactly the rounding already accepted by
    :func:`extract_constants`, see module docstring).

    Returns (sys_consts (15,), ka_consts (15,), mass_c (3,),
    sys_diag_c (3,)) — ka_consts are the raw K+A stencil scalars
    (Crank-Nicolson's RHS operator, consumed with boundary="drop")."""
    from airpollution_tpu.mesh import MeshData, create_mesh
    from airpollution_tpu.models import crbe as crbe_mod
    from airpollution_tpu.ops import stencil as stencil_mod
    from airpollution_tpu.problems import Domain

    if getattr(problem, "variable_coefficients", False):
        raise ValueError(
            "patch_constants requires constant (v, D): spatially varying "
            "coefficients are not translation-invariant"
        )
    h = 2.0 * domain_size / (n - 1)
    patch_L = h * (patch_n - 1) / 2.0
    mesh = create_mesh(patch_n, patch_L)
    kwargs = {} if dtype is None else {"dtype": dtype}
    md = MeshData(mesh, Domain(Lx=patch_L, Ly=patch_L, T=1.0), nt=2,
                  **kwargs)
    ops = crbe_mod.assemble(md, problem, dt, order, stiffness_convention)
    pattern = stencil_mod.get_pattern(md)
    spec = build_uniform_spec(pattern)
    return (
        extract_constants(spec, ops.system.vals),
        extract_constants(spec, ops.ka.vals),
        family_constants(spec, ops.mass_diag),
        family_constants(spec, ops.system_diag),
    )


def family_const_vector(spec: UniformSpec, c3):
    """Family-layout vector filled blockwise with the 3 per-family
    constants (H block, then V, then D)."""
    n, c = spec.n, spec.c
    return jnp.concatenate([
        jnp.full((n * c,), c3[0]),
        jnp.full((c * n,), c3[1]),
        jnp.full((c * c,), c3[2]),
    ])


def family_diag_vector(spec: UniformSpec, diag_c, bmask_fam):
    """Full family-layout diagonal vector synthesized from the 3
    per-family constants: Dirichlet rows are exactly 1 (identity rows of
    the masked system), interior rows the family constant."""
    vec = family_const_vector(spec, diag_c)
    return jnp.where(bmask_fam, jnp.ones((), vec.dtype), vec)


def extract_constants(spec: UniformSpec, ell_vals) -> jnp.ndarray:
    """The 15 scalar stencil coefficients (traced; 15-element gather)."""
    if np.any(np.asarray(spec.center_slots) < 0):
        raise ValueError(
            "spec carries no center-sample slots (make_spec_lite); use "
            "patch_constants to obtain coefficients for a lite spec"
        )
    return ell_vals.reshape(-1)[jnp.asarray(spec.center_slots)]


def family_constants(spec: UniformSpec, vec) -> jnp.ndarray:
    """Per-family (H, V, D) interior constants of a global DOF vector
    (mass diagonal, system diagonal, ...)."""
    if np.any(np.asarray(spec.center_dofs) < 0):
        raise ValueError(
            "spec carries no center-sample DOFs (make_spec_lite); use "
            "patch_constants to obtain per-family constants"
        )
    return vec[jnp.asarray(spec.center_dofs)]


def uniform_matvec(spec: UniformSpec, consts, x_fam, *,
                   boundary: str = "identity"):
    """y = A @ x in family layout from 15 scalar coefficients.

    Same term structure as ops/stencil.stencil_matvec with the coefficient
    canvases replaced by scalars; the pad-based slicing encodes neighbor
    validity, and Dirichlet rows are fixed up afterwards:

    - ``boundary="identity"``: y = x on boundary rows — exact drop-in for
      the row-masked system operator.
    - ``boundary="drop"``: y = 0 on boundary rows — for operators whose
      boundary rows are NOT translation-invariant (the unmasked K+A used
      in the Crank-Nicolson RHS: its boundary rows aggregate only one
      triangle). run_time_loop discards those rows anyway (crbe.py:402
      semantics), so dropping them keeps the uniform path exact where it
      is consumed.
    """
    if boundary not in ("identity", "drop"):
        raise ValueError(f"unknown boundary mode {boundary!r}")
    n, c = spec.n, spec.c
    nH, nV = n * c, c * n
    xH = x_fam[:nH].reshape(n, c)
    xV = x_fam[nH:nH + nV].reshape(c, n)
    xD = x_fam[nH + nV:].reshape(c, c)
    (cHH, cHVu, cHDu, cHVd, cHDd,
     cVV, cVDl, cVHl, cVHr, cVDr,
     cDD, cDVr, cDHd, cDHu, cDVl) = consts

    pad = jnp.pad
    yH = (cHH * xH
          + cHVu * pad(xV[:, 1:], ((0, 1), (0, 0)))
          + cHDu * pad(xD, ((0, 1), (0, 0)))
          + cHVd * pad(xV[:, :c], ((1, 0), (0, 0)))
          + cHDd * pad(xD, ((1, 0), (0, 0))))
    yV = (cVV * xV
          + cVDl * pad(xD, ((0, 0), (1, 0)))
          + cVHl * pad(xH[:c, :], ((0, 0), (1, 0)))
          + cVHr * pad(xH[1:, :], ((0, 0), (0, 1)))
          + cVDr * pad(xD, ((0, 0), (0, 1))))
    yD = (cDD * xD
          + cDVr * xV[:, 1:]
          + cDHd * xH[:c, :]
          + cDHu * xH[1:, :]
          + cDVl * xV[:, :c])

    # Dirichlet fixup. Boundary DOFs are exactly H rows {0, n-1} (bottom/
    # top edges) and V cols {0, n-1} (left/right edges); no D edge is on
    # the boundary. XLA fuses the iota comparisons into the same loop.
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    cols = jnp.arange(n, dtype=jnp.int32)[None, :]
    h_bnd = (rows == 0) | (rows == n - 1)
    v_bnd = (cols == 0) | (cols == n - 1)
    if boundary == "identity":
        yH = jnp.where(h_bnd, xH, yH)
        yV = jnp.where(v_bnd, xV, yV)
    else:
        yH = jnp.where(h_bnd, 0.0, yH)
        yV = jnp.where(v_bnd, 0.0, yV)
    return jnp.concatenate([yH.ravel(), yV.ravel(), yD.ravel()])


def uniform_family_operators(spec: UniformSpec, pattern: StencilPattern,
                             ops, order: int):
    """Uniform-operator analogue of ops/stencil.family_operators: permuted
    diagonal operators plus matvec closures built from scalar constants
    (traced extraction — works under vmap over problem parameters)."""
    import functools

    perm = jnp.asarray(pattern.perm)
    consts = extract_constants(spec, ops.system.vals)
    matvec = functools.partial(uniform_matvec, spec, consts)
    if order == 2:
        ka_consts = extract_constants(spec, ops.ka.vals)
        ka_matvec = functools.partial(
            uniform_matvec, spec, ka_consts, boundary="drop"
        )
    else:
        ka_matvec = None
    ops_fam = ops._replace(
        mass_diag=ops.mass_diag[perm], system_diag=ops.system_diag[perm]
    )
    return ops_fam, matvec, ka_matvec
