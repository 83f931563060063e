"""Coordinate transforms: xyz <-> internal coordinates (z-matrix), PCA whitening.

Reference semantics: ``bgflow/nn/flow/crd_transform/ic.py`` (884 LoC) and
``ic_helper.py``.  The *forward* direction maps Cartesian xyz into
(bonds, angles, torsions, fixed/origin/rotation); angles and torsions are
normalized into (0, 1) by default.

TPU-first design
----------------
* The z-matrix is decomposed into reconstruction *stages* at trace time
  (host numpy); each stage places all its atoms at once as a dense batched
  op, so the device sees an unrolled sequence of ~O(tree-depth) fused
  kernels, each vectorized over (batch x atoms-in-stage).
* All measurement log-dets come from 3 ``jax.jvp`` passes of the per-atom
  (dist, angle, torsion) map (``ops/ic.py:jac_logdet_3``) instead of
  hand-derived chain rules; the 9x9 reference-frame determinant uses 9 jvp
  passes + ``slogdet`` instead of the reference's 24-permutation expansion
  (``ic_helper.py:8-78``).
* Gathers use static index arrays baked at trace time -> XLA emits
  constant-offset gathers.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..core.flow import Flow
from ..ops import ic as icops

__all__ = [
    "decompose_z_matrix",
    "slice_initial_atoms",
    "RelativeInternalCoordinateTransformation",
    "GlobalInternalCoordinateTransformation",
    "MixedCoordinateTransformation",
    "ReferenceSystemTransformation",
    "WhitenFlow",
]


def decompose_z_matrix(z_matrix: np.ndarray, fixed: np.ndarray):
    """Decompose a z-matrix into stages of simultaneously placeable atoms.

    Reference: ``ic.py:25-91``.  Returns (blocks, index2atom, atom2index,
    index2order) where each block is the (m, 4) sub-z-matrix of one stage.
    """
    z_matrix = np.asarray(z_matrix)
    fixed = np.asarray(fixed)
    atoms = [fixed]
    blocks = []
    given = np.sort(fixed)
    non_given = ~np.isin(z_matrix[:, 0], given)
    z_matrix = z_matrix[non_given]
    # prepend row index of each torsion
    z_matrix = np.concatenate([np.arange(len(z_matrix))[:, None], z_matrix], axis=1)
    order = []
    while len(z_matrix) > 0:
        placeable = np.all(np.isin(z_matrix[:, 2:], given), axis=-1)
        if not np.any(placeable):
            raise ValueError(
                "Z-matrix decomposition failed. Not reachable from fixed atoms: "
                f"{z_matrix[:, 1]}"
            )
        pos = z_matrix[placeable, 0]
        atom = z_matrix[placeable, 1]
        atoms.append(atom)
        order.append(pos)
        blocks.append(z_matrix[placeable][:, 1:])
        given = np.union1d(given, atom)
        z_matrix = z_matrix[~placeable]
    index2atom = np.concatenate(atoms)
    atom2index = np.argsort(index2atom)
    index2order = np.concatenate(order)
    return blocks, index2atom, atom2index, index2order


def slice_initial_atoms(z_matrix: np.ndarray):
    """Pick the three seed atoms of a global z-matrix (rows containing -1).

    Reference: ``ic.py:94-97``.
    """
    z_matrix = np.asarray(z_matrix)
    s = np.sum(z_matrix == -1, axis=-1)
    order = np.argsort(s)[::-1][:3]
    return z_matrix[:, 0][order], z_matrix[s == 0]


_TWO_PI = 2.0 * math.pi


def normalize_torsions(torsions):
    """[-pi, pi] -> (0, 1); returns (values, scalar dlogp)."""
    out = (torsions + math.pi) / _TWO_PI
    return out, -math.log(_TWO_PI) * torsions.shape[-1]


def unnormalize_torsions(torsions):
    out = torsions * _TWO_PI - math.pi
    return out, math.log(_TWO_PI) * torsions.shape[-1]


def normalize_angles(angles):
    """[0, pi] -> (0, 1); returns (values, scalar dlogp)."""
    return angles / math.pi, -math.log(math.pi) * angles.shape[-1]


def unnormalize_angles(angles):
    return angles * math.pi, math.log(math.pi) * angles.shape[-1]


class RelativeInternalCoordinateTransformation(Flow):
    """xyz <-> (bonds, angles, torsions, fixed-atom xyz).

    Forward measures ICs of every z-matrix row (with the analytic 3x3
    Jacobian determinant per conditioned atom); inverse reconstructs
    Cartesian positions stage by stage (NeRF placement).
    Reference: ``ic.py:268-513``.
    """

    def __init__(
        self,
        z_matrix: np.ndarray,
        fixed_atoms: np.ndarray,
        normalize_angles: bool = True,
        eps: float = 1e-7,
        use_pallas: bool = False,
    ):
        self._z_matrix = np.asarray(z_matrix)
        self._fixed_atoms = np.asarray(fixed_atoms)
        (self._blocks, self._index2atom, self._atom2index, self._index2order) = (
            decompose_z_matrix(self._z_matrix, self._fixed_atoms)
        )
        self.normalize_angles = normalize_angles
        self.eps = eps
        # fused Pallas reconstruction kernel (ops/ic_pallas.py)
        self.use_pallas = bool(use_pallas)
        from ..ops.ic_pallas import build_plan

        self._pallas_plan = build_plan(
            self._blocks, self._atom2index, self._index2order, len(self._fixed_atoms)
        )

    # -- metadata ---------------------------------------------------------
    @property
    def z_matrix(self):
        return self._z_matrix

    @property
    def fixed_atoms(self):
        return self._fixed_atoms

    @property
    def dim_bonds(self):
        return len(self._z_matrix)

    dim_angles = dim_torsions = dim_bonds

    @property
    def dim_fixed(self):
        return 3 * len(self._fixed_atoms)

    @property
    def bond_indices(self):
        return self._z_matrix[:, :2]

    @property
    def angle_indices(self):
        return self._z_matrix[:, :3]

    @property
    def torsion_indices(self):
        return self._z_matrix[:, :4]

    # -- directions -------------------------------------------------------
    def _forward(self, params, xs, **kwargs):
        (x,) = xs
        n_batch = x.shape[0]
        x = x.reshape(n_batch, -1, 3)
        zm = self._z_matrix
        x0 = x[:, zm[:, 0]]
        x1 = x[:, zm[:, 1]]
        x2 = x[:, zm[:, 2]]
        x3 = x[:, zm[:, 3]]

        bonds = icops.dist(x0, x1, self.eps)
        angles = icops.angle(x0, x1, x2, self.eps)
        torsions = icops.torsion(x0, x1, x2, x3, self.eps)
        # |det d(b,a,t)/dx0| = 1 / (b^2 sin(a)) — the spherical volume
        # element of the placement map (closed form; no jvp passes needed)
        dlogp = -jnp.sum(icops.placement_logdet(bonds, angles, self.eps), axis=-1)

        x_fixed = x[:, self._fixed_atoms].reshape(n_batch, -1)

        if self.normalize_angles:
            angles, dlogp_a = normalize_angles(angles)
            torsions, dlogp_t = normalize_torsions(torsions)
            dlogp = dlogp + dlogp_a + dlogp_t

        return (bonds, angles, torsions, x_fixed), dlogp

    def _inverse(self, params, xs, **kwargs):
        bonds, angles, torsions, x_fixed = xs
        dlogp = jnp.zeros(bonds.shape[0], dtype=bonds.dtype)
        if self.normalize_angles:
            angles, dlogp_a = unnormalize_angles(angles)
            torsions, dlogp_t = unnormalize_torsions(torsions)
            dlogp = dlogp + dlogp_a + dlogp_t

        # closed-form |det dx/d(b,a,t)| = b^2 sin(a), summed over all rows
        dlogp = dlogp + jnp.sum(icops.placement_logdet(bonds, angles, self.eps), axis=-1)

        if self.use_pallas:
            # Pallas forward; gradients route through the numerically
            # identical XLA reconstruction (the kernel has no reverse-mode
            # rule), so grad-through-sampling (NeuTra HMC, force matching)
            # works on the fast path too
            flat = _pallas_reconstruct(self, bonds, angles, torsions, x_fixed)
        else:
            flat = self._reconstruct_xla(bonds, angles, torsions, x_fixed)
        return (flat,), dlogp

    def _reconstruct_pallas(self, bonds, angles, torsions, x_fixed):
        from ..ops.ic_pallas import ic_reconstruct_pallas, ic_reconstruct_pallas_wide

        n_batch = x_fixed.shape[0]
        x_init = x_fixed.reshape(n_batch, -1, 3)
        n_total = x_init.shape[1] + bonds.shape[-1]
        if n_batch % 8 == 0:
            # wide layout: batch on (8 sublanes x lanes) — every
            # placement op runs at full VPU width
            pts = ic_reconstruct_pallas_wide(
                bonds, angles, torsions, x_init.reshape(n_batch, -1),
                self._pallas_plan, n_total, eps=self.eps,
            )  # (n_total*3, 8, B/8) recon order
            pts = pts.reshape(n_total, 3, 8, n_batch // 8)
            pts = jnp.transpose(pts[self._atom2index], (2, 3, 0, 1))
            return pts.reshape(n_batch, -1)
        fixed_t = x_init.reshape(n_batch, -1).T  # (n_fixed*3, B)
        pts = ic_reconstruct_pallas(
            bonds.T, angles.T, torsions.T, fixed_t,
            self._pallas_plan, n_total, eps=self.eps,
        )  # (n_total*3, B) recon order
        pts = pts.reshape(n_total, 3, n_batch)
        pts = jnp.transpose(pts[self._atom2index], (2, 0, 1))
        return pts.reshape(n_batch, -1)

    def _reconstruct_xla(self, bonds, angles, torsions, x_fixed):
        n_batch = x_fixed.shape[0]
        x_init = x_fixed.reshape(n_batch, -1, 3)
        n_fixed = x_init.shape[1]
        n_total = n_fixed + bonds.shape[-1]

        # Atom-major layout: all per-stage reads/writes become static
        # leading-axis slices.  Minor-axis (lane) gathers of (B, 17) arrays
        # cost ~50x more than major-axis slices on TPU, and the stage loop
        # does a dozen of them — this layout removes them all.
        bonds_t = bonds.T  # (D, B)
        angles_t = angles.T
        torsions_t = torsions.T

        points = jnp.zeros((n_total, n_batch, 3), dtype=x_fixed.dtype)
        points = jax.lax.dynamic_update_slice_in_dim(
            points, jnp.transpose(x_init, (1, 0, 2)), 0, axis=0
        )
        offset = n_fixed
        for block in self._blocks:
            ref = self._atom2index[block]  # recon-order indices of [atom, c1, c2, c3]
            p1 = points[ref[:, 1]]  # (m, B, 3) — static-index slices
            p2 = points[ref[:, 2]]
            p3 = points[ref[:, 3]]
            idx = self._index2order[ref[:, 0] - n_fixed]  # z-matrix rows of this stage
            b = bonds_t[idx]  # (m, B) — static leading-axis slices
            a = angles_t[idx]
            t = torsions_t[idx]
            p = icops.ic_to_xyz(p1, p2, p3, b, a, t, eps=self.eps)
            points = jax.lax.dynamic_update_slice_in_dim(points, p, offset, axis=0)
            offset += p.shape[0]

        # back to batch-major, reordered from reconstruction to atom order
        points = jnp.transpose(points[self._atom2index], (1, 0, 2))
        return points.reshape(n_batch, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pallas_reconstruct(flow, bonds, angles, torsions, x_fixed):
    """Pallas IC reconstruction with an XLA-autodiff backward rule.

    The fused kernels (ops/ic_pallas.py) have no reverse-mode rule; the
    dense XLA reconstruction is numerically identical, so its VJP is the
    exact gradient.  Backward pays one extra dense forward — only
    gradient-through-sampling paths (NeuTra HMC, force matching) ever do.
    """
    return flow._reconstruct_pallas(bonds, angles, torsions, x_fixed)


def _pallas_reconstruct_fwd(flow, bonds, angles, torsions, x_fixed):
    out = flow._reconstruct_pallas(bonds, angles, torsions, x_fixed)
    return out, (bonds, angles, torsions, x_fixed)


def _pallas_reconstruct_bwd(flow, res, g):
    _, vjp = jax.vjp(flow._reconstruct_xla, *res)
    return vjp(g)


_pallas_reconstruct.defvjp(_pallas_reconstruct_fwd, _pallas_reconstruct_bwd)


class ReferenceSystemTransformation(Flow):
    """First-three-atom frame: xyz <-> (origin, Euler orientation, d01, d12, a012).

    Reference: ``ic.py:128-265``; the 9x9 Jacobian determinant is computed
    exactly via 9 jvp columns + slogdet.
    """

    def __init__(self, normalize_angles: bool = True, eps: float = 1e-7):
        self.normalize_angles = normalize_angles
        self.eps = eps

    def _forward(self, params, xs, **kwargs):
        x0, x1, x2 = xs  # each (B, 1, 3)
        n_batch = x0.shape[0]
        flat = jnp.concatenate(
            [x0.reshape(n_batch, 3), x1.reshape(n_batch, 3), x2.reshape(n_batch, 3)], axis=-1
        )

        def measure(v):
            p0, p1, p2 = v[..., 0:3], v[..., 3:6], v[..., 6:9]
            d01 = icops.dist(p0, p1, self.eps)
            d12 = icops.dist(p1, p2, self.eps)
            a012 = icops.angle(p0, p1, p2, self.eps)
            basis = icops.tripod(p0, p1, p2, self.eps)
            alpha, cos_beta, gamma = icops.to_euler_angles(*basis)
            return jnp.concatenate(
                [p0, jnp.stack([d01, d12, a012, alpha, cos_beta, gamma], axis=-1)], axis=-1
            )

        ys, dlogp = icops.jac_logdet_general(measure, flat)
        x0 = ys[..., 0:3].reshape(n_batch, 1, 3)
        d01 = ys[..., 3:4]
        d12 = ys[..., 4:5]
        a012 = ys[..., 5:6]
        alpha = ys[..., 6:7]
        cos_beta = ys[..., 7:8]
        gamma = ys[..., 8:9]

        if self.normalize_angles:
            a012, dl_a = normalize_angles(a012)
            alpha, dl_al = normalize_torsions(alpha)
            gamma, dl_g = normalize_torsions(gamma)
            dlogp = dlogp + dl_a + dl_al + dl_g
        orientation = jnp.concatenate([alpha, cos_beta, gamma], axis=-1)
        return (x0, orientation, d01, d12, a012), dlogp

    def _inverse(self, params, xs, **kwargs):
        x0, orientation, d01, d12, a012 = xs
        n_batch = x0.shape[0]
        dlogp = jnp.zeros(n_batch, dtype=d01.dtype)
        alpha = orientation[..., 0:1]
        cos_beta = orientation[..., 1:2]
        gamma = orientation[..., 2:3]
        if self.normalize_angles:
            alpha, dl_al = unnormalize_torsions(alpha)
            gamma, dl_g = unnormalize_torsions(gamma)
            a012, dl_a = unnormalize_angles(a012)
            dlogp = dlogp + dl_al + dl_g + dl_a

        flat = jnp.concatenate(
            [x0.reshape(n_batch, 3), d01, d12, a012, alpha, cos_beta, gamma], axis=-1
        )

        def build(v):
            p_origin = v[..., 0:3]
            b01, b12, ang = v[..., 3], v[..., 4], v[..., 5]
            al, cb, ga = v[..., 6], v[..., 7], v[..., 8]
            p0 = jnp.zeros_like(p_origin)
            p1 = jnp.zeros_like(p_origin).at[..., 2].set(b01)
            p2 = icops.ic_to_xy0(p1, p0, b12, ang, eps=self.eps)
            rot = icops.from_euler_angles(al, cb, ga, eps=self.eps)
            y1 = jnp.einsum("...d,...ed->...e", p1, rot) + p_origin
            y2 = jnp.einsum("...d,...ed->...e", p2, rot) + p_origin
            return jnp.concatenate([p_origin, y1, y2], axis=-1)

        ys, dl = icops.jac_logdet_general(build, flat)
        dlogp = dlogp + dl
        x0 = ys[..., 0:3].reshape(n_batch, 1, 3)
        x1 = ys[..., 3:6].reshape(n_batch, 1, 3)
        x2 = ys[..., 6:9].reshape(n_batch, 1, 3)
        return (x0, x1, x2), dlogp


class GlobalInternalCoordinateTransformation(Flow):
    """Full xyz <-> (bonds, angles, torsions, origin, rotation).

    Reference: ``ic.py:516-716``.  The first three atoms' frame goes through
    ``ReferenceSystemTransformation``; the rest through the relative IC
    transform.
    """

    def __init__(self, z_matrix, normalize_angles: bool = True, eps: float = 1e-7):
        initial_atoms, z_sub = slice_initial_atoms(np.asarray(z_matrix))
        self._rel_ic = RelativeInternalCoordinateTransformation(
            z_matrix=z_sub, fixed_atoms=initial_atoms, normalize_angles=normalize_angles, eps=eps
        )
        self._ref_ic = ReferenceSystemTransformation(normalize_angles=normalize_angles, eps=eps)

    @property
    def z_matrix(self):
        return self._rel_ic.z_matrix

    @property
    def fixed_atoms(self):
        return np.array([], dtype=np.int64)

    @property
    def dim_bonds(self):
        return len(self.z_matrix) + 2

    @property
    def dim_angles(self):
        return len(self.z_matrix) + 1

    @property
    def dim_torsions(self):
        return len(self.z_matrix)

    @property
    def dim_fixed(self):
        return 0

    @property
    def bond_indices(self):
        fix = self._rel_ic.fixed_atoms
        return np.vstack([[[fix[1], fix[0]], [fix[2], fix[1]]], self._rel_ic.bond_indices])

    @property
    def angle_indices(self):
        fix = self._rel_ic.fixed_atoms
        return np.vstack([[[fix[2], fix[1], fix[0]]], self._rel_ic.angle_indices])

    @property
    def torsion_indices(self):
        return self._rel_ic.torsion_indices

    @property
    def normalize_angles(self):
        return self._rel_ic.normalize_angles

    def _forward(self, params, xs, **kwargs):
        (x,) = xs
        n_batch = x.shape[0]
        x = x.reshape(n_batch, -1, 3)
        (bonds, angles, torsions, x_fixed), dlogp_rel = self._rel_ic._forward((), (x.reshape(n_batch, -1),))
        x_fixed = x_fixed.reshape(n_batch, -1, 3)
        (x0, rot, d01, d12, a012), dlogp_ref = self._ref_ic._forward(
            (), (x_fixed[:, [0]], x_fixed[:, [1]], x_fixed[:, [2]])
        )
        bonds = jnp.concatenate([d01, d12, bonds], axis=-1)
        angles = jnp.concatenate([a012, angles], axis=-1)
        return (bonds, angles, torsions, x0, rot), dlogp_rel + dlogp_ref

    def _inverse(self, params, xs, **kwargs):
        bonds, angles, torsions, x0, rot = xs
        d01 = bonds[:, 0:1]
        d12 = bonds[:, 1:2]
        a012 = angles[:, 0:1]
        (x0, x1, x2), dlogp_ref = self._ref_ic._inverse((), (x0, rot, d01, d12, a012))
        x_init = jnp.concatenate([x0, x1, x2], axis=1)
        (x,), dlogp_rel = self._rel_ic._inverse(
            (), (bonds[:, 2:], angles[:, 1:], torsions, x_init.reshape(x_init.shape[0], -1))
        )
        return (x,), dlogp_rel + dlogp_ref


def _pca(x0: np.ndarray, keepdims: Optional[int] = None):
    """Host-side PCA (reference ``pca.py:9-34``)."""
    if keepdims is None:
        keepdims = x0.shape[1]
    mean = x0.mean(axis=0)
    centered = x0 - mean
    cov = centered.T @ centered / (centered.shape[0] - 1.0)
    eigval, eigvec = np.linalg.eigh(cov)
    order = np.argsort(eigval)[::-1][:keepdims]
    eigval = eigval[order]
    std = np.sqrt(eigval)
    eigvec = eigvec[:, order]
    t_whiten = eigvec @ np.diag(1.0 / std)
    t_blacken = np.diag(std) @ eigvec.T
    return mean, t_whiten, t_blacken, std


class WhitenFlow(Flow):
    """Static PCA whitening with constant log-det.

    Reference: ``pca.py:37-107``.  ``whiten_inverse=True`` (default) whitens
    in the *inverse* direction (latent -> data is the forward of the BG).
    """

    def __init__(
        self,
        x0,
        keepdims: Optional[int] = None,
        whiten_inverse: bool = True,
        statistics: Optional[dict] = None,
    ):
        """``statistics``: a dict previously read from :attr:`statistics` —
        restores the exact PCA constants instead of refitting them to ``x0``
        (which may then be ``None``).  Data-derived constants are NOT part of
        ``params``, so without this a checkpoint restored against regenerated
        data can silently pair trained parameters with a rotated whitening
        basis (eigenvector sign/order flips in near-degenerate subspaces)."""
        if statistics is not None:
            self.dim = int(statistics["dim"])
            self.keepdims = int(statistics["keepdims"])
            self.whiten_inverse = whiten_inverse
            self.mean = jnp.asarray(statistics["mean"])
            self.t_whiten = jnp.asarray(statistics["t_whiten"])
            self.t_blacken = jnp.asarray(statistics["t_blacken"])
            self.jacobian_xz = float(statistics["jacobian_xz"])
            return
        x0 = np.asarray(x0)
        if keepdims is None:
            keepdims = x0.shape[1]
        self.dim = x0.shape[1]
        self.keepdims = keepdims
        self.whiten_inverse = whiten_inverse
        mean, t_whiten, t_blacken, std = _pca(x0, keepdims)
        if np.any(std <= 0):
            raise ValueError("Cannot whiten: nonpositive eigenvalues kept.")
        self.mean = jnp.asarray(mean)
        self.t_whiten = jnp.asarray(t_whiten)
        self.t_blacken = jnp.asarray(t_blacken)
        self.jacobian_xz = float(-np.sum(np.log(std)))

    @property
    def statistics(self) -> dict:
        """The data-derived constants as a checkpointable pytree."""
        return {
            "dim": np.int32(self.dim),
            "keepdims": np.int32(self.keepdims),
            "mean": np.asarray(self.mean),
            "t_whiten": np.asarray(self.t_whiten),
            "t_blacken": np.asarray(self.t_blacken),
            "jacobian_xz": np.float64(self.jacobian_xz),
        }

    def _whiten(self, x):
        z = jnp.dot(x - self.mean, self.t_whiten, preferred_element_type=x.dtype)
        return z, jnp.full(x.shape[:1], self.jacobian_xz, dtype=x.dtype)

    def _blacken(self, z):
        x = jnp.dot(z, self.t_blacken, preferred_element_type=z.dtype) + self.mean
        return x, jnp.full(z.shape[:1], -self.jacobian_xz, dtype=z.dtype)

    def _forward(self, params, xs, **kwargs):
        (x,) = xs
        y, dlogp = self._blacken(x) if self.whiten_inverse else self._whiten(x)
        return (y,), dlogp

    def _inverse(self, params, xs, **kwargs):
        (x,) = xs
        y, dlogp = self._whiten(x) if self.whiten_inverse else self._blacken(x)
        return (y,), dlogp


class MixedCoordinateTransformation(Flow):
    """Relative IC transform + PCA whitening of the fixed atoms.

    Reference: ``ic.py:719-885``.
    """

    def __init__(
        self,
        data,
        z_matrix,
        fixed_atoms,
        keepdims: Optional[int] = None,
        normalize_angles: bool = True,
        eps: float = 1e-7,
        use_pallas: bool = False,
        whiten_statistics: Optional[dict] = None,
    ):
        if whiten_statistics is not None:
            self._whiten = WhitenFlow(
                None, whiten_inverse=False, statistics=whiten_statistics
            )
        else:
            data = np.asarray(data)
            n_data = data.shape[0]
            fixed = data.reshape(n_data, -1, 3)[:, np.asarray(fixed_atoms)].reshape(n_data, -1)
            self._whiten = WhitenFlow(fixed, keepdims=keepdims, whiten_inverse=False)
        self._rel_ic = RelativeInternalCoordinateTransformation(
            z_matrix=z_matrix, fixed_atoms=fixed_atoms, normalize_angles=normalize_angles,
            eps=eps, use_pallas=use_pallas,
        )

    @property
    def whiten_statistics(self) -> dict:
        """Checkpointable whitening constants (see ``WhitenFlow.statistics``)."""
        return self._whiten.statistics

    @property
    def z_matrix(self):
        return self._rel_ic.z_matrix

    @property
    def fixed_atoms(self):
        return self._rel_ic.fixed_atoms

    @property
    def dim_bonds(self):
        return len(self.z_matrix)

    dim_angles = dim_torsions = dim_bonds

    @property
    def dim_fixed(self):
        return self._whiten.keepdims

    @property
    def bond_indices(self):
        return self._rel_ic.bond_indices

    @property
    def angle_indices(self):
        return self._rel_ic.angle_indices

    @property
    def torsion_indices(self):
        return self._rel_ic.torsion_indices

    @property
    def normalize_angles(self):
        return self._rel_ic.normalize_angles

    def _forward(self, params, xs, **kwargs):
        (x,) = xs
        (bonds, angles, torsions, x_fixed), dlogp_rel = self._rel_ic._forward((), (x,))
        (z_fixed,), dlogp_ref = self._whiten._forward((), (x_fixed,))
        return (bonds, angles, torsions, z_fixed), dlogp_rel + dlogp_ref

    def _inverse(self, params, xs, **kwargs):
        bonds, angles, torsions, z_fixed = xs
        (x_fixed,), dlogp_ref = self._whiten._inverse((), (z_fixed,))
        (x,), dlogp_rel = self._rel_ic._inverse((), (bonds, angles, torsions, x_fixed))
        return (x,), dlogp_rel + dlogp_ref
