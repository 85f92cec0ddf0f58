"""RDKit-free 3D conformer generation via classical distance geometry.

The reference's ``Ligand.load_from_smiles`` embeds conformers with RDKit's
srETKDGv3 (/root/reference/src/pmnet/scoring/ligand.py:87-107) and then
strips hydrogens, so only heavy-atom geometry ever reaches the scorer.
RDKit is an optional dependency of this rebuild; when it is absent this
module supplies a self-contained fallback so ``scoring_smiles`` keeps
working:

  1. bounds matrix from the connection table — bond lengths from covalent
     radii x bond-order factors, 1-3 distances from hybridization (and
     small-ring) angles, exact regular-polygon distance sets inside
     aromatic rings (which also makes them rigid, hence planar), van der
     Waals lower bounds elsewhere;
  2. triangle-inequality smoothing (Floyd-Warshall on both bounds);
  3. per-conformer random metric sampling + classical MDS embedding into
     3-D (eigendecomposition of the Gram matrix);
  4. violation-driven gradient refinement against the *raw* (unsmoothed)
     bounds.

Fidelity notes (documented deviation — see PARITY.md):

* Pharmacophore scores consume only pairwise feature distances, so they
  are invariant under reflection: tetrahedral chirality cannot change a
  score, and ignoring @/@@ here is exact, not an approximation.
* E/Z double-bond stereo is not enforced (the SMILES parser reads / and
  \\ as plain single bonds); both geometries may be sampled, which for
  scoring acts as extra conformer diversity.
* Ensembles are lower quality than ETKDG (no experimental-torsion terms);
  bond lengths/angles are near-ideal, torsions are sampled broadly. The
  match kernels bin distances at sigma >= 1 A, which this easily meets.
"""

from __future__ import annotations

import numpy as np

from .periodic import COVALENT_RADIUS
from .smallmol import Molecule

# van der Waals radii (Bondi) for non-bonded lower bounds
VDW_RADIUS: dict[int, float] = {
    1: 1.20, 5: 1.92, 6: 1.70, 7: 1.55, 8: 1.52, 9: 1.47, 14: 2.10,
    15: 1.80, 16: 1.80, 17: 1.75, 35: 1.85, 53: 1.98,
}
_DEFAULT_VDW = 1.8
_DEFAULT_COV = 0.77

# bond-length contraction per bond order (single=covalent-radius sum)
_ORDER_FACTOR = {1: 1.0, 2: 0.87, 3: 0.78, 4: 0.90, 5: 0.90}

_BIG = 1.0e6
# a refined conformer whose worst bound violation exceeds this is rejected
_FAIL_VIOLATION = 0.5


def _bond_length(mol: Molecule, a: int, b: int, order: int) -> float:
    ra = COVALENT_RADIUS.get(mol.atoms[a].atomic_num, _DEFAULT_COV)
    rb = COVALENT_RADIUS.get(mol.atoms[b].atomic_num, _DEFAULT_COV)
    return (ra + rb) * _ORDER_FACTOR.get(order, 1.0)


def _hybrid_angle(mol: Molecule, i: int) -> float:
    """Ideal bond angle (radians) at atom i from its bond orders.

    Hypervalent centers (sulfonamide S, phosphate P: >= 4 heavy
    neighbors) are tetrahedral no matter their double bonds — four
    neighbors at pairwise 120 deg is geometrically impossible and would
    frustrate the bounds matrix.
    """
    if mol.heavy_degree(i) >= 4:
        return np.deg2rad(109.47)
    orders = [b.order for b in mol.bonds_of(i)]
    n_double = sum(1 for o in orders if o == 2)
    if any(o == 3 for o in orders) or (n_double >= 2 and mol.heavy_degree(i) <= 2):
        return np.pi  # sp
    if mol.atoms[i].aromatic or n_double >= 1 or any(o in (4, 5) for o in orders):
        return 2.0 * np.pi / 3.0  # sp2
    return np.deg2rad(109.47)  # sp3


def _ring_angle(size: int, aromatic: bool) -> float:
    """Internal angle forced by a small ring."""
    if aromatic:
        return np.deg2rad(180.0 * (size - 2) / size)
    return np.deg2rad({3: 60.0, 4: 88.0, 5: 103.0}.get(size, 109.47))


def _bounds(mol: Molecule) -> tuple[np.ndarray, np.ndarray]:
    """Raw lower/upper distance-bound matrices [N, N] (diagonal 0)."""
    n = mol.num_atoms
    lower = np.zeros((n, n))
    upper = np.full((n, n), _BIG)
    np.fill_diagonal(upper, 0.0)

    # default non-bonded lower bound: scaled vdW contact
    vdw = np.array(
        [VDW_RADIUS.get(a.atomic_num, _DEFAULT_VDW) for a in mol.atoms]
    )
    lower[:] = 0.8 * (vdw[:, None] + vdw[None, :])
    np.fill_diagonal(lower, 0.0)

    def pin(a: int, b: int, dist: float, tol: float) -> None:
        lower[a, b] = lower[b, a] = max(dist - tol, 0.0)
        upper[a, b] = upper[b, a] = dist + tol

    # 1-2: bond lengths
    blen: dict[tuple[int, int], float] = {}
    for bond in mol.bonds:
        d = _bond_length(mol, bond.a, bond.b, bond.order)
        blen[(bond.a, bond.b)] = blen[(bond.b, bond.a)] = d
        pin(bond.a, bond.b, d, 0.01)

    # smallest ring containing each (j, i, k) angle triple
    ring_of: dict[tuple[int, int, int], tuple[int, bool]] = {}
    for ring in mol.rings():
        rs = set(ring)
        arom = all(mol.atoms[i].aromatic for i in ring)
        for i in ring:
            nbrs = [v for v in mol.neighbors(i) if v in rs]
            for a in nbrs:
                for b in nbrs:
                    if a < b:
                        key = (a, i, b)
                        if key not in ring_of or len(ring) < ring_of[key][0]:
                            ring_of[key] = (len(ring), arom)

    # 1-3: law of cosines with hybridization / ring angles
    for i in range(n):
        nbrs = mol.neighbors(i)
        theta_default = _hybrid_angle(mol, i)
        for x in range(len(nbrs)):
            for y in range(x + 1, len(nbrs)):
                j, k = nbrs[x], nbrs[y]
                key = (min(j, k), i, max(j, k))
                if key in ring_of:
                    size, arom = ring_of[key]
                    theta = _ring_angle(size, arom)
                else:
                    theta = theta_default
                dij, dik = blen[(i, j)], blen[(i, k)]
                d = np.sqrt(
                    dij * dij + dik * dik - 2.0 * dij * dik * np.cos(theta)
                )
                if upper[j, k] >= _BIG:  # don't override a ring-bond pin
                    pin(j, k, d, 0.06)

    # aromatic rings: exact regular-polygon distance sets (rigid => planar)
    for ring in mol.aromatic_rings():
        m = len(ring)
        ring_l = [blen.get((ring[x], ring[(x + 1) % m])) for x in range(m)]
        ring_l = [d for d in ring_l if d is not None]
        if not ring_l:
            continue
        side = float(np.mean(ring_l))
        circum = side / (2.0 * np.sin(np.pi / m))
        for x in range(m):
            for y in range(x + 2, m):
                sep = min(y - x, m - (y - x))
                if sep < 2:
                    continue
                d = 2.0 * circum * np.sin(np.pi * sep / m)
                pin(ring[x], ring[y], d, 0.02)

    return lower, upper


def _smooth(lower: np.ndarray, upper: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Triangle-inequality smoothing (Floyd-Warshall over both bounds)."""
    up = upper.copy()
    lo = lower.copy()
    n = up.shape[0]
    for k in range(n):
        up = np.minimum(up, up[:, k, None] + up[None, k, :])
    for k in range(n):
        lo = np.maximum(lo, lo[:, k, None] - up[None, k, :])
        lo = np.maximum(lo, lo[None, k, :] - up[:, k, None])
    # disconnected fragments: keep them embeddable at a finite offset
    finite = up[up < _BIG]
    cap = (finite.max() if finite.size else 10.0) + 10.0
    up = np.minimum(up, cap)
    lo = np.minimum(lo, up)
    return lo, up


def _embed_batch(
    lo: np.ndarray, up: np.ndarray, rng: np.random.Generator, count: int
) -> np.ndarray:
    """Sample `count` metrics within bounds; batched classical MDS to 3-D.

    Returns [count, N, 3]. All conformers embed in one [C, N, N] batch —
    the per-iteration numpy dispatch overhead at drug-like N would
    otherwise dominate the whole .smi prepack path.
    """
    n = lo.shape[0]
    if n == 1:
        return np.zeros((count, 1, 3))
    u = rng.random((count, n, n))
    u = np.triu(u, 1)
    u = u + np.swapaxes(u, 1, 2)
    dist = lo[None] + u * (up - lo)[None]
    d2 = dist * dist
    row = d2.mean(axis=2, keepdims=True)
    col = d2.mean(axis=1, keepdims=True)
    tot = d2.mean(axis=(1, 2), keepdims=True)
    gram = -0.5 * (d2 - row - col + tot)
    w, v = np.linalg.eigh(gram)
    w3 = np.clip(w[:, -3:], 0.0, None)
    x = v[:, :, -3:] * np.sqrt(w3)[:, None, :]
    if n == 2:  # rank-1 Gram: eigh may order the spread axis anywhere
        x = np.zeros((count, 2, 3))
        x[:, 1, 0] = dist[:, 0, 1]
    return x


def _refine(
    x: np.ndarray,
    lo: np.ndarray,
    up: np.ndarray,
    iters: int = 600,
    tol: float = 0.05,
) -> np.ndarray:
    """Gradient descent on the squared bound-violation stress.

    x: [C, N, 3] — every conformer refines in the same vectorized loop;
    converged conformers drop out of the batch while the rest keep
    iterating. Returns (coords, worst bound violation per conformer).
    """
    n = x.shape[1]
    if n < 2:
        return x, np.zeros(x.shape[0])
    eye = np.eye(n, dtype=bool)
    lr = 0.12
    max_step = 0.25  # per-atom displacement cap per iteration (Angstrom)
    out = x.copy()
    final_worst = np.zeros(x.shape[0])
    idx = np.arange(x.shape[0])  # conformers still iterating
    for t in range(iters):
        diff = x[:, :, None, :] - x[:, None, :, :]
        d = np.sqrt((diff * diff).sum(-1))
        d[:, eye] = 1.0
        over = np.maximum(d - up[None], 0.0)
        under = np.maximum(lo[None] - d, 0.0)
        viol = over - under
        viol[:, eye] = 0.0  # the d[eye]=1.0 placeholder is not a violation
        # over/under are elementwise exclusive, so |viol| == max(over, under)
        worst = np.abs(viol).max(axis=(1, 2))
        final_worst[idx] = worst
        live = worst >= tol
        if not live.all():  # converged conformers leave the batch
            out[idx[~live]] = x[~live]
            idx, x = idx[live], x[live]
            if idx.size == 0:
                return out, final_worst
        coef = viol[live] / np.maximum(d[live], 0.05)
        grad = 4.0 * (coef[:, :, :, None] * diff[live]).sum(axis=2)
        step = (lr / (1.0 + t / 150.0)) * grad
        norms = np.sqrt((step * step).sum(-1, keepdims=True))
        step *= np.minimum(1.0, max_step / np.maximum(norms, 1e-12))
        x = x - step
    out[idx] = x
    return out, final_worst


def embed_conformers(
    mol: Molecule, num_conformers: int, seed: int = 2025
) -> np.ndarray:
    """Generate [num_conformers, N_heavy, 3] float32 coordinates.

    Deterministic for a given (molecule, num_conformers, seed). The
    molecule must be heavy-atom-only (``parse_smiles`` output qualifies);
    hydrogens are never embedded because the scorer strips them anyway
    (reference ligand.py:80-84).
    """
    if num_conformers < 1:
        raise ValueError("num_conformers must be >= 1")
    if any(a.atomic_num == 1 for a in mol.atoms):
        mol = mol.strip_hydrogens()
    n = mol.num_atoms
    if n == 0:
        raise ValueError("cannot embed an empty molecule")
    raw_lo, raw_up = _bounds(mol)
    lo, up = _smooth(raw_lo, raw_up)
    rng = np.random.default_rng(seed)
    x = _embed_batch(lo, up, rng, num_conformers)
    x, worst = _refine(x, raw_lo, raw_up)
    # quality gate: a conformer whose refinement plateaued far outside
    # the bounds is garbage geometry, not a conformer — resample it
    # rather than silently score it
    for _ in range(2):
        bad = worst > _FAIL_VIOLATION
        if not bad.any():
            break
        xr = _embed_batch(lo, up, rng, int(bad.sum()))
        xr, wr = _refine(xr, raw_lo, raw_up)
        better = wr < worst[bad]
        replace = np.where(bad)[0][better]
        x[replace] = xr[better]
        worst[replace] = wr[better]
    if (worst > _FAIL_VIOLATION).any():
        raise ValueError(
            f"distance-geometry embedding failed for {mol.title or 'molecule'}: "
            f"worst bound violation {worst.max():.2f} A after retries"
        )
    return x.astype(np.float32)
