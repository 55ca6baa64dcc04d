"""Geometric (eigen) features from point neighborhoods.

TPU-native replacement for the reference's pgeof C++ library and its
torch GPU twin (reference: src/utils/geometry.py:80-360,
src/utils/scatter.py:41 scatter_pca). Everything is dense, masked
`[N, K]` math: masked mean, masked covariance, and a closed-form
batched 3x3 symmetric eigendecomposition — pure VPU work, no scatters,
no LAPACK.

Feature formulas follow SPG (ply_c.cpp) exactly as in the reference:
eigenvalues sqrt-ed, increasing order, epsilon terms 1e-3/1e-6/1e-9.
"""
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ['eigh_3x3', 'neighborhood_pca', 'geometric_features',
           'geometric_features_np']


def eigh_3x3(A, eps=1e-12):
    """Closed-form eigendecomposition of a batch of symmetric 3x3
    matrices. Returns (eigenvalues [..., 3] in INCREASING order,
    eigenvectors [..., 3, 3] with v[..., :, i] the i-th eigenvector),
    matching torch.linalg.eigh conventions used by the reference.

    Uses the trigonometric (Smith's) method for eigenvalues and
    cross-product construction for eigenvectors; robust to (near-)
    degenerate spectra via orthogonal-completion fallbacks.
    """
    A = jnp.asarray(A)
    dtype = A.dtype
    # Scale for numerical stability
    scale = jnp.maximum(jnp.max(jnp.abs(A), axis=(-2, -1), keepdims=True),
                        eps)
    B = A / scale

    q = jnp.trace(B, axis1=-2, axis2=-1) / 3.0
    Bq = B - q[..., None, None] * jnp.eye(3, dtype=dtype)
    p2 = jnp.sum(Bq * Bq, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, eps * eps))
    detBq = jnp.linalg.det(Bq / p[..., None, None])
    r = jnp.clip(detBq / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    # Eigenvalues in decreasing order then flipped to increasing
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    w = jnp.stack([e3, e2, e1], axis=-1)  # increasing

    # Handle the isotropic case (p2 ~ 0): all eigenvalues = q
    iso = p2 < eps
    w = jnp.where(iso[..., None], jnp.broadcast_to(q[..., None], w.shape), w)

    # Eigenvectors: for eigenvalue w_i, columns of prod over j!=i of
    # (B - w_j I) span the eigenspace. Use the largest-norm column.
    def eigvec(wi, wj, wk):
        M = (B - wj[..., None, None] * jnp.eye(3, dtype=dtype)) @ \
            (B - wk[..., None, None] * jnp.eye(3, dtype=dtype))
        # Columns of M; pick the one with the largest norm
        norms = jnp.sum(M * M, axis=-2)  # [..., 3]
        j = jnp.argmax(norms, axis=-1)
        v = jnp.take_along_axis(M, j[..., None, None], axis=-1)[..., 0]
        n = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True),
                                 eps * eps))
        return v / n

    v0 = eigvec(w[..., 0], w[..., 1], w[..., 2])
    v2 = eigvec(w[..., 2], w[..., 0], w[..., 1])
    # Third vector: orthogonal to the other two
    v1 = jnp.cross(v2, v0)
    n1 = jnp.sqrt(jnp.maximum(jnp.sum(v1 * v1, axis=-1, keepdims=True),
                              eps * eps))
    v1 = v1 / n1

    V = jnp.stack([v0, v1, v2], axis=-1)  # columns are eigenvectors

    # Isotropic fallback: identity basis
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), V.shape)
    V = jnp.where(iso[..., None, None], eye, V)

    w = w * scale[..., 0, 0][..., None]
    w = jnp.maximum(w, 0)
    return w, V


def neighborhood_pca(xyz, nbr_idx, nbr_mask):
    """Masked PCA of each point's neighborhood given dense padded
    neighbors. Covariance normalized by n (not n-1), matching
    scatter_pca (reference src/utils/scatter.py:73).

    :param xyz: [N, 3] float
    :param nbr_idx: [N, K] int — neighbor point ids (self included if
        desired); padded slots arbitrary
    :param nbr_mask: [N, K] bool — validity of each slot
    :return: (eigenvalues [N, 3] increasing, eigenvectors [N, 3, 3],
        sizes [N] int32)
    """
    m = nbr_mask.astype(xyz.dtype)[..., None]            # [N, K, 1]
    p = xyz[nbr_idx] * m                                 # [N, K, 3]
    n = jnp.maximum(jnp.sum(m, axis=1), 1.0)             # [N, 1]
    mean = jnp.sum(p, axis=1) / n                        # [N, 3]
    d = (p - mean[:, None, :]) * m                       # [N, K, 3]
    cov = jnp.einsum('nki,nkj->nij', d, d) / n[..., None]
    w, V = eigh_3x3(cov)
    sizes = jnp.sum(nbr_mask, axis=1).astype(jnp.int32)
    return w, V, sizes


def _features_from_eig(w, V, sizes, k_min):
    """SPG eigenfeatures (reference src/utils/geometry.py:295-340)."""
    l1 = jnp.sqrt(w[:, 2])
    l2 = jnp.sqrt(w[:, 1])
    l3 = jnp.sqrt(w[:, 0])

    linearity = (l1 - l2) / (l1 + 1e-3)
    planarity = (l2 - l3) / (l1 + 1e-3)
    scattering = l3 / (l1 + 1e-3)
    length = l1
    surface = jnp.sqrt(l1 * l2 + 1e-6)
    volume = jnp.power(l1 * l2 * l3 + 1e-9, 1.0 / 3.0)
    curvature = l3 / (l1 + l2 + l3 + 1e-3)

    # Verticality: |V| weighted by eigenvalues, z component / norm
    unary = jnp.sum(jnp.abs(V) * w[:, None, :], axis=2)  # [N, 3]
    verticality = unary[:, 2] / (jnp.linalg.norm(unary, axis=1) + 1e-8)

    normal = V[:, :, 0]  # smallest eigenvalue's eigenvector

    small = (sizes < k_min)[:, None].astype(w.dtype)
    keep = 1.0 - small
    feats = dict(
        linearity=linearity[:, None] * keep,
        planarity=planarity[:, None] * keep,
        scattering=scattering[:, None] * keep,
        verticality=verticality[:, None] * keep,
        curvature=curvature[:, None] * keep,
        length=length[:, None] * keep,
        surface=surface[:, None] * keep,
        volume=volume[:, None] * keep,
        normal=normal * keep)
    return feats


@partial(jax.jit, static_argnames=('k_min', 'k_step', 'k_min_search',
                                   'add_self', 'orient_normal_z',
                                   'verticality_x2'))
def geometric_features(
        xyz, nbr_idx, nbr_mask, k_min=5, k_step=-1, k_min_search=25,
        add_self=True, orient_normal_z=True, verticality_x2=True):
    """Per-point geometric features from dense padded neighborhoods.

    Mirrors reference `geometric_features` (src/utils/geometry.py:80):
    optionally prepends each point to its own neighborhood, computes
    either fixed-k PCA or the eigenentropy-optimal neighborhood size
    (Weinmann et al., `k_step`>0), applies the x2 verticality heuristic
    and Z+ normal orientation.
    """
    N = xyz.shape[0]
    if add_self:
        self_idx = jnp.arange(N, dtype=nbr_idx.dtype)[:, None]
        nbr_idx = jnp.concatenate([self_idx, nbr_idx], axis=1)
        nbr_mask = jnp.concatenate(
            [jnp.ones((N, 1), dtype=nbr_mask.dtype), nbr_mask], axis=1)

    K = nbr_idx.shape[1]
    if k_step < 0:
        w, V, sizes = neighborhood_pca(xyz, nbr_idx, nbr_mask)
    else:
        # Optimal neighborhood: evaluate PCA at k0, k0+k_step, ..., K
        # and keep the lowest-eigenentropy decomposition per point.
        k0 = max(k_min, k_min_search)
        ks = [k for k in range(k0, K + 1)
              if k == k0 or k % k_step == 0 or k == K]
        w, V, sizes = neighborhood_pca(
            xyz, nbr_idx[:, :k0], nbr_mask[:, :k0])
        ent = _eigenentropy(w)
        for k in ks[1:]:
            wk, Vk, sk = neighborhood_pca(
                xyz, nbr_idx[:, :k], nbr_mask[:, :k])
            entk = _eigenentropy(wk)
            better = entk < ent
            w = jnp.where(better[:, None], wk, w)
            V = jnp.where(better[:, None, None], Vk, V)
            sizes = jnp.where(better, sk, sizes)
            ent = jnp.where(better, entk, ent)

    feats = _features_from_eig(w, V, sizes, k_min)

    if verticality_x2:
        feats['verticality'] = feats['verticality'] * 2
    if orient_normal_z:
        flip = feats['normal'][:, 2:3] < 0
        feats['normal'] = jnp.where(flip, -feats['normal'], feats['normal'])
    return feats


def _eigenentropy(w, epsilon=1e-3):
    e = w / (jnp.sum(w, axis=1, keepdims=True) + epsilon)
    return jnp.sum(-e * jnp.log(e + epsilon), axis=1)


def geometric_features_np(
        xyz, nbr_idx, nbr_mask, k_min=5, k_step=-1, k_min_search=25,
        add_self=True, orient_normal_z=True, verticality_x2=True,
        chunk=200_000, raw_invalid=False):
    """Host (numpy/LAPACK) twin of `geometric_features` for the
    preprocessing path: preprocessing is host-orchestrated and pulling
    [N, ~9] features back from a remote device costs more than the
    whole computation (on the dev tunnel, catastrophically more).
    Chunked to bound the [chunk, K, 3] gather buffers.

    `raw_invalid=True` promises `nbr_idx` already carries -1 at every
    invalid slot (the KNN output convention): the native path then
    feeds the table to the C++ kernel with ONE int32 cast — no
    self-prepend concat, no where() masking pass (those two passes
    cost more than the eigensolver itself at aerial-tile sizes).

    Matches the device version numerically (same SPG formulas,
    covariance normalized by n, sqrt eigenvalues, x2 verticality,
    Z+ normals).
    """
    import numpy as np
    xyz = np.asarray(xyz, np.float32)
    nbr_idx = np.asarray(nbr_idx)
    nbr_mask = np.asarray(nbr_mask, bool)
    N = xyz.shape[0]

    native_out = None
    if k_step < 0:
        # C++/OpenMP kernel when built (native/eigen_features.cpp):
        # two-pass covariance straight off the index table + Jacobi
        # eigensolver — no [N, K, 3] gather buffers. Self-prepending
        # happens INSIDE the kernel (add_self), so the table goes in
        # as-is.
        from .native import eigen_features
        tab = (nbr_idx if raw_invalid
               else np.where(nbr_mask, nbr_idx, -1))
        native_out = eigen_features(xyz, tab, add_self=add_self)

    if add_self and native_out is None:
        # the numpy fallback paths need the explicit self column; the
        # native kernel already handled add_self internally
        nbr_idx = np.concatenate(
            [np.arange(N, dtype=nbr_idx.dtype)[:, None], nbr_idx], 1)
        nbr_mask = np.concatenate(
            [np.ones((N, 1), bool), nbr_mask], 1)
    K = nbr_idx.shape[1]

    def pca(idx_c, mask_c, xyz_full):
        m = mask_c.astype(np.float32)[..., None]
        p = xyz_full[idx_c] * m
        n = np.maximum(m.sum(1), 1.0)
        mean = p.sum(1) / n
        d = (p - mean[:, None, :]) * m
        cov = np.einsum('nki,nkj->nij', d, d,
                        optimize=True) / n[..., None]
        w, V = np.linalg.eigh(cov.astype(np.float64))
        return (np.maximum(w, 0).astype(np.float32),
                V.astype(np.float32),
                mask_c.sum(1).astype(np.int32))

    out = {k: [] for k in ('linearity', 'planarity', 'scattering',
                           'verticality', 'curvature', 'length',
                           'surface', 'volume', 'normal')}
    for s in range(0, N, chunk):
        e = min(s + chunk, N)
        if native_out is not None:
            w, V, sizes = (native_out[0][s:e], native_out[1][s:e],
                           native_out[2][s:e])
        elif k_step < 0:
            w, V, sizes = pca(np.clip(nbr_idx[s:e], 0, N - 1),
                              nbr_mask[s:e], xyz)
        else:
            idx_c = np.clip(nbr_idx[s:e], 0, N - 1)
            mask_c = nbr_mask[s:e]
            k0 = max(k_min, k_min_search)
            ks = [k for k in range(k0, K + 1)
                  if k == k0 or k % k_step == 0 or k == K]
            w, V, sizes = pca(idx_c[:, :k0], mask_c[:, :k0], xyz)
            ent = _eigenentropy_np(w)
            for k in ks[1:]:
                wk, Vk, sk = pca(idx_c[:, :k], mask_c[:, :k], xyz)
                entk = _eigenentropy_np(wk)
                b = entk < ent
                w[b], V[b], sizes[b], ent[b] = wk[b], Vk[b], sk[b], \
                    entk[b]

        l1 = np.sqrt(w[:, 2]); l2 = np.sqrt(w[:, 1])
        l3 = np.sqrt(w[:, 0])
        keep = (sizes >= k_min)[:, None].astype(np.float32)
        unary = (np.abs(V) * w[:, None, :]).sum(2)
        vert = unary[:, 2] / (np.linalg.norm(unary, axis=1) + 1e-8)
        normal = V[:, :, 0]
        if orient_normal_z:
            flip = normal[:, 2:3] < 0
            normal = np.where(flip, -normal, normal)
        if verticality_x2:
            vert = vert * 2
        vals = dict(
            linearity=((l1 - l2) / (l1 + 1e-3))[:, None],
            planarity=((l2 - l3) / (l1 + 1e-3))[:, None],
            scattering=(l3 / (l1 + 1e-3))[:, None],
            verticality=vert[:, None],
            curvature=(l3 / (l1 + l2 + l3 + 1e-3))[:, None],
            length=l1[:, None],
            surface=np.sqrt(l1 * l2 + 1e-6)[:, None],
            volume=np.power(l1 * l2 * l3 + 1e-9, 1 / 3)[:, None],
            normal=normal)
        for k2, v in vals.items():
            out[k2].append((v * keep).astype(np.float32))
    return {k: np.concatenate(v) for k, v in out.items()}


def _eigenentropy_np(w, epsilon=1e-3):
    import numpy as np
    e = w / (w.sum(1, keepdims=True) + epsilon)
    return (-e * np.log(e + epsilon)).sum(1)
