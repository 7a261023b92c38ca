"""Modal analysis and component-mode reduction.

Counterpart of the reference's chrono_modal module
(/root/reference/src/chrono_modal: ChModalAssembly Craig–Bampton-style
substructuring, eigensolvers): undamped modes of the linearized (K, M) pair and
fixed-interface Craig–Bampton reduction.  Systems at this layer are dense
(10²–10⁴ DOF flexible components) — scipy's generalized symmetric eigensolver
on host is the right tool; the reduced bases are then used on-device.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from chrono_tpu.fea.cable import CableMesh, mass_matrix
from chrono_tpu.fea.dynamics import make_force_fn, _fixed_dof_mask


def linearized_KM(mesh: CableMesh, q, n_nodes: int):
    """Tangent stiffness (autodiff of the internal forces) and mass matrix
    about configuration q, with fixed DOFs eliminated.

    Returns (K_ff, M_ff, free_index) as numpy arrays.
    """
    force = make_force_fn(mesh, n_nodes)
    qf = jnp.asarray(q).reshape(-1)
    K = -jax.jacfwd(lambda x: force(x, jnp.zeros_like(x)))(qf)
    M = mass_matrix(mesh, n_nodes)
    free = ~np.asarray(_fixed_dof_mask(mesh, n_nodes))
    idx = np.where(free)[0]
    return (np.asarray(K)[np.ix_(idx, idx)],
            np.asarray(M)[np.ix_(idx, idx)], idx)


def eigenmodes(K, M, n_modes=10):
    """Undamped natural frequencies [Hz] and mass-normalized mode shapes."""
    from scipy.linalg import eigh

    w2, V = eigh(np.asarray(K, float), np.asarray(M, float))
    keep = np.argsort(w2)
    w2 = np.clip(w2[keep], 0.0, None)[:n_modes]
    V = V[:, keep][:, :n_modes]
    freqs = np.sqrt(w2) / (2 * np.pi)
    return freqs, V


def fea_modes(mesh: CableMesh, q, n_modes=10):
    """Natural modes of a cable mesh about configuration q."""
    n_nodes = np.asarray(q).reshape(-1, 6).shape[0]
    K, M, idx = linearized_KM(mesh, q, n_nodes)
    freqs, V = eigenmodes(K, M, n_modes)
    # scatter back to full DOF vectors
    shapes = np.zeros((n_nodes * 6, V.shape[1]))
    shapes[idx] = V
    return freqs, shapes.reshape(n_nodes, 6, -1)


def craig_bampton(K, M, boundary: np.ndarray, n_modes=10):
    """Fixed-interface Craig–Bampton reduction.

    boundary: bool mask over DOFs kept as physical interface coordinates.
    Returns (T, K_red, M_red): T maps [interface; modal] → full DOFs.
    """
    from scipy.linalg import eigh, solve

    K = np.asarray(K, float)
    M = np.asarray(M, float)
    b = np.where(boundary)[0]
    i = np.where(~boundary)[0]
    Kii = K[np.ix_(i, i)]
    Kib = K[np.ix_(i, b)]
    # static (Guyan) constraint modes
    Psi = -solve(Kii, Kib)
    # fixed-interface normal modes
    w2, Phi = eigh(Kii, M[np.ix_(i, i)])
    Phi = Phi[:, np.argsort(w2)[:n_modes]]

    n = K.shape[0]
    T = np.zeros((n, len(b) + n_modes))
    T[b, : len(b)] = np.eye(len(b))
    T[i, : len(b)] = Psi
    T[i, len(b):] = Phi
    return T, T.T @ K @ T, T.T @ M @ T
