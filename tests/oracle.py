"""Reference-parity oracle (SURVEY.md §5 item 2).

A tiny, slow, trusted NumPy/SciPy exact-GP implementation reproducing the
reference's Eigen math (dense Gram, LLT Cholesky, triangular solves) in
float64.  Every device-side path — jnp, Pallas kernels, blocked/sharded
Cholesky — must match this oracle to 1e-6 on posterior mean and variance
(BASELINE.md row 2).  Kept deliberately independent of gpis_tpu's JAX code:
only NumPy/SciPy here.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg as sla

# ---------------------------------------------------------------- kernels


def k_r2(name, r2, ls, sv):
    r2 = np.asarray(r2, np.float64)
    if name == "rbf":
        return sv * np.exp(-0.5 * r2 / (ls * ls))
    if name == "laplace":
        return sv * np.exp(-np.sqrt(r2) / ls)
    if name == "inverse_multiquadric":
        return sv / np.sqrt(r2 + ls * ls)
    if name == "thin_plate":
        r = np.sqrt(r2)
        return sv * (2.0 * r * r2 - 3.0 * ls * r2 + ls**3)
    raise ValueError(name)


def pairwise_r2(x, z):
    d = x[:, None, :] - z[None, :, :]
    return np.sum(d * d, axis=-1)


def gram(name, x, ls, sv, noise=None):
    k = k_r2(name, pairwise_r2(x, x), ls, sv)
    if noise is not None:
        k = k + np.diag(np.broadcast_to(noise, (len(x),)).astype(np.float64))
    return k


# ------------------------------------------------- derivative observations
# Joint covariance of (f(x), grad f(x)) per SURVEY.md §8 step 4. Layout is
# dimension-major: rows = [f(x_1..N), d1(x_1..N), d2(..), d3(..)].


def _dk_dr2(name, r2, ls, sv):
    if name == "rbf":
        return -0.5 / (ls * ls) * k_r2(name, r2, ls, sv)
    if name == "inverse_multiquadric":
        return -0.5 * sv * (r2 + ls * ls) ** (-1.5)
    if name == "thin_plate":
        return sv * 3.0 * (np.sqrt(r2) - ls)
    raise ValueError(name)


def _d2k_dr22(name, r2, ls, sv):
    if name == "rbf":
        return 0.25 / ls**4 * k_r2(name, r2, ls, sv)
    if name == "inverse_multiquadric":
        return 0.75 * sv * (r2 + ls * ls) ** (-2.5)
    if name == "thin_plate":
        with np.errstate(divide="ignore"):
            return sv * 1.5 / np.maximum(np.sqrt(r2), 1e-300)
    raise ValueError(name)


def cross_cov_grad(name, q, x, ls, sv):
    """cov(f(q_i), grad_x f(x_j)) blocks: returns (M, 3N) dimension-major."""
    diff = q[:, None, :] - x[None, :, :]  # (M, N, 3)
    r2 = np.sum(diff * diff, axis=-1)
    dk = _dk_dr2(name, r2, ls, sv)
    # d/dx' k(q, x') = -2 * dk_dr2 * (q - x')
    blocks = [-2.0 * dk * diff[:, :, d] for d in range(3)]
    return np.concatenate(blocks, axis=1)


def gram_joint(name, x, ls, sv, noise_f=None, noise_g=None):
    """Joint Gram over values and gradients at the same points x: (4N, 4N)."""
    n = len(x)
    diff = x[:, None, :] - x[None, :, :]
    r2 = np.sum(diff * diff, axis=-1)
    kff = k_r2(name, r2, ls, sv)
    dk = _dk_dr2(name, r2, ls, sv)
    d2k = _d2k_dr22(name, r2, ls, sv)
    # K_fg[i, (d,j)] = cov(f(x_i), d_d f(x_j)) = -2 dk (x_i - x_j)_d
    kfg = np.concatenate([-2.0 * dk * diff[:, :, d] for d in range(3)], axis=1)  # (N, 3N)
    # K_gg[(d,i),(e,j)] = cov(d_d f(x_i), d_e f(x_j))
    #                   = -2 dk delta_de - 4 d2k diff_d diff_e
    kgg = np.zeros((3 * n, 3 * n))
    for d in range(3):
        for e in range(3):
            blk = -4.0 * d2k * diff[:, :, d] * diff[:, :, e]
            if d == e:
                blk = blk - 2.0 * dk
            kgg[d * n : (d + 1) * n, e * n : (e + 1) * n] = blk
    k = np.block([[kff, kfg], [kfg.T, kgg]])
    if noise_f is not None:
        dn = np.concatenate(
            [np.broadcast_to(noise_f, (n,)), np.broadcast_to(noise_g, (3 * n,))]
        )
        k = k + np.diag(dn.astype(np.float64))
    return k


# ----------------------------------------------------------------- GP core


def fit(name, x, y, noise, ls, sv):
    k = gram(name, x, ls, sv, noise)
    L = sla.cholesky(k, lower=True)
    alpha = sla.cho_solve((L, True), y)
    return {"x": x, "L": L, "alpha": alpha, "name": name, "ls": ls, "sv": sv}

def predict(model, q):
    kq = k_r2(model["name"], pairwise_r2(q, model["x"]), model["ls"], model["sv"])
    mean = kq @ model["alpha"]
    v = sla.solve_triangular(model["L"], kq.T, lower=True)
    k0 = k_r2(model["name"], np.zeros(1), model["ls"], model["sv"])[0]
    var = k0 - np.sum(v * v, axis=0)
    return mean, var


def fit_joint(name, x, y_f, normals, noise_f, noise_g, ls, sv):
    """GP with derivative (surface-normal) observations.  Observation vector
    is [y_f; n_x; n_y; n_z] (dimension-major), matching gram_joint layout."""
    k = gram_joint(name, x, ls, sv, noise_f, noise_g)
    L = sla.cholesky(k, lower=True)
    yj = np.concatenate([y_f, normals[:, 0], normals[:, 1], normals[:, 2]])
    alpha = sla.cho_solve((L, True), yj)
    return {"x": x, "L": L, "alpha": alpha, "name": name, "ls": ls, "sv": sv}


def predict_joint(model, q):
    name, ls, sv, x = model["name"], model["ls"], model["sv"], model["x"]
    kq_f = k_r2(name, pairwise_r2(q, x), ls, sv)
    kq_g = cross_cov_grad(name, q, x, ls, sv)
    kq = np.concatenate([kq_f, kq_g], axis=1)
    mean = kq @ model["alpha"]
    v = sla.solve_triangular(model["L"], kq.T, lower=True)
    k0 = k_r2(name, np.zeros(1), ls, sv)[0]
    var = k0 - np.sum(v * v, axis=0)
    return mean, var


def log_marginal_likelihood(name, x, y, noise, ls, sv):
    k = gram(name, x, ls, sv, noise)
    L = sla.cholesky(k, lower=True)
    alpha = sla.cho_solve((L, True), y)
    return float(
        -0.5 * y @ alpha - np.sum(np.log(np.diag(L))) - 0.5 * len(x) * np.log(2 * np.pi)
    )
