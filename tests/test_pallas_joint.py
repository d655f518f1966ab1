"""Parity of the single flag-blended joint kernel (kernels/pallas_joint.py)
against the dense jnp reference (kernels/derivative.py) — interpret mode on
CPU, every public surface: full Gram (with/without touch slots), query
cross-covariance, and the fused query (mean, quad) against the explicit
W-GEMM chain."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpis_tpu.kernels import derivative as kd
from gpis_tpu.kernels import functions as kf
from gpis_tpu.kernels import gram as kg
from gpis_tpu.kernels import pallas_joint as pj


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _params():
    return {k: jnp.asarray(v, jnp.float32)
            for k, v in kf.kernel_params(0.8, 1.0).items()}


def _dense_joint(name, x, params, nf, ng, tx=None, tn=None):
    k = kd.joint_gram_reference(name, x, params, noise_f=nf, noise_g=ng)
    if tx is None:
        return k
    b = kd.cross_cov_value(name, tx, x, params)
    d = kg.gram_reference(name, tx, params, noise=tn)
    return jnp.block([[k, b.T], [b, d]])


@pytest.mark.parametrize("name", ["rbf", "thin_plate"])
def test_joint_gram_fused_parity(name, rng):
    x = jnp.asarray(rng.normal(size=(37, 3)), jnp.float32)
    params = _params()
    nf = jnp.asarray(rng.uniform(0.01, 0.02, 37), jnp.float32)
    ng = jnp.asarray(rng.uniform(0.02, 0.03, 37), jnp.float32)
    want = _dense_joint(name, x, params, nf, ng)
    got = pj.joint_gram_fused_pallas(name, x, params, nf, ng)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


@pytest.mark.slow
def test_joint_gram_fused_touch_slots(rng):
    x = jnp.asarray(rng.normal(size=(21, 3)), jnp.float32)
    tx = jnp.asarray(rng.normal(size=(9, 3)), jnp.float32)
    params = _params()
    nf = jnp.asarray(rng.uniform(0.01, 0.02, 21), jnp.float32)
    ng = jnp.asarray(rng.uniform(0.02, 0.03, 21), jnp.float32)
    tn = jnp.asarray(rng.uniform(0.01, 0.04, 9), jnp.float32)
    want = _dense_joint("rbf", x, params, nf, ng, tx, tn)
    got = pj.joint_gram_fused_pallas("rbf", x, params, nf, ng,
                                     touch_x=tx, touch_noise=tn)
    assert got.shape == (4 * 21 + 9, 4 * 21 + 9)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("name", ["rbf", "thin_plate"])
def test_joint_cross_value_parity(name, rng):
    x = jnp.asarray(rng.normal(size=(19, 3)), jnp.float32)
    tx = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(13, 3)), jnp.float32)
    params = _params()
    want = jnp.concatenate(
        [kd.cross_cov_value(name, q, x, params),
         kg.cross_cov(name, q, tx, params)], axis=1)
    got = pj.joint_cross_value_pallas(name, q, x, params, touch_x=tx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_cross_has_no_diagonal_noise(rng):
    """Query rows must NEVER pick up the diagonal-noise blend even when a
    query index collides with a column index numerically."""
    x = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    q = x[:4]  # queries exactly on data points
    params = _params()
    got = pj.joint_cross_value_pallas("rbf", q, x, params)
    want = kd.cross_cov_value("rbf", q, x, params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


@pytest.mark.slow
@pytest.mark.parametrize("staged", [False, True])
def test_fused_joint_query_parity(rng, staged):
    """(mean, quad) from the fused kernel == explicit kq/alpha/W chain on a
    real (well-conditioned) joint factor, including touch slots.  staged
    (r5): joint kq assembled once into HBM via joint_rows_pallas, quad via
    the shared metadata-free stage-B kernel."""
    from gpis_tpu.gp import derivative as gpd

    n = 50
    x = rng.normal(size=(n, 3)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    nrm = x.copy()
    y = np.zeros(n, np.float32)
    params = _params()
    model = gpd.fit_with_normals("rbf", jnp.asarray(x), jnp.asarray(y),
                                 jnp.asarray(nrm), 1e-4, 1e-4, params,
                                 block=64, touch_capacity=3)
    model = gpd.update_joint(model, jnp.asarray([[0.0, 0.0, 1.05]],
                                                jnp.float32), 0.0, 1e-5)
    model = gpd.with_linv_joint(model)
    q = jnp.asarray(rng.normal(size=(17, 3)), jnp.float32)

    kq = gpd.joint_cross_value(model, q)
    want_mean = jnp.dot(kq, model.alpha)
    v = jnp.dot(model.linv, kq.T)
    want_quad = jnp.sum(v * v, axis=0)

    # The fused path needs J % 256 == 0: pad the factor like the dispatch
    # does not (this test drives the kernel directly at an aligned size).
    j = model.chol.shape[0]
    jp = -(-j // 256) * 256
    w = jnp.zeros((jp, jp), model.dtype).at[:j, :j].set(model.linv)
    w = w.at[jnp.arange(j, jp), jnp.arange(j, jp)].set(1.0)
    alpha = jnp.zeros((jp,), model.dtype).at[:j].set(model.alpha)
    # Padding columns: inert far-away value points with zero alpha.
    pad_pts = jnp.full(((jp - j), 3), 1e6, model.dtype)
    tx = jnp.concatenate([model.touch_x, pad_pts])
    mean, quad = pj.fused_joint_query_pallas(
        "rbf", q, model.x, model.params, alpha, w, touch_x=tx,
        staged=staged)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(want_mean),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(quad), np.asarray(want_quad),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_joint_band_rows_parity(rng):
    """The Pallas band path used inside sharded_joint_gram (row0 offset +
    per-joint-index diagonal noise) matches the jnp band assembly."""
    from gpis_tpu.gp.sharded_joint import _joint_band_rows

    c, t = 18, 6
    x = jnp.asarray(rng.normal(size=(c, 3)), jnp.float32)
    tx = jnp.asarray(rng.normal(size=(t, 3)), jnp.float32)
    x_all = jnp.concatenate([x, tx])
    params = _params()
    nf = jnp.asarray(rng.uniform(0.01, 0.02, c + t), jnp.float32)
    ng = jnp.asarray(rng.uniform(0.02, 0.03, c), jnp.float32)
    j_tot = 4 * c + t
    band = 26  # deliberately unaligned
    for r0 in (0, band, j_tot - band):
        grows = r0 + jnp.arange(band)
        want = _joint_band_rows("rbf", x_all, params, nf, ng, grows, c)
        coords, dirs, flag = pj.joint_meta(x, tx)
        dn = pj._joint_noise(c, nf[:c], ng, nf[c:], jnp.float32)
        got = pj.joint_rows_pallas(
            "rbf", (coords[grows], dirs[grows], flag[grows]),
            (coords, dirs, flag), params, noise_col=dn, row0=r0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-6, atol=2e-6)
