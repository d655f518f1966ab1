"""Out-of-core JOINT (value + gradient) model parity (linalg/outofcore.py
`ooc_fit_joint` / `OOCJointModel`): config 2 driven through the panel-
streamed factorization must match the dense joint path (gp/derivative.py)
to f64 exactness on CPU (interpret-mode kernels; SURVEY.md §5 item 3).

The joint system has J = 4C factor rows for C core points, so the
out-of-core machinery matters at 4x smaller clouds than the value path."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from gpis_tpu.gp import derivative as gpd
from gpis_tpu.gp import regression as gpr
from gpis_tpu.kernels import derivative as kd
from gpis_tpu.kernels import functions as kf
from gpis_tpu.kernels import gram as kg
from gpis_tpu.kernels import pallas_joint as pj
from gpis_tpu.linalg import outofcore as ooc

N, PANEL = 90, 64
LS, SV = 0.7, 1.1


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(17)
    x = rng.normal(size=(N, 3))
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    nrm = x.copy()  # unit sphere: outward normal == position
    y = np.zeros(N)
    params = kf.kernel_params(LS, SV)
    return (jnp.asarray(x, jnp.float64), jnp.asarray(y, jnp.float64),
            jnp.asarray(nrm, jnp.float64), params)


@pytest.fixture(scope="module")
def fitted(problem):
    x, y, nrm, params = problem
    m = ooc.ooc_fit_joint("rbf", x, y, nrm, 1e-4, 1e-3, params,
                          panel=PANEL, block=32, store="host")
    dm = gpd.fit_with_normals("rbf", x, y, nrm, jnp.full(N, 1e-4),
                              jnp.full(N, 1e-3), params, block=16,
                              pad_noise=1e10, dtype=jnp.float64)
    return m, dm


@pytest.mark.slow
def test_joint_quad_band_kernel_parity():
    """fused_joint_quad_band_pallas (interpret) vs the jnp cross + GEMM."""
    rng = np.random.default_rng(3)
    c = 64
    x = jnp.asarray(rng.normal(size=(c, 3)), jnp.float64)
    params = kf.kernel_params(LS, SV)
    cmeta = pj.joint_meta(x)
    j = 4 * c
    q = jnp.asarray(rng.normal(size=(40, 3)), jnp.float64)
    for row0, rows in ((0, 256), (0, 512), (256, 256)):
        # A plausible W band: lower-triangular-ish values, zeros beyond
        # the band's last global row (the kernel skips those tiles).
        w = rng.normal(size=(rows, j))
        cols = np.arange(j)[None, :]
        last = row0 + np.arange(rows)[:, None]
        w = jnp.asarray(np.where(cols <= last, w, 0.0), jnp.float64)
        got = pj.fused_joint_quad_band_pallas("rbf", q, cmeta, params, w,
                                              row0)
        kq = pj.joint_rows_ref(
            "rbf", (q, jnp.zeros((40, 3), jnp.float64),
                    jnp.ones((40,), jnp.float64)), cmeta, params)
        want = jnp.sum((w @ kq.T) ** 2, axis=0)
        # The kernel's quad uses in-kernel bf16x3 split dots with an f32
        # scratch (its TPU arithmetic is emulated in interpret mode too),
        # so parity is at the bf16x3 grade — same bound as the value-path
        # band quad test (tests/test_pallas_gram.py).
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_joint_rows_ref_matches_pallas_band():
    """The jnp fallback and the Pallas band kernel produce identical joint
    Gram row bands (incl. the diagonal-noise placement at a row offset)."""
    rng = np.random.default_rng(5)
    c = 64
    x = jnp.asarray(rng.normal(size=(c, 3)), jnp.float64)
    params = kf.kernel_params(LS, SV)
    coords, dirs, flag = pj.joint_meta(x)
    noise = jnp.asarray(rng.uniform(1e-4, 1e-2, size=4 * c))
    row0, rows = 64, 128
    rmeta = (coords[row0:row0 + rows], dirs[row0:row0 + rows],
             flag[row0:row0 + rows])
    noise_col = jnp.zeros((4 * c,)).at[row0:row0 + rows].set(
        noise[row0:row0 + rows])
    got = pj.joint_rows_pallas("rbf", rmeta, (coords, dirs, flag), params,
                               noise_col=noise_col, row0=row0)
    want = pj.joint_rows_ref("rbf", rmeta, (coords, dirs, flag), params,
                             noise_col=noise_col, row0=row0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)
    # And both match the dense joint Gram's rows.
    dense = kd.joint_gram("rbf", x, params, noise_f=noise[:c],
                          noise_g=noise[c:2 * c])
    # noise layout differs (joint_gram takes per-point noise); compare the
    # off-diagonal structure only.
    off = ~np.eye(4 * c, dtype=bool)[row0:row0 + rows]
    np.testing.assert_allclose(np.asarray(got)[off],
                               np.asarray(dense)[row0:row0 + rows][off],
                               atol=1e-12)


def test_ooc_joint_fit_predict_matches_dense(fitted):
    m, dm = fitted
    assert m.n0 == 96 and m.alpha.shape[0] == 4 * 96
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(33, 3)) * 0.8, jnp.float64)
    mean_o, var_o = m.predict(q)
    mean_d, var_d = gpd.predict(dm, q)
    np.testing.assert_allclose(np.asarray(mean_o), np.asarray(mean_d),
                               atol=1e-10)
    k0 = float(kf.k_diag0("rbf", m.params))
    np.testing.assert_allclose(np.asarray(var_o),
                               np.clip(np.asarray(var_d), 0.0, k0),
                               atol=1e-10)


@pytest.mark.slow
def test_ooc_joint_predict_mean_differentiable(fitted):
    """Newton projection path: gpr.predict_mean and its jax.grad work on
    the joint OOC model (cross_cov_value against the core coords)."""
    import jax

    m, dm = fitted
    q = jnp.asarray([[0.9, 0.1, 0.2]], jnp.float64)
    got = gpr.predict_mean(m, q)
    want = gpd.predict(dm, q)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-10)
    g = jax.grad(lambda p: gpr.predict_mean(m, p[None, :])[0])(q[0])
    gd = jax.grad(lambda p: gpr.predict_mean(dm, p[None, :])[0])(q[0])
    np.testing.assert_allclose(np.asarray(g), np.asarray(gd), atol=1e-8)
    # On the unit sphere the posterior-mean gradient points outward.
    assert float(jnp.dot(g, q[0])) > 0


@pytest.mark.slow
def test_ooc_joint_update_matches_dense_bordering(fitted, problem):
    x, y, nrm, params = problem
    m, _ = fitted
    rng = np.random.default_rng(11)
    tx = rng.normal(size=(3, 3))
    tx = jnp.asarray(tx / np.linalg.norm(tx, axis=1, keepdims=True) * 1.05,
                     jnp.float64)
    m2 = m.update(tx, jnp.zeros(3, jnp.float64), 1e-5, tail_capacity=8)
    assert m2.n_tail == 3

    # Dense reference: the bordered joint system solved directly.
    xp = m.x
    k = kd.joint_gram("rbf", xp, params, noise_f=m.noise, noise_g=m.noise_g)
    meta = pj.joint_meta(xp)
    tmeta = (tx, jnp.zeros((3, 3), jnp.float64), jnp.ones((3,), jnp.float64))
    kc = pj.joint_rows_ref("rbf", meta, tmeta, params)  # (J, 3)
    ktt = kg.gram_reference("rbf", tx, params,
                            noise=jnp.full(3, 1e-5, jnp.float64))
    kfull = jnp.block([[k, kc], [kc.T, ktt]])
    yf = jnp.concatenate([m.y, jnp.zeros(3, jnp.float64)])
    af = jnp.linalg.solve(kfull, yf)

    q = jnp.asarray(rng.normal(size=(21, 3)), jnp.float64)
    kq = jnp.concatenate([kd.cross_cov_value("rbf", q, xp, params),
                          kg.cross_cov("rbf", q, tx, params)], axis=1)
    mean_ref = kq @ af
    quad_ref = jnp.sum(kq * jnp.linalg.solve(kfull, kq.T).T, axis=1)
    k0 = float(kf.k_diag0("rbf", params))
    var_ref = jnp.clip(k0 - quad_ref, 0.0, k0)
    mean_o, var_o = m2.predict(q)
    np.testing.assert_allclose(np.asarray(mean_o), np.asarray(mean_ref),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(var_o), np.asarray(var_ref),
                               atol=1e-9)


def test_ooc_joint_mll_matches_dense(fitted):
    """MLL from the factorization byproducts == the direct dense formula
    on the same padded joint system (same pad-row correction)."""
    m, _ = fitted
    k = kd.joint_gram("rbf", m.x, m.params, noise_f=m.noise,
                      noise_g=m.noise_g)
    l = jnp.linalg.cholesky(k)
    u = jnp.linalg.solve(l, m.y)
    j = m.y.shape[0]
    want = (-0.5 * float(u @ u) - float(jnp.sum(jnp.log(jnp.diagonal(l))))
            - 0.5 * j * math.log(2 * math.pi))
    nf = np.asarray(m.noise)[m.n_real:]
    ng = np.asarray(m.noise_g)[m.n_real:]
    want += float(np.sum(0.5 * np.log(2 * np.pi * nf))
                  + 3.0 * np.sum(0.5 * np.log(2 * np.pi * ng)))
    got = m.log_marginal_likelihood()
    np.testing.assert_allclose(got, want, rtol=1e-9)


@pytest.mark.slow
def test_ooc_joint_checkpoint_roundtrip(fitted, tmp_path):
    from gpis_tpu.utils import checkpoint as ckpt

    m, _ = fitted
    rng = np.random.default_rng(13)
    tx = rng.normal(size=(2, 3))
    tx = jnp.asarray(tx / np.linalg.norm(tx, axis=1, keepdims=True) * 0.95,
                     jnp.float64)
    m2 = m.update(tx, jnp.zeros(2, jnp.float64), 1e-5, tail_capacity=8)
    path = str(tmp_path / "joint_ooc.npz")
    ckpt.save_model(path, m2)
    m3 = ckpt.load_model(path)
    assert isinstance(m3, ooc.OOCJointModel)
    assert m3.n0 == m2.n0 and m3.n_tail == 2
    q = jnp.asarray(rng.normal(size=(9, 3)), jnp.float64)
    for a, b in zip(m2.predict(q), m3.predict(q)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
    # Restored models keep updating (u and the tail round-trip).
    tx2 = jnp.asarray([[0.0, 0.0, 1.1]], jnp.float64)
    m4 = m3.update(tx2, jnp.zeros(1, jnp.float64), 1e-5)
    m5 = m2.update(tx2, jnp.zeros(1, jnp.float64), 1e-5)
    for a, b in zip(m4.predict(q), m5.predict(q)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_ooc_joint_tiered_spill_matches_host(problem):
    """device_budget=0 forces every panel through the host spill tier; the
    posterior must not change."""
    x, y, nrm, params = problem
    m_host = ooc.ooc_fit_joint("rbf", x, y, nrm, 1e-4, 1e-3, params,
                               panel=PANEL, block=32, store="host")
    m_sp = ooc.ooc_fit_joint("rbf", x, y, nrm, 1e-4, 1e-3, params,
                             panel=PANEL, block=32, store="tiered",
                             device_budget=0)
    rng = np.random.default_rng(23)
    q = jnp.asarray(rng.normal(size=(17, 3)), jnp.float64)
    for a, b in zip(m_host.predict(q), m_sp.predict(q)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_ooc_fit_joint_rejects_bad_panel(problem):
    x, y, nrm, params = problem
    with pytest.raises(ValueError, match="panel % 4"):
        ooc.ooc_fit_joint("rbf", x, y, nrm, 1e-4, 1e-3, params, panel=66)


@pytest.mark.slow
@pytest.mark.e2e
def test_session_out_of_core_joint_surface(tmp_path):
    """Every session verb on a normals + out_of_core fit: query, grid,
    mesh, update, is_done, next_best_path, hyperopt, save/restore."""
    from gpis_tpu.api.session import ObjectModelSession
    from gpis_tpu.config import ExploreConfig, ModelConfig
    from gpis_tpu.data import gpis

    pts = 0.08 * np.asarray(gpis.fibonacci_sphere(220, 1.0), np.float64)
    nrm = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    cfg = ModelConfig(voxel_leaf=0.0, lengthscale=0.7, grid_resolution=16)
    sess = ObjectModelSession(
        cfg, ExploreConfig(max_charts=8, n_disc_samples=8,
                           variance_threshold=0.3))
    sess.start(pts, normals=nrm, out_of_core=True)
    assert isinstance(sess.model, ooc.OOCJointModel)

    mean, var = sess.query(pts[:8])
    assert np.all(np.abs(mean) < 0.05) and np.all(var >= 0)
    verts, faces, vvar = sess.extract_surface(resolution=16)
    assert len(verts) and len(faces)
    r = np.linalg.norm(verts, axis=1)
    assert abs(np.median(r) - 0.08) < 0.02

    res = sess.next_best_path()
    assert len(res.path)
    sess.update(res.path[-1:])
    assert sess.model.n_tail == 1
    sess.is_done()

    opt = sess.optimize_hyperparameters(steps=3, subsample=128)
    assert np.isfinite(opt.mll)
    assert isinstance(sess.model, ooc.OOCJointModel)
    assert sess.model.n_tail == 0  # touches folded into the refit core

    # Full-data streamed exact-gradient method on the same session.
    opt2 = sess.optimize_hyperparameters(method="stream", steps=2)
    assert np.isfinite(opt2.mll) and len(opt2.history) == 2
    assert isinstance(sess.model, ooc.OOCJointModel)

    path = str(tmp_path / "sess_joint_ooc.npz")
    sess.save(path)
    sess2 = ObjectModelSession.load(path, cfg)
    m1, v1 = sess.query(pts[:8])
    m2, v2 = sess2.query(pts[:8])
    np.testing.assert_allclose(m1, m2, atol=1e-10)
    np.testing.assert_allclose(v1, v2, atol=1e-10)
    # Replay a pending touch through the restored session.
    sess2.update(res.path[-1:])
    assert sess2.model.n_tail == 1


@pytest.mark.slow
@pytest.mark.e2e
def test_service_out_of_core_joint_surface(tmp_path):
    """The HTTP node serves the joint OOC surface: /start with
    normals + out_of_core, /query, /update (tail bordering), /save, a
    fresh node /load, posterior parity (reference service loop, C7/C8)."""
    import json
    import threading
    import urllib.request

    from gpis_tpu.api.service import make_server
    from gpis_tpu.api.session import ObjectModelSession
    from gpis_tpu.config import ModelConfig
    from gpis_tpu.data import gpis

    def call(port, path, payload=None):
        url = f"http://127.0.0.1:{port}{path}"
        if payload is None:
            with urllib.request.urlopen(url, timeout=120) as r:
                return json.loads(r.read())
        req = urllib.request.Request(
            url, json.dumps(payload).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            return json.loads(r.read())

    pts = 0.08 * np.asarray(gpis.fibonacci_sphere(200, 1.0), np.float64)
    nrm = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    cfg = ModelConfig(voxel_leaf=0.0, lengthscale=0.7)
    # Touch OUTSIDE the scan at 1.3R — resolvable above the f32 quad
    # noise floor on a fully normal-constrained sphere (ROUND_NOTES).
    touch = (pts[0] / np.linalg.norm(pts[0]) * 0.08 * 1.3)[None, :]
    probe = (0.08 * np.asarray(gpis.fibonacci_sphere(32, 1.1),
                               np.float64)).tolist()
    ckpt_path = str(tmp_path / "service_joint_ooc.npz")

    srv1 = make_server(ObjectModelSession(cfg), port=0)
    port1 = srv1.server_address[1]
    threading.Thread(target=srv1.serve_forever, daemon=True).start()
    try:
        out = call(port1, "/start", {"points": pts.tolist(),
                                     "normals": nrm.tolist(),
                                     "out_of_core": True})
        assert out["ok"]
        got = call(port1, "/query", {"points": probe})
        assert np.isfinite(got["mean"]).all()
        assert (np.asarray(got["var"]) >= 0).all()
        v0 = call(port1, "/query", {"points": touch.tolist()})["var"][0]
        assert call(port1, "/update", {"points": touch.tolist()})["n_touch"] == 1
        v1 = call(port1, "/query", {"points": touch.tolist()})["var"][0]
        assert v1 < v0  # the touch collapses variance through the node
        assert call(port1, "/save", {"path": ckpt_path})["ok"]
        want = call(port1, "/query", {"points": probe})
    finally:
        srv1.shutdown()  # the crash

    srv2 = make_server(ObjectModelSession(cfg), port=0)
    port2 = srv2.server_address[1]
    threading.Thread(target=srv2.serve_forever, daemon=True).start()
    try:
        out = call(port2, "/load", {"path": ckpt_path})
        assert out["ok"] and out["n_touch"] == 1
        got = call(port2, "/query", {"points": probe})
        # Restored nodes keep updating (tail bordering on the loaded W).
        assert call(port2, "/update",
                    {"points": (touch * 1.02).tolist()})["n_touch"] == 2
    finally:
        srv2.shutdown()

    np.testing.assert_allclose(got["mean"], want["mean"], atol=1e-10)
    np.testing.assert_allclose(got["var"], want["var"], atol=1e-10)
