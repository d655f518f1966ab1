"""C7/C8 session + service tests: the full reference service loop
(start -> query -> next_best_path -> update -> done) plus checkpointing and
the HTTP shim."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from gpis_tpu.api.session import ObjectModelSession
from gpis_tpu.config import ExploreConfig, ModelConfig
from gpis_tpu.data import gpis, synthetic


@pytest.fixture()
def session():
    cfg = ModelConfig(kernel="rbf", lengthscale=0.7, noise_surface=1e-5,
                      n_external=32, touch_capacity=128, block=64)
    ecfg = ExploreConfig(max_charts=20, n_disc_samples=12, variance_threshold=0.3)
    return ObjectModelSession(cfg, ecfg)


def test_start_query_world_frame(session):
    # Off-center, scaled object: session must handle frames transparently.
    center, radius = np.array([2.0, -1.0, 0.5]), 0.3
    pts = gpis.fibonacci_sphere(200, radius=radius) + center
    session.start(pts)
    mean, var = session.query(np.array([
        center,                              # inside
        center + [radius, 0, 0],             # on surface
        center + [1.7 * radius, 0, 0],       # outside, inside the +1 shell
        center + [2.0, 0, 0],                # far: reverts to the 0 prior
    ]))
    assert mean[0] < -0.5  # inside
    assert abs(mean[1]) < 0.05  # on surface
    assert mean[2] > 0.2  # outside
    assert abs(mean[3]) < 0.05 and var[3] > var[1]  # prior reversion far away


def test_empty_cloud_raises(session):
    with pytest.raises(ValueError, match="non-empty"):
        session.start(np.zeros((0, 3)))
    with pytest.raises(RuntimeError, match="start"):
        session.query(np.zeros((1, 3)))


@pytest.mark.slow
def test_update_loop_reduces_uncertainty():
    cfg = ModelConfig(kernel="rbf", lengthscale=0.7, noise_surface=1e-5,
                      n_external=32, touch_capacity=128, block=64)
    ecfg = ExploreConfig(max_charts=20, n_disc_samples=12, variance_threshold=0.02)
    session = ObjectModelSession(cfg, ecfg)
    pts, _ = synthetic.partial_sphere_cloud(150, radius=0.5, cap_cos=0.0, seed=4)
    session.start(pts)
    assert not session.is_done()
    res = session.next_best_path()
    assert len(res.path) >= 2
    # "Touch" along the path: accept the planner's world-frame poses as
    # contacts on the true sphere (project to radius 0.5 like a real finger).
    touches = res.path / np.linalg.norm(res.path, axis=1, keepdims=True) * 0.5
    _, var_before = session.query(touches)
    session.update(touches)
    _, var_after = session.query(touches)
    assert np.all(var_after < var_before)


@pytest.mark.slow
def test_extract_surface_world_frame(session):
    center, radius = np.array([1.0, 2.0, 3.0]), 0.4
    pts = gpis.fibonacci_sphere(250, radius=radius) + center
    session.start(pts)
    verts, faces, var = session.extract_surface(resolution=32, extent=1.4)
    assert len(verts) > 300
    r = np.linalg.norm(verts - center, axis=1)
    assert abs(np.mean(r) - radius) < 0.02
    assert np.all(var >= -1e-9)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, session):
    pts = gpis.fibonacci_sphere(100, radius=0.7)
    session.start(pts)
    q = np.array([[0.0, 0.0, 0.0], [0.7, 0.0, 0.0]])
    m1, v1 = session.query(q)
    p = str(tmp_path / "model.npz")
    session.save(p)
    sess2 = ObjectModelSession.load(p)
    m2, v2 = sess2.query(q)
    np.testing.assert_allclose(m1, m2, atol=1e-12)
    np.testing.assert_allclose(v1, v2, atol=1e-12)


def test_http_service(session):
    from gpis_tpu.api.service import make_server

    srv = make_server(session, port=0)  # ephemeral port
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        def call(path, payload=None):
            url = f"http://127.0.0.1:{port}{path}"
            if payload is None:
                with urllib.request.urlopen(url, timeout=30) as r:
                    return json.loads(r.read())
            req = urllib.request.Request(
                url, json.dumps(payload).encode(), {"Content-Type": "application/json"}
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                return json.loads(r.read())

        assert call("/health")["ok"]
        pts = gpis.fibonacci_sphere(80, radius=0.5).tolist()
        assert call("/start", {"points": pts})["ok"]
        out = call("/query", {"points": [[0.0, 0.0, 0.0]]})
        assert out["mean"][0] < -0.5
        out = call("/update", {"points": [[0.5, 0.0, 0.0]]})
        assert out["n_touch"] == 1
        # Error path: malformed body -> 400 with an error message.
        try:
            call("/query", {"wrong_key": 1})
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())
    finally:
        srv.shutdown()


@pytest.mark.slow
def test_session_with_normals():
    """Config 2 through the session: normals tighten the model with few
    points, and the whole explore/update loop still works."""
    cfg = ModelConfig(kernel="rbf", lengthscale=0.9, noise_surface=1e-5,
                      n_external=16, block=32)
    sess = ObjectModelSession(cfg)
    pts = gpis.fibonacci_sphere(60, radius=0.5) + np.array([1.0, 0.0, 0.0])
    normals = (pts - np.array([1.0, 0.0, 0.0]))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    sess.start(pts, normals=normals)
    mean, var = sess.query(np.array([[1.0, 0.0, 0.0], [1.5, 0.0, 0.0]]))
    assert mean[0] < -0.5
    assert abs(mean[1]) < 0.05
    # Surface extraction works on the joint model too.
    verts, faces, v = sess.extract_surface(resolution=24, extent=1.3)
    r = np.linalg.norm(verts - np.array([1.0, 0.0, 0.0]), axis=1)
    assert abs(np.mean(r) - 0.5) < 0.02
    # Touch update on the joint model (refit path).
    t = np.array([[1.5, 0.0, 0.0]])
    _, v0 = sess.query(t)
    sess.update(t)
    _, v1 = sess.query(t)
    assert v1[0] < v0[0]
    sess.update(np.array([[1.0, 0.5, 0.0]]))  # second batch


@pytest.mark.slow
def test_session_sharded_mesh():
    """Config 5 through the session API on the 8-device virtual mesh."""
    import jax as _jax

    if len(_jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from gpis_tpu.config import MeshConfig

    cfg = ModelConfig(kernel="rbf", lengthscale=0.6, noise_surface=1e-4,
                      n_external=32, n_internal=1)
    sess = ObjectModelSession(cfg, mesh=MeshConfig(n_devices=8, block=64))
    pts = gpis.fibonacci_sphere(480, radius=0.5) + np.array([1.0, 0.0, 0.0])
    sess.start(pts)
    assert hasattr(sess.model, "mesh")
    mean, var = sess.query(np.array([[1.0, 0.0, 0.0], [1.5, 0.0, 0.0]]))
    assert mean[0] < -0.5 and abs(mean[1]) < 0.05
    # Matches the single-chip session posterior.
    single = ObjectModelSession(cfg).start(pts)
    m2, v2 = single.query(np.array([[1.0, 0.0, 0.0], [1.5, 0.0, 0.0]]))
    np.testing.assert_allclose(mean, m2, atol=1e-4)
    np.testing.assert_allclose(var, v2, atol=1e-4)
    # Surface extraction (sharded grid eval) works.
    verts, _, _ = sess.extract_surface(resolution=24, extent=1.3)
    r = np.linalg.norm(verts - np.array([1.0, 0.0, 0.0]), axis=1)
    assert abs(np.mean(r) - 0.5) < 0.02
    # Incremental update on the sharded model (distributed bordering):
    # touch an off-surface spot where the posterior is genuinely uncertain.
    t = np.array([[1.8, 0.0, 0.0]])
    _, v0 = sess.query(t)
    sess.update(t)
    _, v1 = sess.query(t)
    assert v1[0] < v0[0] * 0.5
    assert sess.model.n_touch == 1


def test_service_extended_endpoints(tmp_path):
    """/mesh, /save, /stats endpoints of the HTTP shim."""
    from gpis_tpu.api.service import make_server

    cfg = ModelConfig(kernel="rbf", lengthscale=0.7, noise_surface=1e-5,
                      n_external=16, block=32)
    sess = ObjectModelSession(cfg)
    srv = make_server(sess, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        def call(path, payload=None):
            url = f"http://127.0.0.1:{port}{path}"
            if payload is None:
                with urllib.request.urlopen(url, timeout=60) as r:
                    return json.loads(r.read())
            req = urllib.request.Request(
                url, json.dumps(payload).encode(), {"Content-Type": "application/json"}
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        pts = gpis.fibonacci_sphere(60, radius=0.5).tolist()
        assert call("/start", {"points": pts})["ok"]
        stats = call("/stats")
        assert stats["fit_s"] > 0
        mesh = call("/mesh?resolution=16")
        assert len(mesh["verts"]) > 50 and len(mesh["faces"]) > 20
        ck = str(tmp_path / "srv_model.npz")
        assert call("/save", {"path": ck})["ok"]
        sess2 = ObjectModelSession.load(ck)
        m, _ = sess2.query(np.array([[0.0, 0.0, 0.0]]))
        assert m[0] < -0.5
    finally:
        srv.shutdown()


@pytest.mark.slow
def test_export_exploration(tmp_path):
    """Chart + path HTML export from a partial scan."""
    cfg = ModelConfig(kernel="rbf", lengthscale=0.7, noise_surface=1e-5,
                      n_external=16, block=32)
    ecfg = ExploreConfig(max_charts=8, n_disc_samples=8, variance_threshold=0.3)
    sess = ObjectModelSession(cfg, ecfg)
    pts, _ = synthetic.partial_sphere_cloud(100, radius=0.5, cap_cos=0.0, seed=2)
    sess.start(pts)
    out = str(tmp_path / "exp.html")
    res = sess.export_exploration(out, resolution=16)
    html = open(out).read()
    assert '"charts"' in html and len(res.charts) >= 1
    assert '"center"' in html  # chart payload made it into the viewer


@pytest.mark.slow
def test_sharded_checkpoint_roundtrip(tmp_path):
    import jax as _jax

    if len(_jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from gpis_tpu.config import MeshConfig

    cfg = ModelConfig(kernel="rbf", lengthscale=0.6, noise_surface=1e-4, n_external=32)
    sess = ObjectModelSession(cfg, mesh=MeshConfig(n_devices=8, block=64))
    pts = gpis.fibonacci_sphere(480, radius=0.5)
    sess.start(pts)
    q = np.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]])
    m1, v1 = sess.query(q)
    p = str(tmp_path / "sharded.npz")
    sess.save(p)
    sess2 = ObjectModelSession.load(p)
    assert hasattr(sess2.model, "mesh")
    m2, v2 = sess2.query(q)
    np.testing.assert_allclose(m1, m2, atol=1e-6)
    np.testing.assert_allclose(v1, v2, atol=1e-6)


@pytest.mark.parametrize("kernel,ls", [
    pytest.param("thin_plate", 4.0, marks=pytest.mark.slow),  # 7 s; others <3 s
    pytest.param("inverse_multiquadric", 0.7, marks=pytest.mark.slow),
    ("laplace", 0.7),  # the one non-default kernel kept in the fast tier
])
def test_session_all_kernels_e2e(kernel, ls):
    """Every covariance function drives the full session loop."""
    cfg = ModelConfig(kernel=kernel, lengthscale=ls, noise_surface=1e-5,
                      n_external=24, block=32)
    sess = ObjectModelSession(cfg)
    pts = gpis.fibonacci_sphere(150, radius=0.5) + np.array([0.5, 0.5, 0.5])
    sess.start(pts)
    mean, var = sess.query(np.array([[0.5, 0.5, 0.5], [1.0, 0.5, 0.5]]))
    assert mean[0] < -0.5 and abs(mean[1]) < 0.1
    verts, _, _ = sess.extract_surface(resolution=24, extent=1.3)
    r = np.linalg.norm(verts - np.array([0.5, 0.5, 0.5]), axis=1)
    assert abs(np.mean(r) - 0.5) < 0.03
    sess.update(np.array([[1.0, 0.5, 0.5]]))
    assert int(sess.model.n_touch) == 1


@pytest.mark.slow
def test_sharded_hyperopt_subsample():
    import jax as _jax

    if len(_jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from gpis_tpu.config import MeshConfig

    cfg = ModelConfig(kernel="rbf", lengthscale=2.5, noise_surface=1e-4,
                      n_external=32, block=32, touch_capacity=32)
    sess = ObjectModelSession(cfg, mesh=MeshConfig(n_devices=8, block=32))
    pts = gpis.fibonacci_sphere(600, radius=0.5)
    sess.start(pts)
    res = sess.optimize_hyperparameters(steps=40, subsample=256, learn_noise=False)
    assert float(res.params["lengthscale"]) < 2.5  # moved off the bad init
    assert hasattr(sess.model, "mesh")  # still sharded after refit
    mean, _ = sess.query(np.array([[0.0, 0.0, 0.0]]))
    assert mean[0] < -0.5


@pytest.mark.slow
def test_session_sharded_with_normals():
    import jax as _jax

    if len(_jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from gpis_tpu.config import MeshConfig

    cfg = ModelConfig(kernel="rbf", lengthscale=0.8, noise_surface=1e-5,
                      n_external=16, block=64)
    sess = ObjectModelSession(cfg, mesh=MeshConfig(n_devices=8, block=64))
    pts = gpis.fibonacci_sphere(100, radius=0.5) + np.array([0.3, 0.0, 0.0])
    nrm = (pts - np.array([0.3, 0.0, 0.0])) / 0.5
    sess.start(pts, normals=nrm)
    assert hasattr(sess.model, "mesh") and sess.model.normals is not None
    mean, var = sess.query(np.array([[0.3, 0.0, 0.0], [0.8, 0.0, 0.0]]))
    assert mean[0] < -0.5 and abs(mean[1]) < 0.05
    # Matches the single-chip joint session.
    ref = ObjectModelSession(cfg).start(pts, normals=nrm)
    m2, v2 = ref.query(np.array([[0.3, 0.0, 0.0], [0.8, 0.0, 0.0]]))
    # f32 session dtype + different capacity padding: ~1e-4-level agreement.
    np.testing.assert_allclose(mean, m2, atol=5e-4)
    np.testing.assert_allclose(var, v2, atol=5e-4)
    # Incremental tactile update on the sharded joint model (tail-band
    # bordering): variance at the touched point must drop.
    touch = np.array([[0.8, 0.0, 0.0]])
    _, var_before = sess.query(touch)
    sess.update(touch)
    assert sess.model.n_touch == 1
    _, var_after = sess.query(touch)
    assert float(var_after[0]) < float(var_before[0])


@pytest.mark.slow
def test_session_distributed_hyperopt():
    """method="distributed" runs the exact mesh-wide MLL ascent and refits."""
    import jax as _jax

    if len(_jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from gpis_tpu.config import MeshConfig

    cfg = ModelConfig(kernel="rbf", lengthscale=1.2, noise_surface=1e-4,
                      n_external=32, n_internal=1, touch_capacity=0)
    sess = ObjectModelSession(cfg, mesh=MeshConfig(n_devices=8, block=32))
    pts = gpis.fibonacci_sphere(220, radius=0.5)
    sess.start(pts)
    res = sess.optimize_hyperparameters(method="distributed", steps=8,
                                        learning_rate=0.15)
    assert res.history[-1] >= res.history[0]  # MLL ascends
    assert hasattr(sess.model, "mesh")
    # The refit model still answers queries sanely.
    mean, _ = sess.query(np.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]]))
    assert mean[0] < -0.5 and abs(mean[1]) < 0.05


@pytest.mark.slow
def test_service_start_normals_and_out_of_core():
    """/start accepts normals (config-2 joint fit) and out_of_core (panel-
    streamed fit) options; the node serves /query from both."""
    import json as json_mod
    import threading
    import urllib.request

    from gpis_tpu.api.service import make_server
    from gpis_tpu.api.session import ObjectModelSession
    from gpis_tpu.config import ModelConfig

    def call(port, path, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", json_mod.dumps(payload).encode(),
            {"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            return json_mod.loads(r.read())

    rng = np.random.default_rng(3)
    pts = rng.normal(size=(150, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    cfg = ModelConfig(kernel="rbf", lengthscale=0.7, noise_surface=1e-4,
                      touch_capacity=8)

    srv = make_server(ObjectModelSession(cfg), port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        out = call(port, "/start", {"points": pts.tolist(),
                                    "normals": pts.tolist()})
        assert out["ok"]
        got = call(port, "/query", {"points": [[0.0, 0.0, 0.0]]})
        assert got["mean"][0] < -0.5  # joint fit sees the inside

        out = call(port, "/start", {"points": pts.tolist(),
                                    "out_of_core": True})
        assert out["ok"]
        got = call(port, "/query", {"points": [[0.0, 0.0, 0.0]]})
        assert got["mean"][0] < -0.5
        # The whole loop is served out-of-core: touch update, next best
        # path, checkpoint.
        touch = (pts[:1] * 1.02).tolist()
        v0 = call(port, "/query", {"points": touch})["var"][0]
        assert call(port, "/update", {"points": touch})["ok"]
        v1 = call(port, "/query", {"points": touch})["var"][0]
        assert v1 < v0
        import urllib.request as _ur
        with _ur.urlopen(f"http://127.0.0.1:{port}/next_best_path",
                         timeout=300) as r:
            nbp = json_mod.loads(r.read())
        assert len(nbp["path"]) >= 1

        # Expert-committee fit (the fast approximate path) over the wire.
        out = call(port, "/start", {"points": pts.tolist(), "experts": 4,
                                    "expert_gate": 2})
        assert out["ok"]
        got = call(port, "/query", {"points": [[0.0, 0.0, 0.0]]})
        assert got["mean"][0] < -0.5
        assert call(port, "/update", {"points": touch})["ok"]
    finally:
        srv.shutdown()
