"""C9/C10 tests: viz exports, config loading, and the CLI end-to-end
(fit -> mesh -> query -> explore -> update)."""

import json
import os

import numpy as np
import pytest

from gpis_tpu.cli.main import main as cli_main
from gpis_tpu.config import config_from_dict, load_config
from gpis_tpu.data import gpis
from gpis_tpu.viz import export


def test_variance_colormap():
    c = export.variance_colormap(np.array([0.0, 0.5, 1.0]))
    assert c.shape == (3, 3)
    np.testing.assert_allclose(c[0], [0.0, 0.2, 1.0])  # certain -> blue
    np.testing.assert_allclose(c[-1], [1.0, 0.2, 0.0])  # uncertain -> red


def test_export_isosurface_ply(tmp_path):
    verts = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
    faces = np.array([[0, 1, 2]])
    p = str(tmp_path / "m.ply")
    export.export_isosurface_ply(p, verts, faces, variance=np.array([0.0, 0.5, 1.0]))
    text = open(p).read()
    assert "element face 1" in text
    assert text.strip().endswith("3 0 1 2")


def test_export_html(tmp_path):
    p = str(tmp_path / "v.html")
    export.export_html(p, np.zeros((3, 3)), np.array([[0, 1, 2]]),
                       best_path=np.array([[0.0, 0, 0], [1, 1, 1]]))
    html = open(p).read()
    assert "gpis-tpu viewer" in html and '"path"' in html


def test_config_loading(tmp_path):
    cfgfile = tmp_path / "c.json"
    cfgfile.write_text(json.dumps({
        "model": {"kernel": "thin_plate", "lengthscale": 3.0},
        "explore": {"max_charts": 9},
        "mesh": {"n_devices": 4},
        "noise_surface": 1e-5,
    }))
    m, e, d = load_config(str(cfgfile))
    assert m.kernel == "thin_plate" and m.lengthscale == 3.0
    assert m.noise_surface == 1e-5  # flat key fallback
    assert e.max_charts == 9 and d.n_devices == 4


def test_config_bad_kernel():
    with pytest.raises(ValueError, match="unknown kernel"):
        config_from_dict({"model": {"kernel": "nope"}})


@pytest.mark.e2e
@pytest.mark.slow
def test_cli_end_to_end(tmp_path, capsys):
    os.chdir(tmp_path)
    pts = gpis.fibonacci_sphere(150, radius=0.5) + np.array([1.0, 0.0, 0.0])
    np.savez("cloud.npz", points=pts)

    assert cli_main(["fit", "cloud.npz", "-o", "model.npz",
                     "--lengthscale", "0.7", "--noise", "1e-5"]) == 0
    assert os.path.exists("model.npz")

    assert cli_main(["mesh", "model.npz", "-o", "surf.ply", "--resolution", "24",
                     "--extent", "1.4", "--html", "surf.html"]) == 0
    out = capsys.readouterr().out
    assert "verts" in out and os.path.exists("surf.ply") and os.path.exists("surf.html")

    assert cli_main(["query", "model.npz", "--points", "1,0,0;3,3,3"]) == 0
    out = capsys.readouterr().out
    lines = out.strip().splitlines()
    assert "f=" in lines[0]

    assert cli_main(["explore", "model.npz", "--max-charts", "8", "--json"]) == 0
    res = json.loads(capsys.readouterr().out)
    assert len(res["path"]) >= 1

    np.savez("touch.npz", points=pts[:3] * 1.0)
    assert cli_main(["update", "model.npz", "touch.npz", "-o", "model2.npz"]) == 0
    assert os.path.exists("model2.npz")

    # hyperopt verb on the joint (normals) model with the learn flags.
    nrm = (pts - np.array([1.0, 0.0, 0.0])) / 0.5
    np.savez("cloudn.npz", points=pts, normals=nrm)
    assert cli_main(["hyperopt", "cloudn.npz", "-o", "model3.npz",
                     "--steps", "5", "--normals", "--learn-noise-g",
                     "--learn-signal", "--lengthscale", "0.7",
                     "--noise", "1e-5"]) == 0
    out = capsys.readouterr().out
    assert "mll=" in out and os.path.exists("model3.npz")
