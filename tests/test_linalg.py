"""Linear-algebra tier tests: blocked Cholesky vs jnp.linalg.cholesky
(SURVEY.md §5 item 3)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpis_tpu.linalg import cholesky as lin


def _spd(rng, n):
    a = rng.normal(size=(n, n))
    return jnp.asarray(a @ a.T + n * np.eye(n))


@pytest.mark.parametrize("n,block", [(64, 32), (256, 64), (384, 128)])
def test_blocked_cholesky_matches_xla(n, block, rng):
    a = _spd(rng, n)
    want = jnp.linalg.cholesky(a)
    got = lin.blocked_cholesky(a, block=block)
    np.testing.assert_allclose(got, want, atol=1e-9)
    # strict lower-triangularity
    np.testing.assert_allclose(np.triu(np.asarray(got), 1), 0.0, atol=0.0)


def test_blocked_cholesky_bad_block(rng):
    with pytest.raises(ValueError):
        lin.blocked_cholesky(_spd(rng, 100), block=64)


def test_cho_solve(rng):
    a = _spd(rng, 96)
    l = lin.cholesky(a)
    b = jnp.asarray(rng.normal(size=96))
    x = lin.cho_solve(l, b)
    np.testing.assert_allclose(a @ x, b, atol=1e-8)
    bm = jnp.asarray(rng.normal(size=(96, 5)))
    xm = lin.cho_solve(l, bm)
    np.testing.assert_allclose(a @ xm, bm, atol=1e-8)


def test_blocked_cholesky_ad_matches_xla_grad(rng):
    """custom_vjp of the blocked factorization == XLA cholesky AD."""
    import jax

    n = 128
    a = _spd(rng, n)

    def f_blocked(a):
        l = lin.blocked_cholesky_ad(a, 32)
        return jnp.sum(jnp.log(jnp.diagonal(l))) + jnp.sum(l * 0.001)

    def f_xla(a):
        l = jnp.linalg.cholesky(a)
        return jnp.sum(jnp.log(jnp.diagonal(l))) + jnp.sum(l * 0.001)

    g1 = jax.grad(f_blocked)(a)
    g2 = jax.grad(f_xla)(a)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-9)


def test_cholesky_dispatch_small():
    """Small matrices stay on the XLA path regardless of backend."""
    a = jnp.eye(64) * 2.0
    np.testing.assert_allclose(lin.cholesky(a), jnp.sqrt(2.0) * jnp.eye(64), atol=1e-12)


def test_blocked_linv(rng):
    a = _spd(rng, 256)
    l = jnp.linalg.cholesky(a)
    w = lin.blocked_linv(l, 64)
    np.testing.assert_allclose(np.asarray(w @ l), np.eye(256), atol=1e-9)


def test_matmul_bf16x3_accuracy(rng):
    """3-pass bf16 split ~= f32-quality matmul (vs f64 reference)."""
    from gpis_tpu.linalg.matmul import matmul_bf16x3

    a = jnp.asarray(rng.normal(size=(128, 256)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(256, 64)), jnp.float32)
    ref = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    got3 = np.asarray(matmul_bf16x3(a, b), np.float64)
    got1 = np.asarray(
        jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32), np.float64)
    err3 = np.abs(got3 - ref).max() / np.abs(ref).max()
    err1 = np.abs(got1 - ref).max() / np.abs(ref).max()
    assert err3 < 5e-5, err3           # ~16-bit mantissa quality
    assert err3 < err1 / 20            # far better than single-pass bf16


def test_predict_bf16x3_precision_option(rng):
    """predict(precision='bf16x3') stays close to the exact posterior."""
    from gpis_tpu.data import gpis as gpis_mod
    from gpis_tpu.gp import regression as gpr_mod
    from gpis_tpu.kernels import functions as kf_mod

    pts = jnp.asarray(gpis_mod.fibonacci_sphere(100, 1.0), jnp.float32)
    params = {k: v.astype(jnp.float32)
              for k, v in kf_mod.kernel_params(0.8, 1.0).items()}
    m = gpr_mod.fit("rbf", pts, jnp.zeros(100, jnp.float32), 1e-4, params,
                    block=32, touch_capacity=0)
    m = gpr_mod.with_linv(m, block=32)
    q = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
    mean_e, var_e = gpr_mod.predict(m, q)
    mean_f, var_f = gpr_mod.predict(m, q, precision="bf16x3")
    np.testing.assert_allclose(np.asarray(mean_f), np.asarray(mean_e), atol=2e-4)
    np.testing.assert_allclose(np.asarray(var_f), np.asarray(var_e), atol=2e-3)


def test_pallas_blocked_cholesky(rng):
    """Pallas panel-update pipeline == XLA cholesky (interpret mode on CPU)."""
    from gpis_tpu.linalg.pallas_chol import pallas_blocked_cholesky

    n = 512
    a32 = np.asarray(_spd(rng, n), np.float32)
    a = jnp.asarray(a32)
    got = pallas_blocked_cholesky(a, block=256)
    want = jnp.linalg.cholesky(a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=5e-3)
    # Reconstruction check is the stronger gate in f32.
    rec = np.asarray(got) @ np.asarray(got).T
    np.testing.assert_allclose(rec, a32, rtol=1e-4, atol=1e-3)


def test_pallas_blocked_cholesky_sub_tile_block(rng):
    """block < _TN (e.g. 64 at n=256) enters the tiled Pallas path too —
    the l_row mask must be built at the (block, TK) resident-tile shape,
    not the (TN, TK) l-tile shape (regression: one shared mask
    shape-errored for every n % 256 == 0, block < 256 caller)."""
    from gpis_tpu.linalg.pallas_chol import pallas_blocked_cholesky

    a64 = _spd(rng, 256)
    a = jnp.asarray(np.asarray(a64))
    for block in (64, 128):
        got = pallas_blocked_cholesky(a, block=block)
        rec = np.asarray(got) @ np.asarray(got).T
        np.testing.assert_allclose(rec, np.asarray(a), rtol=1e-10,
                                   atol=1e-10)


def test_panel_update_pallas_matches_masked(rng):
    from gpis_tpu.linalg.pallas_chol import _PANEL_TILE, panel_update_pallas

    n, b = 1024, 256
    l = jnp.asarray(np.tril(rng.normal(size=(n, n))), jnp.float32)
    # Zero unfinished columns like the factorization loop does.
    j0 = 512
    l = l * (np.arange(n) < j0)[None, :].astype(np.float32)
    l_row = l[j0:j0 + b]
    a_panel = jnp.asarray(rng.normal(size=(n, b)), jnp.float32)
    got = panel_update_pallas(l, l_row, a_panel, j0, block=b)
    want = a_panel - l @ l_row.T
    # Contract: row TILES entirely above j0 are skipped (the factorization
    # discards those rows via its row mask) — they come back as raw
    # a_panel.  The skip boundary is tile-granular: derive it from the
    # kernel's tile size (r5: tunable, default 512).
    tn = _PANEL_TILE
    while n % tn or b > tn:
        tn //= 2
    skip = (j0 // tn) * tn  # rows in tiles that never reach below j0
    np.testing.assert_allclose(np.asarray(got)[skip:], np.asarray(want)[skip:],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got)[:skip],
                               np.asarray(a_panel)[:skip])
    assert skip > 0  # the fixture must actually exercise the dead-row skip


def test_blocked_cholesky_bf16x3(rng):
    """3-pass bf16 trailing updates keep the factor usable (reconstruction
    at ~1e-4 relative) — the speed/precision middle ground for TPU."""
    n = 256
    a = jnp.asarray(np.asarray(_spd(rng, n), np.float32))
    l = lin.blocked_cholesky(a, block=64, precision="bf16x3")
    rec = np.asarray(l, np.float64) @ np.asarray(l, np.float64).T
    rel = np.abs(rec - np.asarray(a, np.float64)).max() / np.abs(np.asarray(a)).max()
    assert rel < 5e-4, rel


def test_pallas_blocked_linv(rng):
    """Left-looking Pallas TRSM W = L^{-1} (interpret mode on CPU) matches
    the right-looking blocked TRSM and the dense inverse."""
    from gpis_tpu.linalg.pallas_chol import pallas_blocked_linv

    n = 512
    l = jnp.linalg.cholesky(_spd(rng, n))
    w = pallas_blocked_linv(l, 256)
    want = lin.blocked_linv(l, 256)
    np.testing.assert_allclose(np.asarray(w), np.asarray(want), atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(w @ l), np.eye(n), atol=1e-8
    )
    # Strict upper triangle stays zero (left-looking invariant).
    assert np.abs(np.triu(np.asarray(w), 1)).max() == 0.0


def test_row_update_pallas_matches_masked(rng):
    from gpis_tpu.linalg.pallas_chol import row_update_pallas

    n, b = 512, 256
    # Lower-triangular W: the kernel's output-tile skip assumes the TRSM
    # invariant W[:j0, j0:] == 0 (see row_update_pallas docstring).
    w = jnp.asarray(np.tril(rng.normal(size=(n, n))))
    l_row = jnp.asarray(rng.normal(size=(b, n)))
    for j0 in (0, 256):
        got = row_update_pallas(w, l_row, j0, block=b)
        cols = np.arange(n) < j0
        want = (np.asarray(l_row) * cols[None, :]) @ (np.asarray(w) * cols[:, None])
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-8)


@pytest.mark.slow
def test_mll_blocked_chol_impl_matches_dense(rng):
    """MLL value+gradient with the custom-VJP blocked factorization matches
    the dense XLA path (the N=16k+ hyperopt path, VERDICT r1 item 4)."""
    import jax

    from gpis_tpu.gp import regression as gpr
    from gpis_tpu.kernels import functions as kf

    n = 192
    x = jnp.asarray(rng.normal(size=(n, 3)))
    y = jnp.asarray(rng.normal(size=n) * 0.3)
    noise = jnp.full((n,), 1e-2)
    params = kf.kernel_params(0.9, 1.1)

    def mll(ls, impl):
        p = dict(params, lengthscale=ls)
        return gpr.log_marginal_likelihood("rbf", x, y, noise, p, chol_impl=impl)

    ls0 = jnp.asarray(0.9)
    blocked = lambda k: lin.blocked_cholesky_ad(k, 64)
    v1, g1 = jax.value_and_grad(mll)(ls0, jnp.linalg.cholesky)
    v2, g2 = jax.value_and_grad(mll)(ls0, blocked)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-10)
    np.testing.assert_allclose(float(g2), float(g1), rtol=1e-8)


def test_pallas_blocked_linv_inplace(rng):
    """In-place TRSM (W overwrites L in the carry) == two-buffer variant."""
    from gpis_tpu.linalg.pallas_chol import pallas_blocked_linv

    n = 512
    l = jnp.linalg.cholesky(_spd(rng, n))
    w1 = pallas_blocked_linv(l, 256)
    w2 = pallas_blocked_linv(l, 256, inplace=True)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w1), atol=1e-12)


def test_band_trail_update_pallas(rng):
    """Band trailing update (sharded right-looking TRSM step) matches the
    masked GEMM for banded and unbanded row offsets."""
    from gpis_tpu.linalg.pallas_chol import band_trail_update_pallas

    r, c, b = 512, 512, 256
    s = jnp.asarray(rng.normal(size=(r, c)), jnp.float32)
    l_col = jnp.asarray(rng.normal(size=(r, b)), jnp.float32)
    # wj must be a lower-triangular W row panel: cols >= j0+b are zero.
    for row0, j0 in [(0, 0), (0, 256), (512, 0)]:
        wj = np.asarray(rng.normal(size=(b, c)), np.float32)
        wj[:, j0 + b:] = 0.0
        got = band_trail_update_pallas(s, l_col, jnp.asarray(wj), j0,
                                       block=b, row0=row0)
        rows_g = row0 + np.arange(r)
        lt = np.asarray(l_col) * (rows_g >= j0 + b)[:, None]
        want = np.asarray(s) - lt @ wj
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@pytest.mark.parametrize("panel_solve", ["xla", "inv"])
def test_panel_solve_paths_parity(rng, panel_solve):
    """Both panel-solve strategies (r5: 'inv' = small-inverse + Pallas GEMM
    replaces the serial full-panel XLA trisolves; 'xla' = the original
    substitution path) must factor and invert to reconstruction parity."""
    from gpis_tpu.linalg.pallas_chol import (pallas_blocked_cholesky,
                                             pallas_blocked_linv)

    n = 512
    a64 = _spd(rng, n)
    a = jnp.asarray(np.asarray(a64))
    l = pallas_blocked_cholesky(a, block=256, panel_solve=panel_solve)
    rec = np.asarray(l) @ np.asarray(l).T
    np.testing.assert_allclose(rec, np.asarray(a), rtol=1e-10, atol=1e-10)
    for inplace in (False, True):
        w = pallas_blocked_linv(l, 256, inplace=inplace,
                                panel_solve=panel_solve)
        np.testing.assert_allclose(np.asarray(w) @ np.asarray(l), np.eye(n),
                                   atol=1e-9)
