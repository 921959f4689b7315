"""Pallas kernel parity tests (interpreter mode on CPU; the real
Mosaic path runs on TPU where the driver benches)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pangulu_tpu.ops import kernels_jax as kj

try:
    from pangulu_tpu.ops import kernels_pallas as kp

    _HAVE = True
except Exception:  # pragma: no cover
    _HAVE = False

pytestmark = pytest.mark.skipif(not _HAVE, reason="pallas unavailable")


@pytest.mark.parametrize("nb", [32, 128])
def test_pallas_getrf_inv_matches_jax(nb):
    rng = np.random.default_rng(0)
    a = (rng.standard_normal((nb, nb)) + nb * np.eye(nb)).astype(np.float32)
    f_p, linv_p, uinv_p = kp.getrf_with_inverses(jnp.asarray(a))
    f_j, linv_j, uinv_j = kj.getrf_with_inverses(jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_j),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(linv_p), np.asarray(linv_j),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(uinv_p), np.asarray(uinv_j),
                               rtol=2e-4, atol=2e-4)


def test_pallas_getrf_reconstructs():
    nb = 64
    rng = np.random.default_rng(1)
    a = (rng.standard_normal((nb, nb)) + nb * np.eye(nb)).astype(np.float32)
    f, linv, uinv = kp.getrf_with_inverses(jnp.asarray(a))
    f = np.asarray(f)
    l = np.tril(f, -1) + np.eye(nb, dtype=np.float32)
    u = np.triu(f)
    np.testing.assert_allclose(l @ u, a, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(linv) @ l, np.eye(nb),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(uinv) @ u, np.eye(nb),
                               rtol=1e-4, atol=1e-3)


def test_pallas_tiny_pivot():
    a = np.eye(8, dtype=np.float32)
    a[3, 3] = 0.0
    f = np.asarray(kp.getrf(jnp.asarray(a), tol=1e-8))
    assert f[3, 3] == np.float32(1e-8)


@pytest.mark.parametrize("nb", [32, 128])
def test_pallas_scan_inverses_match_newton(nb):
    """The scan-resident Gauss-Jordan inverses (default) and the
    Newton-Schulz doubling inverses are the same exact quantities --
    both must invert L and U to f32 accuracy on the same factor."""
    rng = np.random.default_rng(7)
    a = (rng.standard_normal((nb, nb)) + nb * np.eye(nb)).astype(np.float32)
    f_s, linv_s, uinv_s = kp.getrf_with_inverses(jnp.asarray(a), inv="scan")
    f_n, linv_n, uinv_n = kp.getrf_with_inverses(jnp.asarray(a), inv="newton")
    np.testing.assert_allclose(np.asarray(f_s), np.asarray(f_n),
                               rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(linv_s), np.asarray(linv_n),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(uinv_s), np.asarray(uinv_n),
                               rtol=2e-4, atol=2e-4)


def test_pallas_inv_mode_rejects_unknown():
    a = np.eye(8, dtype=np.float32)
    with pytest.raises(ValueError, match="inverse mode"):
        kp.getrf_with_inverses(jnp.asarray(a), inv="bogus")


@pytest.mark.parametrize("mode", ["blocked8", "blocked16", "blocked",
                                  ])
@pytest.mark.parametrize("nb", [128, 256])
def test_pallas_blocked_lu_matches_scan(mode, nb):
    """The MXU-blocked right-looking LU (r-column panels + one trailing
    MXU dot per panel) must match the rank-1 scan to f32 rounding and
    reconstruct A exactly."""
    rng = np.random.default_rng(11)
    a = (rng.standard_normal((nb, nb)) + nb * np.eye(nb)).astype(np.float32)
    f0, l0, u0 = kp.getrf_with_inverses(jnp.asarray(a), inv="newton")
    f1, l1, u1 = kp.getrf_with_inverses(jnp.asarray(a), inv=mode)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u0),
                               rtol=2e-4, atol=2e-4)
    f1 = np.asarray(f1)
    lm = np.tril(f1, -1) + np.eye(nb, dtype=np.float32)
    um = np.triu(f1)
    np.testing.assert_allclose(lm @ um, a, rtol=1e-4, atol=1e-3)


def test_pallas_blocked_lu_tiny_pivot():
    """Blocked mode applies the same tiny-pivot substitution rule."""
    a = np.eye(128, dtype=np.float32)
    a[3, 3] = 0.0
    f = np.asarray(kp.getrf_with_inverses(jnp.asarray(a), tol=1e-8,
                                          inv="blocked16")[0])
    assert f[3, 3] == np.float32(1e-8)


def test_pallas_rank2_scan_matches_single():
    """inv="newton2" (rank-2 fused scan steps) must match the
    single-step scan to f32 rounding."""
    nb = 64
    rng = np.random.default_rng(3)
    a = (rng.standard_normal((nb, nb)) + nb * np.eye(nb)).astype(np.float32)
    f1, l1, u1 = kp.getrf_with_inverses(jnp.asarray(a), inv="newton")
    f2, l2, u2 = kp.getrf_with_inverses(jnp.asarray(a), inv="newton2")
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2),
                               rtol=2e-4, atol=2e-4)
