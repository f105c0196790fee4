"""Matrix-free GMRES unit tests."""
import jax
import jax.numpy as jnp
import numpy as np

from vasp_tpu.fem.krylov import gmres


def test_gmres_spd():
    rng = np.random.default_rng(0)
    n = 50
    A = rng.standard_normal((n, n))
    A = A @ A.T + n * np.eye(n)
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    x, (rnorm, k, _it) = gmres(lambda v: Aj @ v, jnp.asarray(b), restart=25,
                          cycles=6, tol=1e-12)
    assert np.allclose(np.asarray(Aj @ x), b, atol=1e-8)


def test_gmres_nonsymmetric_preconditioned():
    rng = np.random.default_rng(1)
    n = 80
    A = np.diag(np.linspace(1, 100, n)) + 0.5 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    Minv = jnp.asarray(np.diag(1.0 / np.diag(A)))
    x, (rnorm, k, _it) = gmres(lambda v: Aj @ v, jnp.asarray(b),
                          M=lambda r: Minv @ r, restart=40, cycles=6,
                          tol=1e-12)
    assert np.linalg.norm(np.asarray(Aj @ x) - b) < 1e-7


def test_gmres_exact_in_n_iterations():
    """GMRES with restart >= n converges in one cycle."""
    rng = np.random.default_rng(2)
    n = 20
    A = rng.standard_normal((n, n)) + 5 * np.eye(n)
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    x, (rnorm, k, _it) = gmres(lambda v: Aj @ v, jnp.asarray(b), restart=n,
                          cycles=1, tol=1e-13)
    assert np.linalg.norm(np.asarray(Aj @ x) - b) < 1e-9
    assert int(k) == 1


def test_gmres_jittable():
    rng = np.random.default_rng(3)
    n = 30
    A = rng.standard_normal((n, n)) + 6 * np.eye(n)
    Aj = jnp.asarray(A)

    @jax.jit
    def solve(b):
        x, info = gmres(lambda v: Aj @ v, b, restart=15, cycles=8, tol=1e-11)
        return x

    b = jnp.asarray(rng.standard_normal(n))
    x = solve(b)
    assert np.linalg.norm(np.asarray(Aj @ x) - np.asarray(b)) < 1e-7


def test_gmres_zero_rhs():
    n = 10
    Aj = jnp.eye(n)
    x, (rnorm, k, _it) = gmres(lambda v: Aj @ v, jnp.zeros(n), restart=5, cycles=2)
    assert np.allclose(np.asarray(x), 0.0)
