"""Closed-form 3x3 determinant / inverse.

XLA:TPU has no f64 LU decomposition; all 3x3 linear algebra in the hot
element kernels uses these explicit cofactor formulas (also faster than LU
at this size on every backend)."""
import jax.numpy as jnp


def det3(A):
    """Determinant of (..., 3, 3)."""
    return (
        A[..., 0, 0] * (A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1])
        - A[..., 0, 1] * (A[..., 1, 0] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 0])
        + A[..., 0, 2] * (A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0])
    )


def inv3(A, det=None):
    """Inverse of (..., 3, 3) via adjugate."""
    if det is None:
        det = det3(A)
    c00 = A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1]
    c01 = A[..., 0, 2] * A[..., 2, 1] - A[..., 0, 1] * A[..., 2, 2]
    c02 = A[..., 0, 1] * A[..., 1, 2] - A[..., 0, 2] * A[..., 1, 1]
    c10 = A[..., 1, 2] * A[..., 2, 0] - A[..., 1, 0] * A[..., 2, 2]
    c11 = A[..., 0, 0] * A[..., 2, 2] - A[..., 0, 2] * A[..., 2, 0]
    c12 = A[..., 0, 2] * A[..., 1, 0] - A[..., 0, 0] * A[..., 1, 2]
    c20 = A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0]
    c21 = A[..., 0, 1] * A[..., 2, 0] - A[..., 0, 0] * A[..., 2, 1]
    c22 = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=-1),
            jnp.stack([c10, c11, c12], axis=-1),
            jnp.stack([c20, c21, c22], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def inv6(M):
    """Inverse of (..., 6, 6) via 2x2 block-Schur elimination with
    closed-form 3x3 inverses (XLA:TPU has no f64 LU; this stays exact-f64).

    M = [[A, B], [C, D]]; inv = [[A^-1 + A^-1 B S^-1 C A^-1, -A^-1 B S^-1],
                                 [-S^-1 C A^-1, S^-1]], S = D - C A^-1 B."""
    A = M[..., :3, :3]
    B = M[..., :3, 3:]
    C = M[..., 3:, :3]
    D = M[..., 3:, 3:]
    Ai = inv3(A)
    AiB = Ai @ B
    S = D - C @ AiB
    Si = inv3(S)
    CAi = C @ Ai
    top_left = Ai + AiB @ Si @ CAi
    top_right = -(AiB @ Si)
    bot_left = -(Si @ CAi)
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, Si], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
