"""Shared test helpers."""

import numpy as np


def assert_images_close(actual, desired, *, q=0.99, tol=5e-4, max_tol=0.12,
                        err_msg=""):
    """Image comparison robust to the reference semantics' grazing-incidence
    discontinuity: a ray tangent to the χ²=3 ellipsoid jumps from α=0 to
    α=opacity·e⁻³ (gaussian.py:203-230 makes this inherent, not a bug), so
    two f32 evaluations of the same quadratic can flip hit/miss on a
    measure-zero set of silhouette pixels.

    Asserts the q-quantile of |diff| is below ``tol`` (bulk parity) and the
    max below ``max_tol`` (any flip is bounded by one boundary alpha).
    """
    a, d = np.asarray(actual), np.asarray(desired)
    assert a.shape == d.shape, f"shape {a.shape} != {d.shape} {err_msg}"
    diff = np.abs(a - d)
    qv = np.quantile(diff, q)
    assert qv < tol, (
        f"{q:.3f}-quantile |diff| = {qv:.2e} >= {tol:.2e} {err_msg}")
    assert diff.max() < max_tol, (
        f"max |diff| = {diff.max():.2e} >= {max_tol:.2e} {err_msg}")
