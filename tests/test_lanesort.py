"""Bitonic lane-sort network (ops/lanesort.py) vs numpy — exact order and
tie-breaking, since the peel kernel's parity depends on "earlier candidate
wins" at equal depth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtgs_tpu.ops.lanesort import merge_sorted, reverse_half, sort_by_key


@pytest.mark.parametrize("n", [16, 32, 128])
def test_sort_matches_lexsort(rng, n):
    key = jnp.asarray(rng.uniform(0.0, 4.0, (3, 8, n)), jnp.float32)
    # Force plenty of ties.
    key = jnp.round(key * 4.0) / 4.0
    ordv = jnp.asarray(
        np.broadcast_to(np.arange(n, dtype=np.float32), (3, 8, n)))
    pay = jnp.asarray(rng.normal(size=(3, 8, n)), jnp.float32)

    ks, os_, (ps,) = jax.jit(
        lambda k, o, p: sort_by_key(k, o, (p,), use_pltpu=False)
    )(key, ordv, pay)

    k_np = np.asarray(key)
    for b in range(3):
        for p in range(8):
            perm = np.lexsort((np.arange(n), k_np[b, p]))
            np.testing.assert_array_equal(np.asarray(ks)[b, p],
                                          k_np[b, p][perm])
            np.testing.assert_array_equal(np.asarray(os_)[b, p],
                                          perm.astype(np.float32))
            np.testing.assert_array_equal(np.asarray(ps)[b, p],
                                          np.asarray(pay)[b, p][perm])


def test_sort_inf_padding(rng):
    """+inf keys (vacant lanes) sink to the end, order preserved."""
    key = jnp.asarray(rng.uniform(0, 1, (2, 4, 32)), jnp.float32)
    key = key.at[..., ::3].set(jnp.inf)
    ordv = jnp.broadcast_to(jnp.arange(32, dtype=jnp.float32), key.shape)
    ks, os_, _ = sort_by_key(key, ordv, (), use_pltpu=False)
    k = np.asarray(ks)
    # non-decreasing (inf-inf is nan, so compare pairwise, not via diff)
    assert np.all((k[..., 1:] >= k[..., :-1]) | np.isinf(k[..., :-1]))
    # ties among inf broken by ord ascending
    o = np.asarray(os_)
    inf_mask = ~np.isfinite(k)
    for b in range(2):
        for p in range(4):
            oo = o[b, p][inf_mask[b, p]]
            assert np.all(np.diff(oo) > 0)


def test_merge_two_sorted_halves(rng):
    """ascending ++ reversed(ascending) -> merge_sorted == full sort."""
    a = np.sort(rng.uniform(0, 1, (5, 8, 16)), axis=-1)
    b = np.sort(rng.uniform(0, 1, (5, 8, 16)), axis=-1)
    cat = np.concatenate([a, b[..., ::-1]], axis=-1).astype(np.float32)
    ordv = np.concatenate(
        [np.broadcast_to(np.arange(16, dtype=np.float32), a.shape),
         np.broadcast_to(np.arange(31, 15, -1, dtype=np.float32), b.shape)],
        axis=-1)
    ks, os_, _ = merge_sorted(jnp.asarray(cat), jnp.asarray(ordv), (),
                              use_pltpu=False)
    expect = np.sort(
        np.concatenate([a, b], axis=-1).astype(np.float32), axis=-1)
    np.testing.assert_allclose(np.asarray(ks), expect, rtol=0, atol=0)


def test_reverse_half():
    x = jnp.broadcast_to(jnp.arange(32, dtype=jnp.float32), (2, 8, 32))
    r = np.asarray(reverse_half(x, use_pltpu=False))
    np.testing.assert_array_equal(
        r[..., :16], np.broadcast_to(np.arange(16), (2, 8, 16)))
    np.testing.assert_array_equal(
        r[..., 16:], np.broadcast_to(np.arange(31, 15, -1), (2, 8, 16)))
