"""Bitonic lane-axis sorting networks for Pallas TPU kernels.

Mosaic has no in-kernel sort primitive, and K argmin-extract passes over a
(P, C) block cost ~20us each on v5e (measured, scripts/kmicro.py `merge16`)
because every pass is a chain of cross-lane reductions. A bitonic network
needs NO reductions — each comparator stage is two lane-rotations, a
compare, and selects, all ops measured at ~1 cycle/vreg on this backend
(`roll_sub16`) — and every mask is a compile-time constant of the lane
iota, so Mosaic folds them.

The XOR-partner trick: at distance d (power of two), lane l's partner is
l ^ d.  roll(x, -d) puts lane l+d's value at l, roll(x, +d) puts l-d's, so

    partner(x) = where(bit_d(lane) == 0, roll(x, -d), roll(x, +d))

Keys sort ascending and ties break to the LOWER `ord` value — (t1, ord)
lexicographic — which reproduces the reference peel's "earlier candidate
wins" order exactly (``/root/reference/src/rtgs/scene.py:429-437`` keeps
the first-seen nearest hit; our oracle and the argmin-extract merge both
break ties the same way).

All functions operate on the LAST axis (lanes) and require its length to
be a power of two ≥ 2. Payload tuples ride along through the same select
masks.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _rolls(x, shift, use_pltpu):
    """Rotate the last axis: pltpu.roll inside a Mosaic kernel
    (use_pltpu=True), jnp.roll under the Pallas interpreter / plain XLA."""
    if use_pltpu:
        from jax.experimental.pallas import tpu as pltpu

        # pltpu.roll requires a non-negative shift; rolls are cyclic so
        # −d ≡ n−d.
        return pltpu.roll(x, shift % x.shape[-1], x.ndim - 1)
    return jnp.roll(x, shift, axis=-1)


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _comparator(key, ord_, payload, d, want_desc_mask, use_pltpu):
    """One comparator stage at XOR-distance d.

    want_desc_mask: bool array (lane-iota derived, compile-time constant)
    marking lanes whose comparator should produce DESCENDING order.
    Each lane keeps either its own or its partner's value such that the
    lane with bit_d == 0 ends up with the min (ascending) or max
    (descending) of the pair.
    """
    lane = _lane_iota(key.shape)
    upper = (lane & d) != 0          # bit_d set -> takes the max (asc)

    def partner(x):
        return jnp.where(upper, _rolls(x, d, use_pltpu),
                         _rolls(x, -d, use_pltpu))

    pk = partner(key)
    po = partner(ord_)
    # self > partner lexicographically on (key, ord)?
    gt = (key > pk) | ((key == pk) & (ord_ > po))
    # Ascending: lower lane (upper=False) wants the smaller ⇒ swap when
    # (gt == (self is lower)) ... combine: keep partner's value when
    # (gt ^ upper) == True for ascending, flipped for descending.
    take_partner = jnp.logical_xor(jnp.logical_xor(gt, upper),
                                   want_desc_mask)

    def sel(x, px):
        return jnp.where(take_partner, px, x)

    return (sel(key, pk), sel(ord_, po),
            tuple(sel(x, partner(x)) for x in payload))


def sort_by_key(key: jnp.ndarray, ord_: jnp.ndarray,
                payload: Sequence[jnp.ndarray] = (),
                use_pltpu: bool = True) -> Tuple:
    """Full bitonic sort of the last axis, ascending by (key, ord_).

    Returns (key, ord_, payload) sorted. Last-axis length must be a power
    of two. log²(n)·(log n + 1)/2 comparator stages.
    """
    n = key.shape[-1]
    ln = int(math.log2(n))
    assert 1 << ln == n, n
    payload = tuple(payload)
    lane = _lane_iota(key.shape)
    for stage in range(ln):             # builds bitonic runs of 2^(s+1)
        block = 1 << (stage + 1)
        # Lanes in odd blocks sort descending to form bitonic sequences.
        desc = (lane & block) != 0
        for sub in range(stage, -1, -1):
            d = 1 << sub
            key, ord_, payload = _comparator(
                key, ord_, payload, d, desc, use_pltpu)
    return key, ord_, payload


def merge_sorted(key: jnp.ndarray, ord_: jnp.ndarray,
                 payload: Sequence[jnp.ndarray] = (),
                 use_pltpu: bool = True) -> Tuple:
    """Bitonic merge of a (last-axis) sequence formed by an ascending
    first half and a DESCENDING second half (classic bitonic input),
    producing a fully ascending sort. log2(n) stages.

    To merge two ascending sorted halves, reverse the second half first
    (see reverse_half)."""
    n = key.shape[-1]
    ln = int(math.log2(n))
    assert 1 << ln == n, n
    payload = tuple(payload)
    no_desc = jnp.zeros(key.shape, bool)
    for sub in range(ln - 1, -1, -1):
        d = 1 << sub
        key, ord_, payload = _comparator(
            key, ord_, payload, d, no_desc, use_pltpu)
    return key, ord_, payload


def reverse_half(x: jnp.ndarray, use_pltpu: bool = True) -> jnp.ndarray:
    """Reverse the SECOND half of the last axis (length n, power of two):
    lanes [n/2, n) get mirrored. Implemented as log2(n/2) XOR-swaps with
    static masks (a lane-reverse is XOR with n/2−1 within the half)."""
    n = x.shape[-1]
    h = n // 2
    lane = _lane_iota(x.shape)
    in_hi = (lane & h) != 0
    # XOR-reverse within the high half: partner = lane ^ (h - 1).
    d = h // 2
    while d >= 1:
        bit = (lane & d) != 0
        swapped = jnp.where(bit, _rolls(x, d, use_pltpu),
                            _rolls(x, -d, use_pltpu))
        x = jnp.where(in_hi, swapped, x)
        d //= 2
    return x
