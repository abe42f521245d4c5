"""Exact top-k mean via radix threshold selection (TPU-friendly).

``jax.lax.top_k`` over a million-element flat array lowers to a sort on
TPU, and its backward is a scatter — both serialize (the adapt-step
trace charged ~7 ms/step to the semantic CE's sort+scatter bucket).
The hard-pixel-mining CE (/root/reference/algos/semantic_seg.py:58-62)
only needs the MEAN of the k largest values, which a threshold
reformulation computes with pure elementwise + reduction work:

    mean = (sum(v * [v > t]) + (k - count(v > t)) * t) / k

where t is the k-th largest value. Both terms sum exactly the same
multiset of values as mean(top_k(v, k)) — the result differs only in
floating-point summation ORDER (same equivalence class as XLA's own
reduction reordering). t is found EXACTLY (bit-level) by radix
selection over the IEEE bit patterns: for non-negative floats the raw
bits order monotonically, so 4-bit-digit rounds narrow the candidate
set to the exact k-th-largest pattern in width/4 passes of
compare+reduce (no sort, no scatter, O(N) work per pass).

Gradient: elements strictly above t get gradient 1/k (same as top_k);
the tie mass (k - count_gt) spreads uniformly over the elements EQUAL
to t (torch/lax.top_k pick an arbitrary subset of the ties instead —
same total gradient, arbitrary-vs-uniform distribution over equal
values only).

Restriction: values must be non-negative (CE losses are); -0.0 is
normalized to +0.0 on entry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_UINT_FOR = {4: jnp.uint32, 2: jnp.uint16}


def kth_largest(flat: jnp.ndarray, k) -> jnp.ndarray:
    """EXACT (bit-level) k-th largest entry of a non-negative 1-D float
    array by radix selection — no sort. O(width/4) passes of
    compare+reduce. Non-differentiable (integer bit path). +inf entries
    order largest (usable as masked-out sentinels for k-th-SMALLEST
    queries: k-th smallest == (N - k + 1)-th largest of the inf-masked
    array). ``k`` may be a traced scalar (1-based, in [1, N])."""
    assert flat.ndim == 1, flat.shape
    if isinstance(k, int):
        assert 1 <= k <= flat.shape[0], (k, flat.shape)
    itemsize = jnp.dtype(flat.dtype).itemsize
    uint = _UINT_FOR[itemsize]
    nbits = itemsize * 8

    # mask the sign bit: -0.0 (a real CE output — prob-1 pixels yield
    # nll = -0.0) would otherwise order as the LARGEST uint pattern
    bits = jax.lax.bitcast_convert_type(flat, uint) & uint(
        (1 << (nbits - 1)) - 1)
    bins = jnp.arange(16, dtype=uint)

    prefix = jnp.zeros((), uint)
    cand = jnp.ones(flat.shape, bool)
    want = jnp.asarray(k, jnp.int32)
    for shift in range(nbits - 4, -1, -4):
        digit = (bits >> uint(shift)) & uint(0xF)
        hist = jnp.sum(cand[None, :] & (digit[None, :] == bins[:, None]),
                       axis=1, dtype=jnp.int32)              # (16,)
        # descending-cumulative count of candidates in bins >= d
        c_ge = jnp.cumsum(hist[::-1])[::-1]
        # k-th largest lives in the highest bin d* with c_ge[d*] >= want
        d_star = jnp.max(jnp.where(c_ge >= want,
                                   jnp.arange(16, dtype=jnp.int32), 0))
        above = jnp.where(d_star < 15, c_ge[jnp.minimum(d_star + 1, 15)],
                          0)                      # strictly higher bins
        want = want - above
        cand = cand & (digit == d_star.astype(uint))
        prefix = prefix | (d_star.astype(uint) << uint(shift))

    return jax.lax.bitcast_convert_type(prefix, flat.dtype)


def top_k_mean(flat: jnp.ndarray, k: int) -> jnp.ndarray:
    """float32 mean of the k largest entries of a non-negative 1-D array.

    Exact-multiset equivalent of
    ``jnp.mean(jax.lax.top_k(flat, k)[0].astype(jnp.float32))``
    (summation order aside); see module docstring for the gradient
    semantics on ties.
    """
    t = kth_largest(flat, k)
    itemsize = jnp.dtype(flat.dtype).itemsize
    uint = _UINT_FOR[itemsize]
    nbits = itemsize * 8
    sign_mask = uint((1 << (nbits - 1)) - 1)
    bits = jax.lax.bitcast_convert_type(flat, uint) & sign_mask
    prefix = jax.lax.bitcast_convert_type(t, uint) & sign_mask
    gt = jax.lax.stop_gradient(bits > prefix)
    eq = jax.lax.stop_gradient(bits == prefix)
    x32 = flat.astype(jnp.float32)
    sum_gt = jnp.sum(jnp.where(gt, x32, 0.0))
    count_gt = jnp.sum(gt, dtype=jnp.int32)
    count_eq = jnp.maximum(jnp.sum(eq, dtype=jnp.int32), 1)
    n_tie = (k - count_gt).astype(jnp.float32)
    # primal uses the exact bit-level t; the gradient of t rides the
    # mean-of-ties difference (uniform over equal values)
    t_mean = jnp.sum(jnp.where(eq, x32, 0.0)) / count_eq.astype(jnp.float32)
    t_val = (jax.lax.stop_gradient(t.astype(jnp.float32) - t_mean)
             + t_mean)
    return (sum_gt + n_tie * t_val) / float(k)
