"""top_k_mean (radix threshold selection) vs jax.lax.top_k."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from codeps_tpu.ops.topk import top_k_mean

RNG = np.random.default_rng(11)


def _reference(flat, k):
    vals, _ = jax.lax.top_k(flat, k)
    return jnp.mean(vals.astype(jnp.float32))


@pytest.mark.parametrize("n,k", [(1000, 200), (4096, 1), (4096, 4096),
                                 (37, 11)])
def test_matches_lax_top_k_f32(n, k):
    flat = jnp.asarray(RNG.uniform(0, 5, n).astype(np.float32))
    ours = top_k_mean(flat, k)
    ref = _reference(flat, k)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-6, atol=0)


def test_matches_with_heavy_ties_and_negative_zero():
    # many exact duplicates (bf16-style quantized losses), zeros, and a
    # -0.0 (a real CE output for prob-1 pixels): the threshold split
    # must still select exactly k values by multiset
    base = RNG.choice([0.0, 0.125, 0.25, 0.25, 1.5, 1.5, 1.5, 7.0],
                      size=2000).astype(np.float32)
    base[17] = -0.0
    flat = jnp.asarray(base)
    for k in (1, 3, 400, 1999):
        ours = top_k_mean(flat, k)
        ref = _reference(flat, k)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=1e-6, atol=0,
                                   err_msg=f"k={k}")


def test_bfloat16_path():
    flat = jnp.asarray(RNG.uniform(0, 3, 3000).astype(np.float32)
                       ).astype(jnp.bfloat16)
    for k in (1, 600, 3000):
        ours = top_k_mean(flat, k)
        ref = _reference(flat, k)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=1e-6, atol=0, err_msg=f"k={k}")


def test_gradient_matches_top_k_without_ties():
    # distinct values: the selection gradient must equal lax.top_k's
    # (1/k on each selected element, 0 elsewhere)
    flat = jnp.asarray(RNG.permutation(np.arange(500) + 0.5)
                       .astype(np.float32))
    k = 123
    g_ours = jax.grad(lambda v: top_k_mean(v, k))(flat)
    g_ref = jax.grad(lambda v: _reference(v, k))(flat)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-9)


def test_gradient_total_mass_with_ties():
    # with ties at the threshold the per-element attribution is
    # uniform-over-ties instead of arbitrary-subset, but the TOTAL
    # gradient mass must match (k * 1/k = 1) and flow only to values
    # >= threshold
    base = np.array([3.0] * 10 + [1.0] * 20 + [0.5] * 30, np.float32)
    flat = jnp.asarray(RNG.permutation(base))
    k = 15  # threshold 1.0: 10 strictly above, 5 tie-shares over 20
    g = np.asarray(jax.grad(lambda v: top_k_mean(v, k))(flat))
    np.testing.assert_allclose(g.sum(), 1.0, rtol=1e-6)
    vals = np.asarray(flat)
    assert np.all(g[vals == 3.0] == pytest.approx(1.0 / k, rel=1e-6))
    assert np.all(g[vals == 1.0] == pytest.approx((5.0 / 20) / k,
                                                  rel=1e-6))
    assert np.all(g[vals == 0.5] == 0.0)


def test_kth_largest_traced_k_and_inf_sentinels():
    # masked-median usage: +inf sentinels, k traced, k-th smallest via
    # (N - idx)-th largest — bit-identical to sort-and-index
    vals = RNG.uniform(0.0, 50.0, 1001).astype(np.float32)
    from codeps_tpu.ops.topk import kth_largest
    for frac in (0.0, 0.3, 1.0):
        mask = RNG.random(1001) < frac
        big = jnp.where(jnp.asarray(mask), jnp.asarray(vals), jnp.inf)
        count = int(mask.sum())
        idx = max((count - 1) // 2, 0)
        want = jnp.asarray(big.shape[0] - idx, jnp.int32)
        got = jax.jit(kth_largest, static_argnums=())(big, want)
        ref = np.sort(np.asarray(big))[idx]
        np.testing.assert_array_equal(np.asarray(got), ref,
                                      err_msg=f"frac={frac}")
