"""Tests for ops/merge.py — the hop loop's sorted-pool maintenance
primitives (bitonic merge replacing full lax.sort networks, id+flag
packing, equality-matrix dedup)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from islands_tpu.ops import merge as M


@pytest.mark.parametrize("L", [2, 8, 64, 512])
def test_bitonic_merge_sorts_asc_desc_runs(L):
    rng = np.random.default_rng(L)
    for split in {0, 1, L // 3, L // 2, L - 1, L}:
        a = np.sort(rng.standard_normal(split).astype(np.float32))
        b = np.sort(rng.standard_normal(L - split).astype(np.float32))[::-1]
        d = np.concatenate([a, b])
        aux = np.arange(L, dtype=np.int32)
        ds, auxs = M.bitonic_merge(jnp.asarray(d), jnp.asarray(aux))
        ds, auxs = np.asarray(ds), np.asarray(auxs)
        np.testing.assert_allclose(ds, np.sort(d))
        # aux follows its distance (all distances distinct almost surely)
        np.testing.assert_allclose(d[auxs], ds)


def test_bitonic_merge_handles_inf_padding_and_batch():
    rng = np.random.default_rng(0)
    d = np.full((3, 16), np.inf, dtype=np.float32)
    d[:, :5] = np.sort(rng.standard_normal((3, 5)).astype(np.float32), axis=1)
    d[:, 9:] = -np.sort(-rng.standard_normal((3, 7)).astype(np.float32), axis=1)
    aux = np.broadcast_to(np.arange(16, dtype=np.int32), (3, 16)).copy()
    ds, auxs = M.bitonic_merge(jnp.asarray(d), jnp.asarray(aux))
    np.testing.assert_allclose(np.asarray(ds), np.sort(d, axis=1))


def test_merge_sorted_with_new_matches_full_sort():
    rng = np.random.default_rng(1)
    p, e = 32, 59  # non-pow2 total exercises the inf padding
    pool_d = np.sort(rng.standard_normal((4, p)).astype(np.float32), axis=1)
    pool_aux = rng.integers(0, 1000, size=(4, p)).astype(np.int32)
    new_d = rng.standard_normal((4, e)).astype(np.float32)
    new_d[:, -10:] = np.inf  # invalid tail
    new_aux = rng.integers(0, 1000, size=(4, e)).astype(np.int32)

    d, aux = M.merge_sorted_with_new(
        jnp.asarray(pool_d), jnp.asarray(pool_aux),
        jnp.asarray(new_d), jnp.asarray(new_aux),
    )
    d, aux = np.asarray(d), np.asarray(aux)
    assert d.shape == (4, p + e)

    ref_d = np.sort(np.concatenate([pool_d, new_d], axis=1), axis=1)[:, : p + e]
    np.testing.assert_allclose(d, ref_d)
    # finite entries keep their aux pairing (distances a.s. distinct)
    all_d = np.concatenate([pool_d, new_d], axis=1)
    all_aux = np.concatenate([pool_aux, new_aux], axis=1)
    for b in range(4):
        pairs = {(float(x), int(a)) for x, a in zip(all_d[b], all_aux[b])
                 if np.isfinite(x)}
        got = {(float(x), int(a)) for x, a in zip(d[b], aux[b])
               if np.isfinite(x)}
        assert got <= pairs


def test_pack_unpack_roundtrip():
    ids = jnp.asarray([0, 1, 5, 2**29, -1], dtype=jnp.int32)
    exp = jnp.asarray([True, False, True, False, True])
    code = M.pack_id_expanded(ids, exp)
    ids2, exp2 = M.unpack_id_expanded(code)
    np.testing.assert_array_equal(np.asarray(ids2), np.asarray(ids))
    np.testing.assert_array_equal(np.asarray(exp2), np.asarray(exp))
    # SENTINEL(-1, expanded) packs to -1: empty pool slots stay -1 codes
    assert int(code[-1]) == -1


def test_merge_inside_jit_and_vmap():
    @jax.jit
    def f(pd, pa, nd, na):
        return M.merge_sorted_with_new(pd, pa, nd, na)

    rng = np.random.default_rng(2)
    pd = np.sort(rng.standard_normal((8,)).astype(np.float32))
    pa = np.arange(8, dtype=np.int32)
    nd = rng.standard_normal((24,)).astype(np.float32)
    na = np.arange(24, dtype=np.int32)
    d, _ = f(jnp.asarray(pd), jnp.asarray(pa), jnp.asarray(nd), jnp.asarray(na))
    np.testing.assert_allclose(
        np.asarray(d), np.sort(np.concatenate([pd, nd]))
    )
