"""Device PQ primitives: training, encoding, streaming top-R scan."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from vectordb_tpu.distance import DistanceMetric
from vectordb_tpu.ops.pq import (pack_codebook, pq_distortion, pq_encode,
                                 pq_fit, pq_scan_topr)

RNG = np.random.default_rng(7)


def _np_encode(rows, codebook):
    m, ksub, dsub = codebook.shape
    sub = rows.reshape(rows.shape[0], m, dsub)
    out = np.empty((rows.shape[0], m), dtype=np.uint8)
    for j in range(m):
        d2 = ((sub[:, j, None, :] - codebook[j][None, :, :]) ** 2).sum(-1)
        out[:, j] = np.argmin(d2, axis=1)
    return out


def _np_decode(codes, codebook):
    m = codebook.shape[0]
    return np.concatenate(
        [codebook[j, codes[:, j]] for j in range(m)], axis=1)


def test_pq_fit_learns_clustered_subspaces():
    # rows are concatenations of 8 codewords per subspace + small noise:
    # a correct fit recovers near-zero distortion
    m, dsub, ksub = 4, 4, 8
    words = RNG.standard_normal((m, ksub, dsub)).astype(np.float32) * 3.0
    pick = RNG.integers(0, ksub, size=(256, m))
    rows = np.concatenate(
        [words[j, pick[:, j]] for j in range(m)], axis=1).astype(np.float32)
    rows += 0.01 * RNG.standard_normal(rows.shape).astype(np.float32)

    cb = np.asarray(pq_fit(jnp.asarray(rows), jax.random.PRNGKey(0),
                           m=m, ksub=ksub, iters=12, chunk=64))
    assert cb.shape == (m, ksub, dsub)
    codes = _np_encode(rows, cb)
    err = pq_distortion(rows, cb, codes)
    base = float(np.mean(np.sum(
        (rows - rows.mean(0, keepdims=True)) ** 2, axis=1)))
    assert err < 0.02 * base


def test_pq_fit_rejects_bad_chunk():
    rows = jnp.asarray(RNG.standard_normal((100, 8)).astype(np.float32))
    with pytest.raises(ValueError):
        pq_fit(rows, jax.random.PRNGKey(0), m=2, ksub=4, iters=2, chunk=64)


def test_pq_encode_matches_numpy_argmin():
    m, dsub, ksub = 6, 3, 16
    cb = RNG.standard_normal((m, ksub, dsub)).astype(np.float32)
    rows = RNG.standard_normal((128, m * dsub)).astype(np.float32)
    got = np.asarray(pq_encode(jnp.asarray(rows), jnp.asarray(cb), chunk=32))
    want = _np_encode(rows, cb)
    # ties are measure-zero with continuous data; require exact match
    np.testing.assert_array_equal(got, want)


def test_pack_codebook_blockdiag_decode_matches_naive():
    m, dsub, ksub = 8, 8, 16
    cb = RNG.standard_normal((m, ksub, dsub)).astype(np.float32)
    bd, spg = pack_codebook(cb, lane=32)   # spg = 4 -> g = 2 groups
    assert spg == 4 and bd.shape == (2, 4 * ksub, 4 * dsub)
    codes = RNG.integers(0, ksub, size=(12, m)).astype(np.uint8)
    naive = _np_decode(codes, cb)
    # grouped block-diag decode: onehot(codes) @ bd per group
    g = m // spg
    cg = codes.reshape(12, g, spg).transpose(1, 0, 2)
    oh = np.eye(ksub, dtype=np.float32)[cg]        # (g, 12, spg, ksub)
    dec = np.stack(
        [oh[i].reshape(12, spg * ksub) @ bd[i] for i in range(g)])
    grouped = dec.transpose(1, 0, 2).reshape(12, m * dsub)
    np.testing.assert_allclose(grouped, naive, atol=1e-6)


@pytest.mark.parametrize("metric", [DistanceMetric.EUCLIDEAN,
                                    DistanceMetric.COSINE,
                                    DistanceMetric.DOT_PRODUCT])
def test_pq_scan_covers_exact_topk(metric):
    # db rows ARE codeword concatenations (zero quantization error), so
    # the scan's ranking over decoded rows must match the exact ranking
    # over the true rows up to bf16 dot noise — require the exact top-5
    # to sit inside the scanned top-16
    m, dsub, ksub, n, q = 8, 8, 32, 256, 20
    words = (RNG.standard_normal((m, ksub, dsub)) * 2.0).astype(np.float32)
    pick = RNG.integers(0, ksub, size=(n, m))
    rows = np.concatenate(
        [words[j, pick[:, j]] for j in range(m)], axis=1).astype(np.float32)
    codes = _np_encode(rows, words)
    np.testing.assert_allclose(_np_decode(codes, words), rows, atol=1e-6)
    queries = RNG.standard_normal((q, m * dsub)).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    bd, _ = pack_codebook(words)
    cnorm = np.sum(words * words, axis=-1)

    scores, slots = pq_scan_topr(
        jnp.asarray(queries), jnp.asarray(codes), jnp.asarray(bd),
        jnp.asarray(cnorm), jnp.asarray(valid), metric, r=16, chunk=64,
        recall_target=0.99)
    scores, slots = np.asarray(scores), np.asarray(slots)
    assert scores.shape == (q, 16) and slots.shape == (q, 16)
    assert np.all(np.diff(scores, axis=1) >= 0)

    if metric is DistanceMetric.EUCLIDEAN:
        d2 = ((queries[:, None, :] - rows[None, :, :]) ** 2).sum(-1)
    elif metric is DistanceMetric.DOT_PRODUCT:
        d2 = -queries @ rows.T
    else:
        d2 = 1.0 - (queries @ rows.T) / (
            np.linalg.norm(queries, axis=1)[:, None]
            * np.linalg.norm(rows, axis=1)[None, :])
    exact_top5 = np.argsort(d2, axis=1)[:, :5]
    for qi in range(q):
        assert set(exact_top5[qi]) <= set(slots[qi])


def test_pq_scan_respects_validity_and_short_sets():
    m, dsub, ksub, n = 4, 4, 8, 128
    cb = RNG.standard_normal((m, ksub, dsub)).astype(np.float32)
    rows = RNG.standard_normal((n, m * dsub)).astype(np.float32)
    codes = _np_encode(rows, cb)
    valid = np.zeros(n, dtype=bool)
    valid[[3, 40, 100]] = True
    queries = RNG.standard_normal((5, m * dsub)).astype(np.float32)
    bd, _ = pack_codebook(cb)
    cnorm = np.sum(cb * cb, axis=-1)
    scores, slots = pq_scan_topr(
        jnp.asarray(queries), jnp.asarray(codes), jnp.asarray(bd),
        jnp.asarray(cnorm), jnp.asarray(valid),
        DistanceMetric.EUCLIDEAN, r=8, chunk=32)
    scores, slots = np.asarray(scores), np.asarray(slots)
    for qi in range(5):
        finite = np.isfinite(scores[qi])
        assert finite.sum() == 3
        assert set(slots[qi][finite]) == {3, 40, 100}


def test_pq_scan_rejects_bad_shapes():
    cb = np.zeros((2, 4, 2), np.float32)
    bd, _ = pack_codebook(cb)
    cnorm = np.sum(cb * cb, axis=-1)
    codes = jnp.zeros((48, 2), jnp.uint8)
    valid = jnp.ones((48,), bool)
    qs = jnp.zeros((2, 4), jnp.float32)
    with pytest.raises(ValueError):
        pq_scan_topr(qs, codes, jnp.asarray(bd), jnp.asarray(cnorm),
                     valid, DistanceMetric.EUCLIDEAN, r=4, chunk=32)
    with pytest.raises(ValueError):
        pq_scan_topr(qs, jnp.zeros((64, 2), jnp.uint8), jnp.asarray(bd),
                     jnp.asarray(cnorm), jnp.ones((64,), bool),
                     DistanceMetric.EUCLIDEAN, r=64, chunk=32)


class TestPallasDecode:
    """The VMEM one-hot decode kernel (ops/pq.pq_decode_rows) must be
    bitwise-equal to the XLA one-hot decode: both select bf16-valued
    codewords exactly (one nonzero per output element)."""

    def _setup(self, n=2048, m=96, d=768, ksub=256, seed=0):
        rng = np.random.default_rng(seed)
        cb = rng.standard_normal((m, ksub, d // m)).astype(np.float32)
        cb = cb.astype(jnp.bfloat16).astype(np.float32)
        bd, spg = pack_codebook(cb)
        codes = rng.integers(0, ksub, (n, m), dtype=np.uint8)
        cnorm = np.sum(cb * cb, axis=-1).astype(np.float32)
        g = bd.shape[0]
        return (jnp.asarray(codes), jnp.asarray(bd).astype(jnp.bfloat16),
                jnp.asarray(cnorm).reshape(g, spg, ksub),
                jnp.arange(ksub, dtype=jnp.uint8))

    def test_decode_bitwise_equal(self):
        from vectordb_tpu.ops.pq import (_decode_block,
                                         _decode_block_pallas,
                                         pq_decode_rows)
        codes, bd_bf, cnorm_g, iota_k = self._setup()
        dec0, rsq0 = _decode_block(codes, bd_bf, cnorm_g, iota_k)
        dec1 = pq_decode_rows(codes, bd_bf, interpret=True)
        assert bool(jnp.all(dec0 == dec1))
        # rsq differs only by f32 summation order
        _, rsq1 = _decode_block_pallas(codes, bd_bf, interpret=True)
        assert float(jnp.max(jnp.abs(rsq0 - rsq1))) < 1e-2

    def test_decode_small_m_grouping(self):
        # m=16, dsub=16 -> spg=8, g=2: a different grouping geometry
        from vectordb_tpu.ops.pq import _decode_block, pq_decode_rows
        codes, bd_bf, cnorm_g, iota_k = self._setup(n=512, m=16, d=256)
        dec0, _ = _decode_block(codes, bd_bf, cnorm_g, iota_k)
        dec1 = pq_decode_rows(codes, bd_bf, interpret=True)
        assert bool(jnp.all(dec0 == dec1))

    def test_use_pallas_decode_gates_on_backend(self):
        from vectordb_tpu.ops.pq import _use_pallas_decode
        # CPU test backend: never engages
        assert _use_pallas_decode(1 << 20, 96, 16384) is False
