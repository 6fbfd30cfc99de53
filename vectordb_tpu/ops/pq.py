"""Device-side Product Quantization primitives: training, encoding, scan.

An index family beyond the reference (which ships flat + HNSW,
src/lib.rs:30-47), motivated by the hardware's memory hierarchy: HBM
capacity, not FLOPs, caps the one-chip database size (f32 rows top out at
~4M x 768, bf16 at 8M, int8 at 16M — BASELINE.md). PQ codes at 1 byte per
subspace cut storage a further 8x (96 bytes/row at 768-d, 32x vs f32), so
tens of millions of rows fit beside the working set of one chip. Accuracy
is recovered by an exact re-rank over the top-R PQ candidates against the
full-precision rows the index already keeps on the host (optionally
disk-backed) — the classic PQ + refine architecture, re-expressed for TPU:

* training: M independent 256-way k-means fits run as ONE batched device
  program (Lloyd iterations are matmuls + segment-sums — MXU work), not M
  sequential fits (each host-visible dispatch costs ~25 ms on this
  platform's relay).
* encoding: chunked batched argmin over subspace codebooks (lax.map).
* scan: the database never exists in decoded form in HBM. A lax.scan
  streams code tiles, decodes each tile to bf16 rows IN REGISTERS/VMEM via
  a one-hot matmul (``onehot(code) @ codebook`` — the standard MXU-native
  gather), dots them against the query block, and folds the tile's
  approx-top-R into a running candidate list. Decoded-row squared norms
  come exactly from the codebook (``|x_hat|^2 = sum_m |c_m|^2`` — the
  subspaces are disjoint coordinates), so euclidean/cosine surrogates
  need no second pass.

Scan scores are rank-surrogates (per-query constants dropped; bf16 dots):
the index's host re-rank recomputes exact f32 distances over the true
stored rows, so returned distances are exact and recall is governed only
by candidate coverage (R), exactly like IVF's nprobe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..distance import DistanceMetric


def _subspace_view(rows, m: int):
    """(S, d) -> (m, S, dsub): subspace-major view of row blocks."""
    s, d = rows.shape
    return rows.reshape(s, m, d // m).transpose(1, 0, 2)


def _kmeanspp_init(sub, key, ksub: int):
    """Batched k-means++ (D^2 sampling) init: (m, S, dsub) -> (m, ksub,
    dsub). Each subspace draws its own sequence (Gumbel-max over log D^2),
    so duplicate row patterns are never double-picked (their D^2 is 0) —
    plain random init collides on small codebooks and Lloyd then converges
    to merged-codeword local minima."""
    m, s, dsub = sub.shape
    k0, krest = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, s)
    c0 = sub[:, first, :]                                 # (m, dsub)
    mind0 = jnp.full((m, s), jnp.inf, jnp.float32)

    def pick(carry, kt):
        mind, prev = carry
        d = jnp.sum((sub - prev[:, None, :]) ** 2, axis=-1)   # (m, S)
        mind = jnp.minimum(mind, d)
        g = jax.random.gumbel(kt, (m, s))
        idx = jnp.argmax(jnp.log(jnp.maximum(mind, 1e-30)) + g, axis=1)
        nxt = jnp.take_along_axis(
            sub, idx[:, None, None], axis=1)[:, 0, :]
        return (mind, nxt), nxt

    (_, _), rest = jax.lax.scan(pick, (mind0, c0),
                                jax.random.split(krest, ksub - 1))
    return jnp.concatenate([c0[:, None, :], rest.transpose(1, 0, 2)],
                           axis=1)


@functools.partial(jax.jit, static_argnames=("m", "ksub", "iters", "chunk"))
def pq_fit(sample, key, m: int, ksub: int, iters: int, chunk: int):
    """Batched subspace k-means: (S, d) f32 -> codebook (m, ksub, dsub).

    All m fits advance in lockstep inside one compiled program. Init is
    batched k-means++ (each subspace D^2-samples its own seeds).
    Assignment is chunked over rows (lax.map) to bound the
    (m, chunk, ksub) score tensor; updates are exact f32 segment-sums.
    Empty clusters re-seed to a random sample row each iteration (stronger
    than ops/ivf.kmeans_fit's keep-previous policy: a stuck-empty codeword
    permanently wastes 1/ksub of the code space).

    ``sample`` rows must be a multiple of ``chunk`` (callers sample a
    pow2-sized subset and pick a dividing chunk).
    """
    s, d = sample.shape
    if s % chunk:
        raise ValueError(f"sample rows {s} not a multiple of chunk {chunk}")
    dsub = d // m
    sample = sample.astype(jnp.float32)
    sub = _subspace_view(sample, m)                       # (m, S, dsub)
    kinit, key = jax.random.split(key)
    codebook = _kmeanspp_init(sub, kinit, ksub)           # (m, ksub, dsub)
    sub_c = sub.reshape(m, s // chunk, chunk, dsub).transpose(1, 0, 2, 3)
    seg_base = (jnp.arange(m, dtype=jnp.int32)[:, None] * ksub)

    def step(codebook, it_key):
        cnorm = jnp.sum(codebook * codebook, axis=-1)     # (m, ksub)

        def assign_chunk(xc):                             # (m, chunk, dsub)
            scores = (-2.0 * jnp.einsum(
                "mcd,mkd->mck", xc, codebook,
                preferred_element_type=jnp.float32)
                + cnorm[:, None, :])
            a = jnp.argmin(scores, axis=-1).astype(jnp.int32)
            seg = (a + seg_base).reshape(-1)              # (m*chunk,)
            flat = xc.reshape(-1, dsub)
            sums = jax.ops.segment_sum(flat, seg, num_segments=m * ksub)
            cnts = jax.ops.segment_sum(
                jnp.ones((flat.shape[0],), jnp.float32), seg,
                num_segments=m * ksub)
            return sums, cnts

        sums, cnts = jax.lax.map(assign_chunk, sub_c)
        sums = jnp.sum(sums, axis=0).reshape(m, ksub, dsub)
        cnts = jnp.sum(cnts, axis=0).reshape(m, ksub)
        new = sums / jnp.maximum(cnts, 1.0)[..., None]
        reseed = _subspace_view(
            sample[jax.random.randint(it_key, (ksub,), 0, s)], m)
        return jnp.where(cnts[..., None] > 0.0, new, reseed), None

    codebook, _ = jax.lax.scan(step, codebook,
                               jax.random.split(key, iters))
    return codebook


@functools.partial(jax.jit, static_argnames=("chunk",))
def pq_encode(rows, codebook, chunk: int):
    """(N, d) rows -> (N, m) uint8 codes (nearest codeword per subspace).

    Chunked over rows; N must be a multiple of ``chunk`` (callers pad and
    slice). Works on f32 rows; int8/bf16-stored indexes pass their
    dequantized host values.
    """
    n, d = rows.shape
    if n % chunk:
        raise ValueError(f"rows {n} not a multiple of chunk {chunk}")
    m, ksub, dsub = codebook.shape
    cnorm = jnp.sum(codebook * codebook, axis=-1)

    sub = _subspace_view(rows.astype(jnp.float32), m)
    sub_c = sub.reshape(m, n // chunk, chunk, dsub).transpose(1, 0, 2, 3)

    def enc_chunk(xc):
        scores = (-2.0 * jnp.einsum(
            "mcd,mkd->mck", xc, codebook,
            preferred_element_type=jnp.float32)
            + cnorm[:, None, :])
        return jnp.argmin(scores, axis=-1).astype(jnp.uint8).T  # (chunk, m)

    codes = jax.lax.map(enc_chunk, sub_c)                 # (nc, chunk, m)
    return codes.reshape(n, m)


@functools.partial(jax.jit, static_argnames=("metric", "r", "chunk",
                                             "recall_target"))
def pq_scan_topr(queries, codes, codebook, valid, metric: DistanceMetric,
                 r: int, chunk: int, recall_target: float = 0.99):
    """Streaming PQ scan: top-R candidate slots per query, never decoding
    the database into HBM.

    queries (Q, d) f32 · codes (N, m) uint8 · codebook (m, ksub, dsub) f32
    · valid (N,) bool. N must be a multiple of ``chunk``; r <= chunk.
    Returns (scores (Q, r) ascending, slots (Q, r) int32). Scores are
    rank-surrogates (per-query constant terms dropped; +inf marks dead /
    masked slots — fewer than r live rows surface as +inf tails).

    Per chunk: one-hot(codes) @ codebook decodes the tile to bf16 rows in
    VMEM (MXU gather), a (Q, d) @ (d, chunk) bf16 matmul scores it, and
    ``lax.approx_min_k`` (the TPU PartialReduce unit) folds the tile's
    best R into the running list — selection stays O(chunk) per tile
    instead of O(chunk * r).
    """
    n, m = codes.shape
    if n % chunk:
        raise ValueError(f"codes rows {n} not a multiple of chunk {chunk}")
    if r > chunk:
        raise ValueError(f"r={r} exceeds chunk={chunk}")
    q = queries.shape[0]
    ksub, dsub = codebook.shape[1], codebook.shape[2]
    cnorm = jnp.sum(codebook * codebook, axis=-1)         # (m, ksub) f32
    cb_bf = codebook.astype(jnp.bfloat16)
    q_bf = queries.astype(jnp.bfloat16)
    iota_k = jnp.arange(ksub, dtype=jnp.uint8)

    codes_c = codes.reshape(n // chunk, chunk, m)
    valid_c = valid.reshape(n // chunk, chunk)
    inf = jnp.float32(jnp.inf)

    def body(carry, inp):
        vals, idx, ci = carry
        cc, vc = inp
        onehot = (cc[:, :, None] == iota_k[None, None, :])
        oh_bf = onehot.astype(jnp.bfloat16)
        decoded = jnp.einsum("cmk,mkd->cmd", oh_bf, cb_bf,
                             preferred_element_type=jnp.bfloat16)
        decoded = decoded.reshape(chunk, m * dsub)        # (chunk, d) bf16
        # exact decoded-row sq norm from the codebook (disjoint subspaces)
        xsq = jnp.einsum("cmk,mk->c", oh_bf, cnorm,
                         preferred_element_type=jnp.float32)
        dots = jnp.matmul(q_bf, decoded.T,
                          preferred_element_type=jnp.float32)  # (Q, chunk)
        if metric is DistanceMetric.DOT_PRODUCT:
            scores = -dots
        elif metric is DistanceMetric.EUCLIDEAN:
            scores = xsq[None, :] - 2.0 * dots            # + |q|^2 dropped
        else:                                             # cosine
            xnorm = jnp.sqrt(jnp.maximum(xsq, 1e-30))
            scores = -dots / xnorm[None, :]               # / |q| dropped
        scores = jnp.where(vc[None, :], scores, inf)
        cv, cl = jax.lax.approx_min_k(scores, r,
                                      recall_target=recall_target)
        cg = (cl + ci * chunk).astype(jnp.int32)
        av = jnp.concatenate([vals, cv], axis=1)          # (Q, 2r)
        ai = jnp.concatenate([idx, cg], axis=1)
        nv, pos = jax.lax.top_k(-av, r)
        ni = jnp.take_along_axis(ai, pos, axis=1)
        return (-nv, ni, ci + 1), None

    vals0 = jnp.full((q, r), inf, jnp.float32)
    idx0 = jnp.zeros((q, r), jnp.int32)
    (vals, idx, _), _ = jax.lax.scan(
        body, (vals0, idx0, jnp.int32(0)), (codes_c, valid_c))
    sv, pos = jax.lax.top_k(-vals, r)
    return -sv, jnp.take_along_axis(idx, pos, axis=1)


def pq_distortion(rows, codebook, codes):
    """Mean squared reconstruction error (host-side diagnostic)."""
    import numpy as np
    m, ksub, dsub = codebook.shape
    rec = np.concatenate(
        [np.asarray(codebook)[j, np.asarray(codes)[:, j]]
         for j in range(m)], axis=1)
    diff = np.asarray(rows, dtype=np.float32) - rec
    return float(np.mean(np.sum(diff * diff, axis=1)))
