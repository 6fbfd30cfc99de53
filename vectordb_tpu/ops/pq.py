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
  streams code tiles, decodes each to bf16 rows IN VMEM via grouped
  block-diagonal one-hot matmuls (``pack_codebook`` — MXU-lane-width
  outputs; the naive per-subspace batched matmul is 16x underutilized
  and layout-transposed), dots them against the query block, and emits
  the chunk's approx-top-r rows (``lax.approx_min_k`` — the TPU
  PartialReduce unit, O(chunk)) as scan outputs; one more approx pass
  over the pooled candidates finishes selection — no O(chunk*r) merge
  ever runs inside the loop. Decoded-row squared norms come exactly
  from the codebook (``|x_hat|^2 = sum_m |c_m|^2`` — the subspaces are
  disjoint coordinates), so euclidean/cosine surrogates need no second
  pass.

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
    # seed from a strided subsample: the ksub-1-step D^2 scan touches its
    # pool once per step, and seeding quality saturates well below the
    # full training sample (the Lloyd iterations still see every row)
    s_init = min(s, max(8 * ksub, 4096))
    stride = max(1, s // s_init)
    sub_init = sub[:, ::stride, :][:, :s_init, :]
    codebook = _kmeanspp_init(sub_init, kinit, ksub)      # (m, ksub, dsub)
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
    # round the learned codewords to bf16 VALUES: codewords are arbitrary,
    # so this costs ~nothing in distortion, and it makes the scan's bf16
    # decode EXACT — without it, bf16 rounding of f32 codewords perturbs
    # scan scores systematically and pool coverage plateaus no matter how
    # large the refine pool gets (measured 0.77 vs the 0.999 f32 oracle
    # at 2^18 x 768 intrinsic-dim-32)
    return codebook.astype(jnp.bfloat16).astype(jnp.float32)


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


TILE = 16          # rows per candidate tile (matches coarse_kernel.SUB)


def pack_codebook(codebook, lane: int = 128):
    """Regroup the (m, ksub, dsub) codebook into MXU-width block-diagonal
    decode matrices.

    The naive decode ``onehot(codes) @ codebook`` is m batched matmuls
    with dsub-wide outputs — at dsub=8 the MXU runs 16x underutilized and
    XLA inserts a layout transpose of the one-hot per chunk (measured 6+ s
    per 1M x 768 batch). Grouping ``spg = lane/dsub`` subspaces into one
    block-diagonal matrix makes each matmul's output exactly one MXU lane
    tile wide: ``spg``x the useful FLOPs (the zero blocks), but full
    utilization — net ~10x faster and layout-clean.

    Returns (bd (g, spg*ksub, spg*dsub) f32, spg). Works on numpy or jax
    arrays; the caller ships bd to device once per codebook change.
    """
    import numpy as np
    cb = np.asarray(codebook, dtype=np.float32)
    m, ksub, dsub = cb.shape
    spg = max(1, min(m, lane // max(dsub, 1)))
    while m % spg:
        spg -= 1
    g = m // spg
    bd = np.zeros((g, spg * ksub, spg * dsub), np.float32)
    cbg = cb.reshape(g, spg, ksub, dsub)
    for s in range(spg):
        bd[:, s * ksub:(s + 1) * ksub, s * dsub:(s + 1) * dsub] = cbg[:, s]
    return bd, spg


@functools.partial(jax.jit, static_argnames=("metric", "r", "chunk",
                                             "recall_target"))
def pq_scan_topr(queries, codes, bd, cnorm, valid, metric: DistanceMetric,
                 r: int, chunk: int, recall_target: float = 0.95):
    """Streaming PQ scan -> top-r candidate ROWS per query, never decoding
    the database into HBM and never running an O(chunk*r) top-k inside
    the streaming loop.

    queries (Q, d) f32 · codes (N, m) uint8 · bd = pack_codebook output ·
    cnorm (m, ksub) f32 codeword sq-norms · valid (N,) bool. N must be a
    multiple of ``chunk``; r <= chunk.

    Per chunk: grouped block-diagonal one-hot matmuls decode the tile to
    bf16 rows in VMEM, one (Q, d) @ (d, chunk) bf16 matmul scores it, and
    ``lax.approx_min_k`` (the TPU PartialReduce unit, O(chunk)) emits the
    chunk's best r as a scan OUTPUT — no running merge (an exact
    top_k over the carry costs O(r^2) per chunk and measured 3-20 s per
    1M-row batch; stacking outputs costs memory, Q*nc*r*8 bytes, which
    the caller bounds by sub-batching queries). Selection then happens
    ONCE more at the end: approx_min_k over the pooled (Q, nc*r)
    candidates — each true top-r row faces exactly TWO approximate
    selections, so there is no per-chunk compounding.

    Candidate granularity is per-ROW: a tile-minima variant (the flat
    coarse kernel's architecture) was measured and rejected here — PQ
    candidates need |pool| ~ r useful rows, and with neighbors scattered
    ~1 per 16-row tile, tile-granular pools waste 15/16 of the re-rank
    budget (recall 0.27 vs 0.99 at the same row budget).

    Returns (scores (Q, r) ascending, slots (Q, r) int32). Scores are
    rank-surrogates (per-query constants dropped; bf16 dots); +inf marks
    dead/masked slots — fewer than r live rows surface as +inf tails.
    """
    n, m = codes.shape
    if n % chunk:
        raise ValueError(f"codes rows {n} must be a multiple of "
                         f"chunk {chunk}")
    if r > chunk:
        raise ValueError(f"r={r} exceeds chunk={chunk}")
    q = queries.shape[0]
    g, spgk, spgd = bd.shape
    ksub = cnorm.shape[1]
    spg = spgk // ksub
    # codewords are bf16 values (pq_fit rounds them), so this cast — and
    # therefore the whole decode — is EXACT
    bd_bf = bd.astype(jnp.bfloat16)
    cnorm_g = cnorm.reshape(g, spg, ksub)
    # hi/lo query split (the flat coarse kernel's trick): q = q_hi + q_lo
    # recovers the f32 query exactly across two bf16 MXU passes — plain
    # bf16 rounding of q perturbs scores past the tiny neighbor gaps on
    # manifold data and candidate coverage plateaus
    q32 = queries.astype(jnp.float32)
    q_hi = q32.astype(jnp.bfloat16)
    q_lo = (q32 - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    iota_k = jnp.arange(ksub, dtype=jnp.uint8)

    nc = n // chunk
    codes_c = codes.reshape(nc, chunk, m)
    valid_c = valid.reshape(nc, chunk)
    base = (jnp.arange(nc, dtype=jnp.int32) * chunk)
    inf = jnp.float32(jnp.inf)

    def body(_, inp):
        cc, vc, b = inp
        # (chunk, g, spg) -> (g, chunk, spg) one-hot in group-major layout
        cg = cc.reshape(chunk, g, spg).transpose(1, 0, 2)
        oh = (cg[..., None] == iota_k).astype(jnp.bfloat16)
        oh3 = oh.reshape(g, chunk, spgk)
        dec = jnp.einsum("gck,gkd->gcd", oh3, bd_bf,
                         preferred_element_type=jnp.bfloat16)
        decoded = dec.transpose(1, 0, 2).reshape(chunk, g * spgd)
        # exact decoded-row sq norm from the codebook (disjoint subspaces)
        xsq = jnp.einsum("gcsk,gsk->c", oh, cnorm_g,
                         preferred_element_type=jnp.float32)
        dt = decoded.T
        dots = (jnp.matmul(q_hi, dt, preferred_element_type=jnp.float32)
                + jnp.matmul(q_lo, dt,
                             preferred_element_type=jnp.float32))
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
        return 0, (cv, (cl + b).astype(jnp.int32))

    _, (vals, idx) = jax.lax.scan(body, 0, (codes_c, valid_c, base))
    vals = vals.transpose(1, 0, 2).reshape(q, nc * r)     # (Q, nc*r)
    idx = idx.transpose(1, 0, 2).reshape(q, nc * r)
    # the pooled pass must be EXACT: stage-1 blocks are sorted ascending,
    # so the best candidates cluster at block heads and approx_min_k's
    # positional reduction buckets collide them (measured: two-stage
    # approx covers 0.81 of the true top-10 vs 0.998 with an exact pooled
    # pass, 2^18 rows). top_k over nc*r columns is cheap next to the scan.
    fv, pos = jax.lax.top_k(-vals, r)
    return -fv, jnp.take_along_axis(idx, pos, axis=1)


def pq_distortion(rows, codebook, codes):
    """Mean squared reconstruction error (host-side diagnostic)."""
    import numpy as np
    m, ksub, dsub = codebook.shape
    rec = np.concatenate(
        [np.asarray(codebook)[j, np.asarray(codes)[:, j]]
         for j in range(m)], axis=1)
    diff = np.asarray(rows, dtype=np.float32) - rec
    return float(np.mean(np.sum(diff * diff, axis=1)))
