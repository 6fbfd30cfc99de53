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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..distance import DistanceMetric


def fit_opq_rotation(sample, m: int) -> "np.ndarray":
    """PCA + eigenvalue-balanced subspace allocation: the pre-rotation
    approximation of Optimized Product Quantization (Ge et al., CVPR'13
    — the 'OPQ parametric' initialization, also Faiss's OPQ prefix).

    PQ quantizes each dsub-wide coordinate slice independently, so code
    entropy spent on a subspace is wasted unless that slice carries
    independent signal. Real embedding data concentrates its energy in a
    low-dimensional subspace spread across ALL raw coordinates (the
    north-star protocol's intrinsic-dim-32 data is exactly this); an
    orthogonal rotation that (a) decorrelates coordinates (PCA) and
    (b) deals the principal directions across subspaces so each gets an
    equal share of the variance PRODUCT makes every codebook count.
    Euclidean/dot/cosine are all rotation-invariant, so searching in the
    rotated space returns the same neighbors; the exact host re-rank
    uses the TRUE unrotated rows either way.

    Returns R (d, d) f32 with columns = permuted eigenvectors; rows and
    queries rotate as ``x @ R``. Host-only and deterministic (LAPACK
    eigh on the uncentered second moment — centering would break
    dot-product/cosine invariance)."""
    import heapq

    import numpy as np
    x = np.asarray(sample, np.float32)
    n, d = x.shape
    dsub = d // m
    # energy structure saturates on a modest subsample; keep the host
    # covariance pass cheap at 262k-row training samples
    if n > _OPQ_COV_ROWS:
        x = x[:: n // _OPQ_COV_ROWS][:_OPQ_COV_ROWS]
    cov = (x.T @ x) / np.float32(max(len(x), 1))
    w, v = np.linalg.eigh(cov.astype(np.float64))
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    # greedy balanced allocation: next (largest) eigenvalue goes to the
    # non-full bucket with the smallest log-eigenvalue load
    buckets: list[list[int]] = [[] for _ in range(m)]
    heap = [(0.0, j) for j in range(m)]
    heapq.heapify(heap)
    for i in range(d):
        while True:
            load, j = heapq.heappop(heap)
            if len(buckets[j]) < dsub:
                break
        buckets[j].append(i)
        if len(buckets[j]) < dsub:
            heapq.heappush(
                heap, (load + float(np.log(max(w[i], 1e-12))), j))
    cols = [i for j in range(m) for i in buckets[j]]
    return np.ascontiguousarray(v[:, cols], np.float32)


_OPQ_COV_ROWS = 65536


def _maybe_rotate(x, rot):
    """x @ R at full f32 precision (HIGHEST: bf16-pass rounding of the
    rotation would perturb coordinates past the tiny neighbor gaps the
    hi/lo query split exists to preserve)."""
    if rot is None:
        return x
    return jnp.matmul(x.astype(jnp.float32), rot,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)


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
def pq_fit(sample, key, m: int, ksub: int, iters: int, chunk: int,
           rot=None):
    """Batched subspace k-means: (S, d) f32 -> codebook (m, ksub, dsub).
    With ``rot`` (fit_opq_rotation output) the fit runs in the rotated
    space — one MXU matmul folded into the program.

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
    sample = _maybe_rotate(sample.astype(jnp.float32), rot)
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
def pq_encode(rows, codebook, chunk: int, rot=None):
    """(N, d) rows -> (N, m) uint8 codes (nearest codeword per subspace).

    Chunked over rows; N must be a multiple of ``chunk`` (callers pad and
    slice). Works on f32 rows; int8/bf16-stored indexes pass their
    dequantized host values. With ``rot`` the rows are rotated into the
    codebook's OPQ space first (fit_opq_rotation).
    """
    n, d = rows.shape
    if n % chunk:
        raise ValueError(f"rows {n} not a multiple of chunk {chunk}")
    m, ksub, dsub = codebook.shape
    cnorm = jnp.sum(codebook * codebook, axis=-1)

    sub = _subspace_view(_maybe_rotate(rows.astype(jnp.float32), rot), m)
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


_DECODE_BLK = 256    # rows per decode-kernel grid step: the VMEM one-hot
                     # is (blk, spg*ksub) bf16 = 2 MB at 256 x 4096


def _pq_decode_pallas_kernel(codes_ref, bd_ref, out_ref, oh_ref, *,
                             spg: int, ksub: int):
    """One grid step: decode a (blk, m) uint8 code block against the
    whole block-diagonal codebook (VMEM-resident, ~6 MB at m=96,
    ksub=256). The one-hot NEVER leaves VMEM — the XLA lowering of
    ``_decode_block`` materializes the (chunk, m, ksub) one-hot in HBM
    (~48 KB per 96-byte code row: measured 278 ms for a 2^20-row decode
    whose MXU floor is ~33 ms), which made every PQ scan call
    decode-bound and Q-independent. Per group: the one-hot is built with
    static slice writes (spg VPU compares of (blk, ksub)), then one MXU
    matmul (blk, spg*ksub) @ (spg*ksub, spg*dsub) fills that group's
    output columns. The output is EXACT: pq_fit rounds codewords to bf16
    values and each output element has exactly one nonzero contribution
    (one-hot x block-diagonal), so the f32->bf16 result carries the
    codeword value bit-for-bit."""
    blk = oh_ref.shape[0]
    g = bd_ref.shape[0]
    spgd = bd_ref.shape[2]
    codes = codes_ref[:].astype(jnp.int32)              # (blk, m)
    iota = jax.lax.broadcasted_iota(jnp.int32, (blk, ksub), 1)
    for gi in range(g):
        for s in range(spg):
            c = gi * spg + s
            oh_ref[:, s * ksub:(s + 1) * ksub] = (
                codes[:, c:c + 1] == iota).astype(jnp.bfloat16)
        # f32 accumulator (Mosaic requires 32-bit matmul acc); the cast
        # back is exact — one nonzero contribution per output element
        out_ref[:, gi * spgd:(gi + 1) * spgd] = jax.lax.dot_general(
            oh_ref[:], bd_ref[gi], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pq_decode_rows(codes, bd_bf, interpret: bool = False):
    """(rows, m) uint8 codes -> (rows, d) bf16 decoded rows via the
    VMEM-resident one-hot kernel. ``bd_bf`` is pack_codebook's output
    cast to bf16 (exact — fit rounds codewords to bf16 values). The grid
    runs over row blocks only; the packed codebook is one grid-invariant
    VMEM block (Mosaic fetches it once). rows must divide into
    _DECODE_BLK blocks (scan chunks are pow2)."""
    rows, m = codes.shape
    g, spgk, spgd = bd_bf.shape
    spg = m // g
    ksub = spgk // spg
    blk = _DECODE_BLK if rows % _DECODE_BLK == 0 else rows
    if rows % blk:
        raise ValueError(f"rows {rows} not a multiple of blk {blk}")
    return pl.pallas_call(
        functools.partial(_pq_decode_pallas_kernel, spg=spg, ksub=ksub),
        out_shape=jax.ShapeDtypeStruct((rows, g * spgd), jnp.bfloat16),
        grid=(rows // blk,),
        in_specs=[
            pl.BlockSpec((blk, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, spgk, spgd), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, g * spgd), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((blk, spgk), jnp.bfloat16)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * spgk * spgd * g,
            bytes_accessed=rows * m + g * spgk * spgd * 2
            + rows * g * spgd * 2,
            transcendentals=0,
        ),
    )(codes, bd_bf)


def _decode_block_pallas(cc, bd_bf, interpret: bool = False):
    """Pallas decode + VPU norms: drop-in for ``_decode_block`` on the
    TPU backend. The decoded-row sq-norm comes from summing exact-bf16
    coordinate squares in f32 instead of the codebook-norm table —
    identical values modulo f32 summation order (scores are rank
    surrogates; the exact re-rank downstream is unaffected)."""
    decoded = pq_decode_rows(cc, bd_bf, interpret=interpret)
    d32 = decoded.astype(jnp.float32)
    return decoded, jnp.sum(d32 * d32, axis=1)


def _decode_block_auto(cc, bd_bf, cnorm_g, iota_k, pallas: bool):
    """Static dispatch between the Pallas and XLA decodes: the kernel
    needs the (static) row count to tile into _DECODE_BLK blocks; odd
    tails (IVF spill regions) keep the XLA path."""
    rows = cc.shape[0]
    if pallas and rows % _DECODE_BLK == 0:
        return _decode_block_pallas(cc, bd_bf)
    return _decode_block(cc, bd_bf, cnorm_g, iota_k)


def _split_query(queries):
    """f32 queries -> (hi, lo) bf16 pair with hi + lo == q exactly (the
    flat coarse kernel's trick): two bf16 MXU passes recover the f32
    query dot without rounding — plain bf16 rounding of q perturbs scores
    past the tiny neighbor gaps on manifold data and candidate coverage
    plateaus."""
    q32 = queries.astype(jnp.float32)
    q_hi = q32.astype(jnp.bfloat16)
    q_lo = (q32 - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return q_hi, q_lo


def _decode_block(cc, bd_bf, cnorm_g, iota_k):
    """(rows, m) uint8 codes -> ((rows, d) bf16 decoded rows,
    (rows,) f32 exact decoded sq-norms). The decode is EXACT in bf16
    because pq_fit rounds codewords to bf16 values. Grouped
    block-diagonal one-hot matmuls keep the MXU a full lane tile wide
    (see pack_codebook)."""
    rows = cc.shape[0]
    g, spgk, spgd = bd_bf.shape
    spg = cnorm_g.shape[1]
    cg = cc.reshape(rows, g, spg).transpose(1, 0, 2)
    oh = (cg[..., None] == iota_k).astype(jnp.bfloat16)
    oh3 = oh.reshape(g, rows, spgk)
    dec = jnp.einsum("gck,gkd->gcd", oh3, bd_bf,
                     preferred_element_type=jnp.bfloat16)
    decoded = dec.transpose(1, 0, 2).reshape(rows, g * spgd)
    # exact decoded-row sq norm from the codebook (disjoint subspaces)
    rsq = jnp.einsum("gcsk,gsk->c", oh, cnorm_g,
                     preferred_element_type=jnp.float32)
    return decoded, rsq


def _use_pallas_decode(n_rows: int, m: int, chunk: int) -> bool:
    """Engage the VMEM one-hot decode kernel on the TPU backend when the
    chunk divides into decode blocks. CPU/virtual-mesh runs keep the XLA
    decode (the kernel is interpret-tested there)."""
    import os
    if os.environ.get("VDB_PQ_NO_PALLAS_DECODE"):
        return False
    try:
        return (jax.default_backend() == "tpu"
                and chunk % min(_DECODE_BLK, chunk) == 0)
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("metric", "r", "chunk",
                                             "recall_target",
                                             "pallas_decode"))
def pq_scan_topr(queries, codes, bd, cnorm, valid, metric: DistanceMetric,
                 r: int, chunk: int, recall_target: float = 0.95,
                 rot=None, pallas_decode: bool = False):
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
    # codes approximate ROTATED rows (OPQ), so the query moves into the
    # same space; distances are rotation-invariant, candidates carry over
    q_hi, q_lo = _split_query(_maybe_rotate(queries, rot))
    iota_k = jnp.arange(ksub, dtype=jnp.uint8)

    nc = n // chunk
    codes_c = codes.reshape(nc, chunk, m)
    valid_c = valid.reshape(nc, chunk)
    base = (jnp.arange(nc, dtype=jnp.int32) * chunk)
    inf = jnp.float32(jnp.inf)

    def body(_, inp):
        cc, vc, b = inp
        decoded, xsq = _decode_block_auto(cc, bd_bf, cnorm_g, iota_k,
                                          pallas_decode)
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


@functools.partial(jax.jit, static_argnames=("metric", "r", "cpc", "span",
                                             "nlist", "recall_target",
                                             "pallas_decode"))
def ivfpq_scan_topr(queries, codes, bd, cnorm, valid, cents, csq, cid_sp,
                    metric: DistanceMetric, r: int, cpc: int, span: int,
                    nlist: int, recall_target: float = 0.85, rot=None,
                    pallas_decode: bool = False):
    """Residual-corrected streaming PQ scan over an IVF slot layout ->
    top-r candidate rows per query.

    The database row decodes as ``x_hat = c + r_hat``: ``c`` is the
    owning cluster's centroid (constant over each ``span``-row cluster
    block — the IVF repack contract, index/ivf.py) and ``r_hat`` the
    PQ-decoded RESIDUAL. Residual coding is what plain PQ lacks on
    clustered data: within a tight cluster the rows differ only by
    small deviations that sit below global quantization resolution, so
    raw-row codes tie (measured recall ~=0.55 at 1M x 768 hard-clustered
    regardless of refine); subtracting the centroid re-centers the
    codebook on exactly those deviations.

    Exactness of the arithmetic (coverage quality): centroids and
    codewords are bf16 VALUES (rounded at fit time), decoded residuals
    are exact bf16, and queries split hi/lo across two bf16 MXU passes,
    so every term below carries only f32-accumulation rounding:

    * ``q . x_hat = q . c + q . r_hat`` — ``q . c`` comes from ONE
      (Q, nlist) matmul hoisted out of the scan (each cluster's dot is
      reused by all ``span`` rows of its block); ``q . r_hat`` from the
      per-chunk decode matmul.
    * ``|x_hat|^2 = |c|^2 + 2 c . r_hat + |r_hat|^2`` — ``|c|^2`` from a
      host table, ``|r_hat|^2`` exactly from the codebook, ``c . r_hat``
      as a per-chunk batched rowwise product (VPU-cheap).

    Layout: rows [0, nlist*span) are cluster blocks; rows
    [nlist*span, N) are the IVF spill region, whose rows were encoded as
    residuals vs their NEAREST centroid (``cid_sp`` int32[S], garbage
    for dead slots — masked). The spill block is dense per-row work
    (gathered centroids + two extra matmuls): fine while the spill stays
    the few-percent region the IVF layout keeps it.

    The main region streams through a lax.scan in chunks of
    ``cpc * span`` rows (dynamic_slice — no materialized copy); a
    cluster-count tail that doesn't fill a chunk runs once, padded. The
    pooled pass at the end is an EXACT top_k (same argument as
    pq_scan_topr: stage-1 blocks arrive sorted, approx buckets collide
    their heads).

    With ``rot`` (OPQ, fit on the residual sample) the WHOLE scan space
    is rotated: codes approximate rotated residuals, ``cents``/``csq``
    are the caller's rotated (bf16-rounded) centroid table, and the
    query rotates here — every term below then lives consistently in
    the rotated space, where all three metrics are invariant. The exact
    host re-rank uses the true unrotated rows either way.

    Returns (scores (Q, r) ascending, slots (Q, r) int32 in SLOT space).
    Scores are rank-surrogates (per-query constants dropped); +inf marks
    dead/masked slots.
    """
    n, m = codes.shape
    big_m = nlist * span
    s_rows = n - big_m
    chunk = cpc * span
    if r > chunk:
        raise ValueError(f"r={r} exceeds chunk={chunk}")
    q, d = queries.shape
    g, spgk, spgd = bd.shape
    ksub = cnorm.shape[1]
    spg = spgk // ksub
    bd_bf = bd.astype(jnp.bfloat16)
    cnorm_g = cnorm.reshape(g, spg, ksub)
    q_hi, q_lo = _split_query(_maybe_rotate(queries, rot))
    iota_k = jnp.arange(ksub, dtype=jnp.uint8)
    inf = jnp.float32(jnp.inf)

    nfull = big_m // chunk
    tail_cl = nlist - nfull * cpc
    # pad the centroid tables to the chunk grid so the tail call's
    # dynamic_slice never clamps back into real clusters
    nlist_pad = (nfull + (1 if tail_cl else 0)) * cpc
    cents_bf = cents.astype(jnp.bfloat16)         # exact: values are bf16
    if nlist_pad != nlist:
        cents_bf = jnp.concatenate(
            [cents_bf, jnp.zeros((nlist_pad - nlist, d), jnp.bfloat16)])
        csq = jnp.concatenate(
            [csq, jnp.zeros((nlist_pad - nlist,), csq.dtype)])
    # q . c for every cluster, ONCE (hoisted out of the scan)
    qc = (jnp.matmul(q_hi, cents_bf.T, preferred_element_type=jnp.float32)
          + jnp.matmul(q_lo, cents_bf.T,
                       preferred_element_type=jnp.float32))

    def chunk_scores(cc, vc, c0):
        """Scores for one cluster-aligned chunk starting at cluster c0."""
        decoded, rsq = _decode_block_auto(cc, bd_bf, cnorm_g, iota_k,
                                          pallas_decode)
        cen = jax.lax.dynamic_slice(cents_bf, (c0, 0), (cpc, d))
        cr = jnp.einsum("csd,cd->cs",
                        decoded.reshape(cpc, span, g * spgd), cen,
                        preferred_element_type=jnp.float32)
        csq_c = jax.lax.dynamic_slice(csq, (c0,), (cpc,))
        xsq = (csq_c[:, None] + 2.0 * cr
               + rsq.reshape(cpc, span)).reshape(chunk)
        dt = decoded.T
        qr = (jnp.matmul(q_hi, dt, preferred_element_type=jnp.float32)
              + jnp.matmul(q_lo, dt, preferred_element_type=jnp.float32))
        qc_c = jax.lax.dynamic_slice(qc, (0, c0), (q, cpc))
        dots = qr + jnp.repeat(qc_c, span, axis=1)
        if metric is DistanceMetric.DOT_PRODUCT:
            scores = -dots
        elif metric is DistanceMetric.EUCLIDEAN:
            scores = xsq[None, :] - 2.0 * dots            # + |q|^2 dropped
        else:                                             # cosine
            xnorm = jnp.sqrt(jnp.maximum(xsq, 1e-30))
            scores = -dots / xnorm[None, :]               # / |q| dropped
        return jnp.where(vc[None, :], scores, inf)

    pools_v, pools_i = [], []
    if nfull:
        def body(_, j):
            r0 = j * chunk
            cc = jax.lax.dynamic_slice(codes, (r0, 0), (chunk, m))
            vc = jax.lax.dynamic_slice(valid, (r0,), (chunk,))
            scores = chunk_scores(cc, vc, j * cpc)
            cv, cl = jax.lax.approx_min_k(scores, r,
                                          recall_target=recall_target)
            return 0, (cv, (cl + r0).astype(jnp.int32))

        _, (vals, idx) = jax.lax.scan(body, 0,
                                      jnp.arange(nfull, dtype=jnp.int32))
        pools_v.append(vals.transpose(1, 0, 2).reshape(q, nfull * r))
        pools_i.append(idx.transpose(1, 0, 2).reshape(q, nfull * r))
    if tail_cl:
        t0 = nfull * chunk
        trows = tail_cl * span
        cc = jax.lax.dynamic_slice(codes, (t0, 0), (trows, m))
        vc = jax.lax.dynamic_slice(valid, (t0,), (trows,))
        cc = jnp.concatenate(
            [cc, jnp.zeros((chunk - trows, m), cc.dtype)])
        vc = jnp.concatenate(
            [vc, jnp.zeros((chunk - trows,), vc.dtype)])
        scores = chunk_scores(cc, vc, nfull * cpc)
        r_t = min(r, trows)
        cv, cl = jax.lax.approx_min_k(scores, r_t,
                                      recall_target=recall_target)
        pools_v.append(cv)
        pools_i.append((cl + t0).astype(jnp.int32))
    if s_rows:
        cc = jax.lax.dynamic_slice(codes, (big_m, 0), (s_rows, m))
        vc = jax.lax.dynamic_slice(valid, (big_m,), (s_rows,))
        dec_sp, rsq_sp = _decode_block_auto(cc, bd_bf, cnorm_g, iota_k,
                                            pallas_decode)
        cid = jnp.clip(cid_sp, 0, nlist - 1)
        cen_sp = jnp.take(cents_bf, cid, axis=0)          # (S, d)
        cr_sp = jnp.einsum("sd,sd->s", dec_sp, cen_sp,
                           preferred_element_type=jnp.float32)
        xsq = jnp.take(csq, cid) + 2.0 * cr_sp + rsq_sp
        dots = (jnp.matmul(q_hi, dec_sp.T,
                           preferred_element_type=jnp.float32)
                + jnp.matmul(q_lo, dec_sp.T,
                             preferred_element_type=jnp.float32)
                + jnp.matmul(q_hi, cen_sp.T,
                             preferred_element_type=jnp.float32)
                + jnp.matmul(q_lo, cen_sp.T,
                             preferred_element_type=jnp.float32))
        if metric is DistanceMetric.DOT_PRODUCT:
            scores = -dots
        elif metric is DistanceMetric.EUCLIDEAN:
            scores = xsq[None, :] - 2.0 * dots
        else:
            xnorm = jnp.sqrt(jnp.maximum(xsq, 1e-30))
            scores = -dots / xnorm[None, :]
        scores = jnp.where(vc[None, :], scores, inf)
        r_sp = min(r, s_rows)
        cv, cl = jax.lax.approx_min_k(scores, r_sp,
                                      recall_target=recall_target)
        pools_v.append(cv)
        pools_i.append((cl + big_m).astype(jnp.int32))

    vals = jnp.concatenate(pools_v, axis=1)
    idx = jnp.concatenate(pools_i, axis=1)
    # exact pooled pass (see pq_scan_topr note); a tiny index can pool
    # fewer than r candidates — return what exists
    r_out = min(r, vals.shape[1])
    fv, pos = jax.lax.top_k(-vals, r_out)
    return -fv, jnp.take_along_axis(idx, pos, axis=1)


_RERANK_DEV_QBLK = 512   # queries per gather block: bounds the (blk, r, d)
                         # gathered-row transient to ~200 MB at r=128, d=768


@functools.partial(jax.jit, static_argnames=("metric", "k"))
def pq_rerank_topk(queries, rows, slots, scan_scores, valid,
                   metric: DistanceMetric, k: int):
    """Exact f32 re-rank of PQ scan candidates ON DEVICE.

    The host re-rank (index/pq._PqCodesCore._rerank) is the measured
    dominant cost of a PQ query — a Q*r row gather plus BLAS on the one
    shared host core, linear in refine (BASELINE.md: IVF-PQ falls 1.6k
    -> 0.4k QPS as refine goes 16 -> 128). When the full-precision rows
    are device-resident this program replaces it: gather the candidate
    rows from HBM, compute exact f32 distances in the same direct forms
    as the host path (difference form for euclidean — no |q|^2+|x|^2-2qx
    cancellation; HIGHEST-precision dots for dot/cosine), mask dead
    candidates, and return only the top-k (Q, k) pair — the D2H shrinks
    from (Q, r) candidates to (Q, k) results.

    Args: queries (Q, d) f32; rows (capacity, d) f32 — the index's
    synced device row mirror, snapshot-consistent with the codes the
    scan used; slots (Q, r) int32 candidate slots; scan_scores (Q, r)
    (+inf marks empty candidate columns); valid (capacity,) bool (the
    caller folds any filter mask in). Returns (dists (Q, k) f32
    ascending with +inf tail, slots (Q, k) int32). Queries are processed
    in _RERANK_DEV_QBLK blocks via lax.map so the gathered (blk, r, d)
    transient stays bounded next to a multi-GB row mirror.
    """
    q, r = slots.shape
    blk = min(_RERANK_DEV_QBLK, q)
    if q % blk:
        blk = q   # non-pow2 Q (callers pad; this is the safe fallback)
    nb = q // blk

    def body(args):
        qb, sl, sc = args
        g = rows[sl]                                    # (blk, r, d)
        ok = jnp.isfinite(sc) & valid[sl]
        if metric is DistanceMetric.EUCLIDEAN:
            diff = g - qb[:, None, :]
            dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        elif metric is DistanceMetric.DOT_PRODUCT:
            dist = -jnp.einsum("qrd,qd->qr", g, qb,
                               precision=jax.lax.Precision.HIGHEST)
        else:
            dots = jnp.einsum("qrd,qd->qr", g, qb,
                              precision=jax.lax.Precision.HIGHEST)
            qn = jnp.sqrt(jnp.sum(qb * qb, axis=1))[:, None]
            xn = jnp.sqrt(jnp.sum(g * g, axis=-1))
            denom = jnp.maximum(qn * xn, 1e-30)
            dist = 1.0 - jnp.clip(dots / denom, -1.0, 1.0)
        dist = jnp.where(ok, dist.astype(jnp.float32), jnp.inf)
        neg, pos = jax.lax.top_k(-dist, k)
        return -neg, jnp.take_along_axis(sl, pos, axis=1)

    if nb == 1:
        return body((queries, slots, scan_scores))
    out_d, out_s = jax.lax.map(
        body, (queries.reshape(nb, blk, queries.shape[1]),
               slots.reshape(nb, blk, r),
               scan_scores.reshape(nb, blk, r)))
    return out_d.reshape(q, k), out_s.reshape(q, k)


@functools.partial(jax.jit, static_argnames=("metric", "k"))
def pq_rerank_gathered(queries, rows, ok, metric: DistanceMetric, k: int):
    """Exact f32 re-rank of HOST-GATHERED candidate rows ON DEVICE — the
    ``host_backing`` / beyond-HBM lane of the device re-rank.

    ``pq_rerank_topk`` needs the full row matrix resident in HBM; at
    33.5M x 768 the rows live in a 103 GB disk memmap, so the host must
    gather the (Q, r, d) candidate rows anyway (OS page cache serves
    them). What still moves off the host is everything AFTER the gather:
    the exact f32 distances + top-k run on chip, the host's einsum/sort
    (the measured dominant re-rank cost on this single-core host)
    disappears, and the caller pipelines the next block's disk gather
    under this block's H2D + compute.

    Args: queries (Qb, d) f32 · rows (Qb, r, d) f32 gathered candidate
    rows · ok (Qb, r) bool (scan-finite & not-mutated & valid & filter —
    the caller's snapshot-consistency mask). Distances use the same
    direct forms as the host path (difference form for euclidean, no
    |q|^2+|x|^2-2qx cancellation). Returns (dists (Qb, k) f32 ascending,
    +inf tail; pos (Qb, k) int32 positions INTO the r candidate axis —
    the caller maps positions to ids with its host-side snapshot).
    """
    if metric is DistanceMetric.EUCLIDEAN:
        diff = rows - queries[:, None, :]
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    elif metric is DistanceMetric.DOT_PRODUCT:
        dist = -jnp.einsum("qrd,qd->qr", rows, queries,
                           precision=jax.lax.Precision.HIGHEST)
    else:
        dots = jnp.einsum("qrd,qd->qr", rows, queries,
                          precision=jax.lax.Precision.HIGHEST)
        qn = jnp.sqrt(jnp.sum(queries * queries, axis=1))[:, None]
        xn = jnp.sqrt(jnp.sum(rows * rows, axis=-1))
        denom = jnp.maximum(qn * xn, 1e-30)
        dist = 1.0 - jnp.clip(dots / denom, -1.0, 1.0)
    dist = jnp.where(ok, dist.astype(jnp.float32), jnp.inf)
    neg, pos = jax.lax.top_k(-dist, k)
    return -neg, pos.astype(jnp.int32)


def pq_distortion(rows, codebook, codes):
    """Mean squared reconstruction error (host-side diagnostic)."""
    import numpy as np
    m, ksub, dsub = codebook.shape
    rec = np.concatenate(
        [np.asarray(codebook)[j, np.asarray(codes)[:, j]]
         for j in range(m)], axis=1)
    diff = np.asarray(rows, dtype=np.float32) - rec
    return float(np.mean(np.sum(diff * diff, axis=1)))
