"""Fused Pallas coarse-scan kernel: the flat index's hot path on TPU.

Replaces the XLA scan's two big costs at once (measured at N=2^20, d=768,
Q=1024 on one v5e chip; see benchmarks/exp_*.py):

  * the f32 "highest"-precision distance matmul (6 bf16 MXU passes, 81.6 ms)
    becomes 1 bf16 pass (fast mode) or 3 passes (bf16x3, f32-grade;
    certified-exact mode) over a stored hi/lo bf16 split of the database;
  * the (Q, N) distance-matrix materialization + separate tile-min reduce
    (+18 ms) disappears: the kernel reduces each 16-row subtile to its
    minimum in VMEM and only (Q, N/16) minima ever reach HBM.

Layout is chosen so Mosaic inserts no operand copies: database tiles are
the MXU lhs in natural (TN, d) row-major form, queries arrive pre-transposed
as the (d, Q) rhs, and the subtile min reduces over the *sublane* axis.

The exact mode is **certified**: phase 2 re-ranks the k best tiles per query
at f32-highest precision and checks, per query, that the k-th refined
distance clears the m-th best tile's refined minimum by a rigorous bound on
the bf16x3 rounding error (|dot err| <= (2^-17 + d*2^-24) |q| |x|, from the
dropped lo*lo term plus f32 accumulation). Uncertified queries — never
observed on real data, but possible in principle — make the caller fall
back to the full-precision XLA path (ops/topk.py), so exactness is
unconditional. Reference semantics preserved: src/flat_index.rs:52-65
(scan everything, k smallest, ascending), src/distance.rs:20-33.

The caller (ops/topk.flat_search_batched) engages this path only when the
index maintains the hi/lo device mirrors (FlatIndex does so on TPU
backends automatically; set VDB_TPU_NO_PALLAS=1 to opt out).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..distance import DistanceMetric

SUB = 16            # rows per candidate tile (refine granularity)
_SUP_PAD = 8        # Mosaic min sublane block for the fused super output
# Max query columns per kernel block. 4096 lets the db stream ONCE per
# 4096-query headline batch instead of 4x (measured 40.5 -> 38.5 ms for
# the 1-pass coarse scan at N=2^20 x 768 — 87% MXU; benchmarks/
# exp_roofline.py); the VMEM budget below keeps the worst kernel
# (3-pass: qhi+qlo blocks + double-buffered hi/lo tiles + out) under
# ~24 MB of live VMEM at d=768.
_QB_MAX = 4096
_VMEM_BUDGET = 48 * 1024 * 1024
# Penalty added to invalid slots: far past any real distance, far from inf.
PENALTY = 1e30
# Max k served by the coarse path (refine pools and the DMA refine
# kernel chunk over tile groups, so large k costs bandwidth linearly
# instead of falling off a cliff); past this the XLA scan serves.
MAX_K = 256


def interpret_mode() -> bool:
    """Interpreter-mode toggle so the CPU test mesh can run the kernel."""
    return bool(os.environ.get("VDB_TPU_PALLAS_INTERPRET"))


def _metric_mode(metric_name: str) -> str:
    return {"euclidean": "euclidean", "dot_product": "dot",
            "cosine": "cosine"}[metric_name]


def _tile_cols(d: int) -> int:
    """Database rows per grid step, shrunk for very wide vectors so the
    hi/lo tiles stay within the VMEM budget."""
    tn = 512
    while tn > 16 and tn * d * 2 * 2 > _VMEM_BUDGET // 3:
        tn //= 2
    return tn


def _query_block(q: int, d: int, tn: int) -> int:
    qb = min(q, _QB_MAX)
    while qb > 128 and (d * qb * 2 * 2 + tn * qb * 4) > _VMEM_BUDGET // 2:
        qb //= 2
    while q % qb:
        qb //= 2
    return max(qb, 1)


def supports(capacity: int, d: int, k_eff: int) -> bool:
    """Whether the pallas coarse path can serve this signature."""
    tn = _tile_cols(d)
    return capacity >= tn and capacity % tn == 0 and k_eff <= MAX_K


def _coarse_kernel(qhi_ref, qlo_ref, qrow_ref, hi_ref, lo_ref, col_ref,
                   inv_ref, out_ref, *, passes: int, mode: str, tn: int):
    """One grid step: scores of one db tile against all queries -> subtile
    minima.

    qhi/qlo: (d, QB) bf16 queries (hi/lo split; lo unused when passes=1)
    qrow:    (1, QB) f32 per-query term (|q|^2 euclid, 1/|q| cosine)
    hi/lo:   (TN, d) bf16 db tile (natural MXU lhs layout)
    col:     (1, TN) f32 per-row term (|x|^2 euclid, 1/|x| cosine),
             transposed to (TN, 1) in VMEM — an (N, 1) HBM operand would be
             lane-padded 128x by the TPU tiled layout (2 GB at N=4M)
    inv:     (1, TN) f32 1.0 for dead/padded rows (same layout story)
    out:     (TN//SUB, QB) f32 minima — reduces over the SUBLANE axis, so
             no lane-splitting reshape (which Mosaic rejects) is needed.
    """
    col_t = col_ref[:].T
    inv_t = inv_ref[:].T
    dots = jax.lax.dot_general(
        hi_ref[:], qhi_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (TN, QB)
    if passes == 3:
        dots += jax.lax.dot_general(
            lo_ref[:], qhi_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dots += jax.lax.dot_general(
            hi_ref[:], qlo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    if mode == "euclidean":
        score = col_t + qrow_ref[:] - 2.0 * dots
    elif mode == "dot":
        score = -dots
    else:  # cosine: col = 1/|x|, qrow = 1/|q| -> -similarity
        score = -(dots * col_t * qrow_ref[:])
    score += inv_t * PENALTY
    qb = score.shape[1]
    out_ref[:] = score.reshape(tn // SUB, SUB, qb).min(axis=1)


@functools.partial(jax.jit,
                   static_argnames=("passes", "mode", "interpret"))
def _coarse_minima(qThi, qTlo, qrow, db_hi, db_lo, col, inv_col,
                   passes: int, mode: str, interpret: bool):
    """(Qp, N//SUB) coarse subtile minima (Q-major, materialized)."""
    d, qp = qThi.shape
    n = db_hi.shape[0]
    tn = _tile_cols(d)
    qb = _query_block(qp, d, tn)
    t = n // tn
    grid_spec = pl.GridSpec(
        # q outer, db tiles inner: the big db tiles stream once per q block
        # while the small query block stays VMEM-resident
        grid=(qp // qb, t),
        in_specs=[
            pl.BlockSpec((d, qb), lambda qi, ti: (0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, qb), lambda qi, ti: (0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb), lambda qi, ti: (0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, d), lambda qi, ti: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, d), lambda qi, ti: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda qi, ti: (0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda qi, ti: (0, ti),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn // SUB, qb), lambda qi, ti: (ti, qi),
                               memory_space=pltpu.VMEM),
    )
    bytes_db = n * d * 2 * (2 if passes == 3 else 1) * (qp // qb)
    minima_tq = pl.pallas_call(
        functools.partial(_coarse_kernel, passes=passes, mode=mode, tn=tn),
        out_shape=jax.ShapeDtypeStruct((n // SUB, qp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * n * d * passes,
            bytes_accessed=bytes_db + qp * d * 4 + qp * (n // SUB) * 4,
            transcendentals=0,
        ),
    )(qThi, qTlo, qrow, db_hi, db_lo, col, inv_col)
    # Load-bearing barrier: without it XLA fuses the lazy transpose into the
    # downstream top_k as strided reads over the tile axis (measured +80 ms
    # at N=2^20, Q=1024); the materialized transpose costs ~0.2 ms.
    return jax.lax.optimization_barrier(minima_tq.T)


def _coarse_kernel_1p(qhi_ref, qrow_ref, hi_ref, col_ref, inv_ref, out_ref,
                      *, mode: str, tn: int):
    """Single-pass (fast mode) kernel: no lo/qlo operands at all. The
    3-pass kernel's BlockSpecs DMA the lo tile every grid step even when
    passes=1 leaves it unused (the pipeline fetches declared blocks
    unconditionally) — at N=2^20 x 768, Q=4096 that is ~13 GB of dead
    HBM traffic per batch. This variant declares only what it reads."""
    col_t = col_ref[:].T
    inv_t = inv_ref[:].T
    dots = jax.lax.dot_general(
        hi_ref[:], qhi_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (TN, QB)
    if mode == "euclidean":
        score = col_t + qrow_ref[:] - 2.0 * dots
    elif mode == "dot":
        score = -dots
    else:
        score = -(dots * col_t * qrow_ref[:])
    score += inv_t * PENALTY
    qb = score.shape[1]
    out_ref[:] = score.reshape(tn // SUB, SUB, qb).min(axis=1)


def _coarse_minima_1p_tq(qThi, qrow, db_hi, col, inv_col, mode: str,
                         interpret: bool):
    """Single-pass coarse subtile minima in the kernel's natural (T, Qp)
    layout (no materialized transpose). Used by the bf16-storage path,
    where the (T, Qp) array at 8M rows is 2+ GB and doubling it for a
    transpose would break the HBM budget."""
    d, qp = qThi.shape
    n = db_hi.shape[0]
    tn = _tile_cols(d)
    qb = _query_block(qp, d, tn)
    t = n // tn
    grid_spec = pl.GridSpec(
        grid=(qp // qb, t),
        in_specs=[
            pl.BlockSpec((d, qb), lambda qi, ti: (0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb), lambda qi, ti: (0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, d), lambda qi, ti: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda qi, ti: (0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda qi, ti: (0, ti),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn // SUB, qb), lambda qi, ti: (ti, qi),
                               memory_space=pltpu.VMEM),
    )
    minima_tq = pl.pallas_call(
        functools.partial(_coarse_kernel_1p, mode=mode, tn=tn),
        out_shape=jax.ShapeDtypeStruct((n // SUB, qp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * n * d,
            bytes_accessed=n * d * 2 * (qp // qb) + qp * d * 2
            + qp * (n // SUB) * 4,
            transcendentals=0,
        ),
    )(qThi, qrow, db_hi, col, inv_col)
    return minima_tq


@functools.partial(jax.jit, static_argnames=("mode", "interpret"))
def _coarse_minima_1p(qThi, qrow, db_hi, col, inv_col, mode: str,
                      interpret: bool):
    """Fast-mode coarse minima: one bf16 pass, hi mirror only, (Qp, T)."""
    minima_tq = _coarse_minima_1p_tq(qThi, qrow, db_hi, col, inv_col, mode,
                                     interpret)
    # same load-bearing barrier as _coarse_minima
    return jax.lax.optimization_barrier(minima_tq.T)


def _coarse_kernel_1p_sup(qhi_ref, qrow_ref, hi_ref, col_ref, inv_ref,
                          out_ref, sup_ref, *, mode: str, tn: int):
    """1-pass kernel with the SUPER-tile reduction fused in: emits tile
    minima AND super-tile minima in one pass, so the hierarchical
    selection never re-reads the (T, Qp) tile array from HBM (a 1.07 GB
    read at N=2^20, Q=4096 — worth ~10 ms; benchmarks/exp_roofline.py)."""
    col_t = col_ref[:].T
    inv_t = inv_ref[:].T
    dots = jax.lax.dot_general(
        hi_ref[:], qhi_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (TN, QB)
    if mode == "euclidean":
        score = col_t + qrow_ref[:] - 2.0 * dots
    elif mode == "dot":
        score = -dots
    else:
        score = -(dots * col_t * qrow_ref[:])
    score += inv_t * PENALTY
    qb = score.shape[1]
    tmin = score.reshape(tn // SUB, SUB, qb).min(axis=1)
    out_ref[:] = tmin
    rows = tn // (SUB * SUPER)
    supmin = tmin.reshape(rows, SUPER, qb).min(axis=1)
    if rows % _SUP_PAD:
        # Mosaic requires sublane-dim-multiple-of-8 output blocks: pad the
        # super rows to 8 with +inf (sliced away by the caller; the padded
        # array is ~0.5 GB at N=2^20/Q=4096 — ~0.7 ms of writes vs the
        # ~10 ms HBM re-read it replaces)
        supmin = jnp.concatenate(
            [supmin, jnp.full((_SUP_PAD - rows, qb), jnp.inf,
                              jnp.float32)], axis=0)
    sup_ref[:] = supmin


def _coarse_kernel_f32_1p_sup(qhi_ref, qrow_ref, db_ref, col_ref, inv_ref,
                              out_ref, sup_ref, *, mode: str, tn: int):
    """f32-source single-pass kernel with the fused SUPER reduction
    (hi split in VMEM, zero extra HBM — serves 4M x 768 = 12 GB f32)."""
    tile = db_ref[:]
    hi = tile.astype(jnp.bfloat16)
    dots = jax.lax.dot_general(
        hi, qhi_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (TN, QB)
    col_t = col_ref[:].T
    inv_t = inv_ref[:].T
    if mode == "euclidean":
        score = col_t + qrow_ref[:] - 2.0 * dots
    elif mode == "dot":
        score = -dots
    else:
        score = -(dots * col_t * qrow_ref[:])
    score += inv_t * PENALTY
    qb = score.shape[1]
    tmin = score.reshape(tn // SUB, SUB, qb).min(axis=1)
    out_ref[:] = tmin
    rows = tn // (SUB * SUPER)
    supmin = tmin.reshape(rows, SUPER, qb).min(axis=1)
    if rows % _SUP_PAD:
        # Mosaic requires sublane-dim-multiple-of-8 output blocks: pad the
        # super rows to 8 with +inf (sliced away by the caller; the padded
        # array is ~0.5 GB at N=2^20/Q=4096 — ~0.7 ms of writes vs the
        # ~10 ms HBM re-read it replaces)
        supmin = jnp.concatenate(
            [supmin, jnp.full((_SUP_PAD - rows, qb), jnp.inf,
                              jnp.float32)], axis=0)
    sup_ref[:] = supmin


def _coarse_kernel_int8_1p_sup(qhi_ref, qrow_ref, db_ref, scl_ref, col_ref,
                               inv_ref, out_ref, sup_ref, *, mode: str,
                               tn: int):
    """int8-source single-pass kernel with the fused SUPER reduction
    (1 byte/element streamed — serves 16M x 768 = 12 GB of codes).

    Codes are integers in [-127, 127], so the in-kernel cast to bf16 is
    EXACT (bf16 represents every integer up to 256): the database-side
    residual is zero and the only coarse error vs the stored values
    s_r * code_r is the query's bf16 residual plus f32 accumulation —
    the standard 1-pass certificate with elo_max = 0. The per-row pow2
    scale multiply is exact in f32 (a pure exponent shift, see
    index/flat._int8_row_scales), so it adds no margin term."""
    codes = db_ref[:].astype(jnp.bfloat16)               # exact cast
    dots = jax.lax.dot_general(
        codes, qhi_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (TN, QB)
    sdots = dots * scl_ref[:].T                          # pow2: exact
    col_t = col_ref[:].T
    inv_t = inv_ref[:].T
    if mode == "euclidean":
        score = col_t + qrow_ref[:] - 2.0 * sdots
    elif mode == "dot":
        score = -sdots
    else:
        score = -(sdots * col_t * qrow_ref[:])
    score += inv_t * PENALTY
    qb = score.shape[1]
    tmin = score.reshape(tn // SUB, SUB, qb).min(axis=1)
    out_ref[:] = tmin
    rows = tn // (SUB * SUPER)
    supmin = tmin.reshape(rows, SUPER, qb).min(axis=1)
    if rows % _SUP_PAD:
        supmin = jnp.concatenate(
            [supmin, jnp.full((_SUP_PAD - rows, qb), jnp.inf,
                              jnp.float32)], axis=0)
    sup_ref[:] = supmin


def _minima_1p_sup(qThi, qrow, dbarr, col, inv_col, mode: str,
                   interpret: bool, src: str, scales=None):
    """(tile minima (T, Qp), super minima (T2, Qp)) in one kernel pass.
    ``dbarr`` is the bf16 hi mirror (src != "f32"), the f32 database
    (src == "f32"), or the int8 code matrix (src == "int8", with the
    per-row pow2 ``scales`` vector)."""
    d, qp = qThi.shape
    n = dbarr.shape[0]
    tn = _tile_cols(d)
    if tn % (SUB * SUPER):
        # very wide vectors shrink the db tile below one super-tile; fall
        # back to the single-output kernel + an XLA reduce
        if src == "int8":
            # no int8 single-output variant — supports_1p_int8 gates this
            raise NotImplementedError(
                "int8 coarse tier requires whole super-tiles per db tile")
        if src == "f32":
            qTlo = jnp.zeros_like(qThi)
            tile_tq = _coarse_minima_f32(qThi, qTlo, qrow, dbarr, col,
                                         inv_col, 1, mode, interpret).T
        else:
            tile_tq = _coarse_minima_1p_tq(qThi, qrow, dbarr, col, inv_col,
                                           mode, interpret)
        sup_tq = tile_tq.reshape(n // (SUB * SUPER), SUPER, qp).min(axis=1)
        return tile_tq, sup_tq
    qb = _query_block(qp, d, tn)
    t = n // tn
    rows = tn // (SUB * SUPER)          # super rows per grid step
    # Mosaic wants sublane-dim-multiple-of-8 output blocks: pad the super
    # block to 8 rows (+inf rows, sliced away below)
    prows = rows if rows % _SUP_PAD == 0 else _SUP_PAD
    itemsize = {"f32": 4, "int8": 1}.get(src, 2)
    bytes_db = n * d * itemsize * (qp // qb)
    in_specs = [
        pl.BlockSpec((d, qb), lambda qi, ti: (0, qi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, qb), lambda qi, ti: (0, qi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tn, d), lambda qi, ti: (ti, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tn), lambda qi, ti: (0, ti),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tn), lambda qi, ti: (0, ti),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qThi, qrow, dbarr, col, inv_col]
    if src == "int8":
        # per-row pow2 scale vector, same (1, TN) layout trick as col
        in_specs.insert(3, pl.BlockSpec((1, tn), lambda qi, ti: (0, ti),
                                        memory_space=pltpu.VMEM))
        operands.insert(3, scales.reshape(1, n))
    grid_spec = pl.GridSpec(
        grid=(qp // qb, t),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((tn // SUB, qb), lambda qi, ti: (ti, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((prows, qb), lambda qi, ti: (ti, qi),
                         memory_space=pltpu.VMEM),
        ),
    )
    kern = {"f32": _coarse_kernel_f32_1p_sup,
            "int8": _coarse_kernel_int8_1p_sup}.get(src,
                                                    _coarse_kernel_1p_sup)
    tile_tq, sup_pad = pl.pallas_call(
        functools.partial(kern, mode=mode, tn=tn),
        out_shape=(
            jax.ShapeDtypeStruct((n // SUB, qp), jnp.float32),
            jax.ShapeDtypeStruct((t * prows, qp), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * n * d,
            bytes_accessed=bytes_db + qp * d * 2
            + qp * (n // SUB) * 4 + qp * t * prows * 4,
            transcendentals=0,
        ),
    )(*operands)
    if prows != rows:
        sup_tq = sup_pad.reshape(t, prows, qp)[:, :rows].reshape(
            t * rows, qp)
    else:
        sup_tq = sup_pad
    return tile_tq, sup_tq


# Queries per refine-kernel grid step. Wider blocks raise the refine
# dot's MXU width utilization (the matmul is (qbr*m*SUB, d) x (d, qbr):
# output width = qbr of the MXU's 128 lanes) at the cost of a larger
# double-buffered VMEM scratch (2*qbr*m*SUB*d*4 B = 25 MB/qbr=8 at
# d=768, m=32). Env-tunable for roofline experiments.
_REFINE_QBR = int(os.environ.get("VDB_TPU_REFINE_QBR", "8"))


def _refine_chunk_rows(qp: int, m: int, d: int) -> int:
    """Query-chunk size for the XLA gather refine (bounds peak HBM)."""
    chunk = qp
    while chunk > 256 and chunk * m * SUB * d * 4 > _REFINE_BYTES:
        chunk //= 2
    return chunk


def _refine_dots_kernel(idx_cur, idx_nxt, q_ref, db_ref, out_ref,
                        scratch, sems, *, qbr: int, m: int,
                        nblocks: int):
    """Refine dots without materializing the candidate gather.

    The XLA refine (db3[tile_idx] -> einsum) moves the 6.4 GB candidate
    pool three times (gather read + materialize write + einsum read,
    ~35 ms at N=2^20, Q=4096, m=32). This kernel DMAs each query's m
    (SUB, d) db tiles straight from HBM into VMEM (double-buffered across
    grid steps, next block's tile ids arrive via a +1-shifted SMEM
    operand) and emits only the (Q, m*SUB) dot products — the candidate
    pool crosses HBM exactly once. Score assembly (norms, validity, inf
    masking, top_k) stays outside in XLA, bit-identical to the gather
    path: the dot itself runs at Precision.HIGHEST on the same f32
    operands, so refined scores match the einsum to the last ulp.
    """
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    def fill(dst_slot, idx_ref):
        for qi in range(qbr):
            for j in range(m):
                t = idx_ref[qi, j]
                pltpu.make_async_copy(
                    db_ref.at[pl.ds(t * SUB, SUB), :],
                    scratch.at[dst_slot, pl.ds((qi * m + j) * SUB, SUB), :],
                    sems.at[dst_slot]).start()

    def wait_all(dst_slot):
        # One grouped wait for the whole slot's qbr*m copies: DMA
        # semaphores count BYTES, so a single wait on a descriptor sized
        # like the full slot (qbr*m*SUB rows — never started, purely a
        # byte-count carrier) is equivalent to qbr*m per-descriptor waits
        # and removes ~qbr*m scalar-core wait ops per grid step (131k
        # descriptor waits at the headline shape measured as a large
        # fraction of the refine kernel's cost). A same-ref scratch
        # descriptor keeps the shape in-bounds for any database size.
        pltpu.make_async_copy(scratch.at[dst_slot], scratch.at[dst_slot],
                              sems.at[dst_slot]).wait()

    @pl.when(i == 0)
    def _():
        fill(slot, idx_cur)

    @pl.when(i + 1 < nblocks)
    def _():
        fill(nxt, idx_nxt)

    wait_all(slot)
    # bf16-storage rows are cast up exactly, so the HIGHEST dot matches
    # XLA's promote-then-highest einsum on every source dtype
    rows = scratch[slot].astype(jnp.float32)             # (qbr*m*SUB, d)
    dots_all = jax.lax.dot_general(
        rows, q_ref[:], (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)              # (qbr*m*SUB, qbr)
    d3 = dots_all.reshape(qbr, m * SUB, qbr)
    # per-query column extraction (block-diagonal): qbr x flops waste,
    # but the whole dot is ~2 ms of MXU at the headline shape
    qsel = (jax.lax.broadcasted_iota(jnp.int32, (qbr, 1, qbr), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (qbr, 1, qbr), 2))
    out_ref[:] = jnp.sum(jnp.where(qsel, d3, 0.0), axis=2)


def _refine_dots(tile_idx, queries, db, m: int, interpret: bool):
    """(Qp, m*SUB) f32 candidate dots via the DMA refine kernel.
    Caller guarantees qp % _REFINE_QBR == 0 and d % 128 == 0."""
    qp, d = queries.shape
    qbr = _REFINE_QBR
    nblocks = qp // qbr
    return pl.pallas_call(
        functools.partial(_refine_dots_kernel, qbr=qbr, m=m,
                          nblocks=nblocks),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((qbr, m), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((qbr, m),
                         lambda i: (jnp.minimum(i + 1, nblocks - 1), 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((qbr, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((qbr, m * SUB), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp, m * SUB), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, qbr * m * SUB, d), db.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # the double-buffered (2, qbr*m*SUB, d) scratch alone is
            # ~25 MB at d=768, qbr=8 — past the 16 MB default scoped-vmem
            # limit; scale the cap with qbr for wider experiment blocks
            vmem_limit_bytes=max(
                64 * 1024 * 1024,
                2 * qbr * m * SUB * d * db.dtype.itemsize + (16 << 20))),
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * m * SUB * d * qbr,
            bytes_accessed=qp * m * SUB * d * db.dtype.itemsize
            + qp * d * 4 + qp * m * SUB * 4,
            transcendentals=0,
        ),
    )(tile_idx, tile_idx, queries, db)


_REFINE_M_CHUNK = 32   # max tiles per refine-kernel call (VMEM scratch cap)


def _refine_topk(tile_idx, queries, qsq, qn, db, db_sq, db_norms, valid,
                 mode: str, m: int, k: int, interpret: bool, scales=None):
    """Exact f32-highest re-rank of each query's m candidate tiles.

    ``scales`` (int8 storage only): per-row pow2 scale vector. The dot
    runs HIGHEST over the raw integer codes and the scale is applied to
    the finished dots — bit-identical to dotting the dequantized rows,
    because a pow2 multiply only shifts exponents (every product and
    partial sum scales exactly; index/flat._int8_row_scales).

    Returns (sk, pos, w): the k best refined scores ascending, their
    positions within the (m*SUB) candidate pool, and the refined minimum
    of the LAST (m-th) tile (the bf16x3 certificate's boundary term; the
    1p pipeline ignores it).

    Two implementations with identical results (the dot runs HIGHEST on
    the same f32 operand values either way):
      * DMA refine kernel (_refine_dots_kernel), chunked over tile groups
        of _REFINE_M_CHUNK so the double-buffered VMEM scratch stays
        bounded — the candidate pool crosses HBM once;
      * XLA tile-granular gather + einsum, chunked over queries to bound
        the materialized pool (the fallback for unaligned d / opt-out).
    """
    qp, d = queries.shape
    t_all = db.shape[0] // SUB
    sq2 = db_sq.reshape(t_all, SUB)
    nrm2 = db_norms.reshape(t_all, SUB)
    vld2 = valid.reshape(t_all, SUB)
    scl2 = scales.reshape(t_all, SUB) if scales is not None else None

    # int8 codes take the XLA gather path: the DMA kernel's SUB(=16)-row
    # async copies are not tile-aligned for int8's (32, 128) VMEM tiling,
    # and the gathered pool is 4x smaller than f32's anyway
    if (d % 128 == 0 and scales is None
            and not os.environ.get("VDB_TPU_NO_REFINE_KERNEL")):
        qbr = _REFINE_QBR
        qp2 = ((qp + qbr - 1) // qbr) * qbr
        if qp2 != qp:
            pad = qp2 - qp
            t_pad = jnp.concatenate(
                [tile_idx, jnp.zeros((pad, m), tile_idx.dtype)], axis=0)
            q_pad_arr = jnp.concatenate(
                [queries, jnp.zeros((pad, d), queries.dtype)], axis=0)
        else:
            t_pad, q_pad_arr = tile_idx, queries
        parts = []
        for c0 in range(0, m, _REFINE_M_CHUNK):
            mc = min(_REFINE_M_CHUNK, m - c0)
            parts.append(_refine_dots(t_pad[:, c0:c0 + mc], q_pad_arr,
                                      db, mc, interpret)[:qp])
        dots = parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                                axis=1)
        if mode == "euclidean":
            s2 = (qsq[:, None] + sq2[tile_idx].reshape(qp, m * SUB)
                  - 2.0 * dots)
        elif mode == "dot":
            s2 = -dots
        else:
            qinv_i = jnp.where(qn == 0.0, 0.0, 1.0 / qn)
            rn = nrm2[tile_idx].reshape(qp, m * SUB)
            rinv_i = jnp.where(rn == 0.0, 0.0, 1.0 / rn)
            s2 = -(dots * qinv_i[:, None] * rinv_i)
        s2 = jnp.where(vld2[tile_idx].reshape(qp, m * SUB), s2, jnp.inf)
        neg, pos = jax.lax.top_k(-s2, k)
        w = jnp.min(s2[:, (m - 1) * SUB:], axis=1)
        return -neg, pos, w

    db3 = db.reshape(t_all, SUB, d)

    def refine_chunk(args):
        t_i, q_i, qs_i, qn_i = args
        rows = db3[t_i].reshape(-1, m * SUB, d)
        if rows.dtype != jnp.float32:
            rows = rows.astype(jnp.float32)          # int8/bf16: exact
        dots = jnp.einsum("qcd,qd->qc", rows, q_i,
                          preferred_element_type=jnp.float32,
                          precision="highest")
        if scl2 is not None:
            # pow2 per-row scale: exact, bit-identical to pre-scaled rows
            dots = dots * scl2[t_i].reshape(-1, m * SUB)
        if mode == "euclidean":
            s2 = qs_i[:, None] + sq2[t_i].reshape(-1, m * SUB) - 2.0 * dots
        elif mode == "dot":
            s2 = -dots
        else:
            qinv_i = jnp.where(qn_i == 0.0, 0.0, 1.0 / qn_i)
            rn = nrm2[t_i].reshape(-1, m * SUB)
            rinv_i = jnp.where(rn == 0.0, 0.0, 1.0 / rn)
            s2 = -(dots * qinv_i[:, None] * rinv_i)
        s2 = jnp.where(vld2[t_i].reshape(-1, m * SUB), s2, jnp.inf)
        neg, pos = jax.lax.top_k(-s2, k)
        w = jnp.min(s2[:, (m - 1) * SUB:], axis=1)
        return -neg, pos, w

    chunk = _refine_chunk_rows(qp, m, d)
    if chunk < qp:
        c = chunk
        # non-pow2 qp (the sharded path doesn't pow2-pad): pad the refine
        # inputs up to a chunk multiple; padded rows compute junk that is
        # sliced away and never touches real queries' results or certs
        qp2 = ((qp + c - 1) // c) * c
        if qp2 != qp:
            pad = qp2 - qp
            t_pad = jnp.concatenate(
                [tile_idx, jnp.zeros((pad, m), tile_idx.dtype)], axis=0)
            q_pad_arr = jnp.concatenate(
                [queries, jnp.zeros((pad, d), queries.dtype)], axis=0)
            qsq_pad = jnp.concatenate([qsq, jnp.zeros((pad,), qsq.dtype)])
            qn_pad = jnp.concatenate([qn, jnp.zeros((pad,), qn.dtype)])
        else:
            t_pad, q_pad_arr, qsq_pad, qn_pad = tile_idx, queries, qsq, qn
        sk, pos, w = jax.lax.map(
            refine_chunk,
            (t_pad.reshape(qp2 // c, c, m),
             q_pad_arr.reshape(qp2 // c, c, d),
             qsq_pad.reshape(qp2 // c, c), qn_pad.reshape(qp2 // c, c)))
        return (sk.reshape(qp2, k)[:qp], pos.reshape(qp2, k)[:qp],
                w.reshape(qp2)[:qp])
    return refine_chunk((tile_idx, queries, qsq, qn))


def _coarse_kernel_f32(qhi_ref, qlo_ref, qrow_ref, db_ref, col_ref,
                       inv_ref, out_ref, *, passes: int, mode: str, tn: int):
    """f32-source variant: reads the primary f32 database tile and performs
    the hi/lo split in VMEM — zero extra HBM, so it serves capacities where
    the bf16 mirrors don't fit (e.g. 4M x 768 = 12 GB f32)."""
    tile = db_ref[:]
    hi = tile.astype(jnp.bfloat16)
    dots = jax.lax.dot_general(
        hi, qhi_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (TN, QB)
    if passes == 3:
        lo = (tile - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dots += jax.lax.dot_general(
            lo, qhi_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dots += jax.lax.dot_general(
            hi, qlo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    col_t = col_ref[:].T
    inv_t = inv_ref[:].T
    if mode == "euclidean":
        score = col_t + qrow_ref[:] - 2.0 * dots
    elif mode == "dot":
        score = -dots
    else:
        score = -(dots * col_t * qrow_ref[:])
    score += inv_t * PENALTY
    qb = score.shape[1]
    out_ref[:] = score.reshape(tn // SUB, SUB, qb).min(axis=1)


@functools.partial(jax.jit,
                   static_argnames=("passes", "mode", "interpret"))
def _coarse_minima_f32(qThi, qTlo, qrow, db, col, inv_col,
                       passes: int, mode: str, interpret: bool):
    """Like _coarse_minima but streaming the f32 database directly."""
    d, qp = qThi.shape
    n = db.shape[0]
    tn = _tile_cols(d)
    qb = _query_block(qp, d, tn)
    t = n // tn
    grid_spec = pl.GridSpec(
        grid=(qp // qb, t),
        in_specs=[
            pl.BlockSpec((d, qb), lambda qi, ti: (0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, qb), lambda qi, ti: (0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb), lambda qi, ti: (0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, d), lambda qi, ti: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda qi, ti: (0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda qi, ti: (0, ti),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn // SUB, qb), lambda qi, ti: (ti, qi),
                               memory_space=pltpu.VMEM),
    )
    minima_tq = pl.pallas_call(
        functools.partial(_coarse_kernel_f32, passes=passes, mode=mode,
                          tn=tn),
        out_shape=jax.ShapeDtypeStruct((n // SUB, qp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * n * d * passes,
            bytes_accessed=n * d * 4 * (qp // qb) + qp * d * 4
            + qp * (n // SUB) * 4,
            transcendentals=0,
        ),
    )(qThi, qTlo, qrow, db, col, inv_col)
    # same load-bearing barrier as _coarse_minima
    return jax.lax.optimization_barrier(minima_tq.T)


def _scores_to_dists(sk, mode: str):
    """Refined top-k scores -> metric distances. ONE copy shared by every
    pipeline tail (3-pass, 1-pass certified, 1-pass fast) so a metric
    tweak can never make fast-mode distances diverge from certified ones.
    Non-finite scores (fewer than k live rows in the pool) map to +inf."""
    if mode == "euclidean":
        return jnp.where(jnp.isfinite(sk),
                         jnp.sqrt(jnp.maximum(sk, 0.0)), jnp.inf)
    if mode == "dot":
        return sk
    return jnp.where(jnp.isfinite(sk),
                     1.0 + jnp.clip(sk, -1.0, 1.0), jnp.inf)


def _dispatch_src(db, db_hi, scales):
    """(src, db_hi) database-source ladder shared by the 1-pass entry
    points: int8 codes (scales given) / bf16 single-buffer (db is its own
    hi) / explicit hi mirror / f32 stream (hi/lo split in VMEM). The tiny
    bf16 placeholder replaces db_hi where the trace never touches it, so
    jit prunes it from the compiled program."""
    if scales is not None:
        if db.dtype != jnp.int8:
            raise ValueError("scales= requires an int8 code matrix")
        return "int8", jnp.zeros((1, 1), jnp.bfloat16)
    if db.dtype == jnp.int8:
        raise ValueError("int8 code matrix requires scales=")
    if db_hi is db and db.dtype == jnp.bfloat16:
        return "bf16", jnp.zeros((1, 1), jnp.bfloat16)
    if db_hi is not None:
        return "mirrors", db_hi
    return "f32", db


@functools.partial(jax.jit,
                   static_argnames=("metric_name", "k", "m_tiles", "passes",
                                    "interpret", "with_cert", "src"))
def _coarse_search_jit(queries, db, db_sq, db_norms, valid, db_hi, db_lo,
                       metric_name: str, k: int, m_tiles: int, passes: int,
                       interpret: bool, with_cert: bool, src: str):
    mode = _metric_mode(metric_name)
    qp, d = queries.shape
    n = db.shape[0]
    qT = queries.T
    qThi = qT.astype(jnp.bfloat16)
    qTlo = (qT - qThi.astype(jnp.float32)).astype(jnp.bfloat16)
    qsq = jnp.sum(queries * queries, axis=1)            # (Qp,)
    qn = jnp.sqrt(qsq)
    if mode == "euclidean":
        qrow = qsq[None, :]
        col = db_sq.reshape(1, n)
    elif mode == "dot":
        qrow = jnp.zeros((1, qp), jnp.float32)
        col = jnp.zeros((1, n), jnp.float32)
    else:
        qinv = jnp.where(qn == 0.0, 0.0, 1.0 / qn)
        rinv = jnp.where(db_norms == 0.0, 0.0, 1.0 / db_norms)
        qrow = qinv[None, :]
        col = rinv.reshape(1, n)
    inv_col = (1.0 - valid.astype(jnp.float32)).reshape(1, n)

    if src == "f32":
        minima = _coarse_minima_f32(qThi, qTlo, qrow, db, col, inv_col,
                                    passes, mode, interpret)
    elif passes == 1:
        minima = _coarse_minima_1p(qThi, qrow, db_hi, col, inv_col, mode,
                                   interpret)
    else:
        minima = _coarse_minima(qThi, qTlo, qrow, db_hi, db_lo, col,
                                inv_col, passes, mode, interpret)
    # indices only: consuming top_k's VALUES over the big minima array picks
    # a far slower codegen path (measured +81 ms); the certification
    # boundary is recovered from the refined scores instead.
    # The certificate's proof needs the TRUE m best tiles (every
    # non-selected tile's minimum must be >= the m-th selected one), so the
    # exact path uses exact top_k; the fast path takes approx_min_k's
    # PartialReduce (2.8x faster over the (Q, N/16) minima, measured).
    if with_cert:
        tile_idx = jax.lax.top_k(-minima, m_tiles)[1]   # (Qp, m)
    else:
        # recall_target=0.99 is FASTER than the 0.95 default here (55.1 vs
        # 57.3 ms at Q=4096, N=2^20 — the tighter target picks a less lossy
        # PartialReduce schedule over the (Q, N/16) minima) and lifts
        # top-10 id agreement from 0.992 to 0.9988 (benchmarks/
        # exp_fast_recall.py).
        tile_idx = jax.lax.approx_min_k(minima, m_tiles,
                                        recall_target=0.99)[1]
    offs = jnp.arange(SUB, dtype=jnp.int32)
    cand = (tile_idx[:, :, None] * SUB + offs[None, None, :]).reshape(
        qp, m_tiles * SUB)

    # exact refine at f32-highest precision on the primary f32 database —
    # shared helper (DMA refine kernel with XLA tile-gather fallback; all
    # refine math is einsum-highest on the same f32 rows and norms, so
    # results stay bit-identical to the full f32 scan)
    sk, pos, w = _refine_topk(tile_idx, queries, qsq, qn, db, db_sq,
                              db_norms, valid, mode, m_tiles, k, interpret)
    idx_out = jnp.take_along_axis(cand, pos, axis=1)

    dists = _scores_to_dists(sk, mode)
    if not with_cert:
        return dists, idx_out, jnp.zeros((qp,), bool)

    # per-query certification (rigorous only for passes=3 / bf16x3):
    # non-selected tiles' true minima >= (m-th tile's refined min) - margin
    eps = 2.0 ** -17 + d * 2.0 ** -24
    xmax = jnp.sqrt(jnp.max(jnp.where(valid, db_sq, 0.0)))
    if mode == "euclidean":
        margin = 8.0 * eps * qn * xmax                  # d2 error x2, safety 2
        smax = qsq + xmax * (xmax + 2.0 * qn)
    elif mode == "dot":
        margin = 4.0 * eps * qn * xmax
        smax = xmax * qn * 1.001
    else:
        xnmin = jnp.min(jnp.where(valid & (db_norms > 0.0), db_norms,
                                  jnp.inf))
        margin = 4.0 * eps * xmax / xnmin
        smax = jnp.full_like(qn, 2.0)
    # additive-PENALTY dead masking (and the dead-selected => none-live-
    # outside argument below) is sound only while live coarse scores stay
    # far below PENALTY; extreme-magnitude data must take the fallback
    sane = smax < 0.25 * PENALTY
    last = sk[:, -1]
    # a non-finite k-th score means fewer than k live candidates; with
    # m_tiles >= k (enforced by the caller) every live row is then already
    # a candidate, so the result is exact
    certified = sane & jnp.where(jnp.isfinite(last), last <= w - margin,
                                 True)
    return dists, idx_out, certified


# ---------------------------------------------------------------------------
# 1-pass certified exact pipeline
#
# The bf16x3 pipeline above buys its tiny (~2^-17-relative) margin with 3 MXU
# passes. A single bf16 pass has worst-case dot error ~2^-7|q||x| — but the
# *computed* residual norms give a far tighter rigorous per-instance bound:
#
#   x.q − fl(hi(x)·hi(q)) = xlo·hi(q) + x·qlo + accum
#   |err| <= |xlo|(|q|+|qlo|) + |x||qlo| + d·2^-24·(|x|+|xlo|)(|q|+|qlo|)
#
# with |xlo| <= elo_max (a scalar max over rows, maintained by the index as
# an upper bound) and |qlo| computed exactly per query. On gaussian data
# elo_max ≈ 2^-9.3·xmax, ~5x below the worst case, which makes the margin
# small enough that a ~24-tile refine pool certifies essentially every query
# (measured 100% at N=2^20 x 768 iid — the worst case for boundary gaps;
# benchmarks/exp_exact1p2.py). Tile selection is hierarchical (super-tiles
# of SUPER tiles -> top-m2 supers -> top-m tiles inside them) so the exact
# top_k runs over N/256 lanes instead of N/16, and the refine gather is
# chunked over queries to bound its peak memory. Uncertified queries fall
# back to the bf16x3 certified pipeline (ops/topk.py), so exactness stays
# unconditional. Measured 80.6 ms vs 139 ms (3-pass) per 4096-query batch.
# ---------------------------------------------------------------------------

SUPER = 16              # tiles per super-tile in the hierarchical selection
SUPER2 = 16             # super-tiles per super-super (3rd selection level)
_REFINE_BYTES = int(2.5e9)   # peak refine-gather budget -> query chunking
# margin scale on err_dot: rigorous floor is 2 for euclidean (score error =
# 2x dot error) and 1 for dot/cosine; 3.0/1.5 carry a 1.5x slack that also
# absorbs the refine einsum's ~d·2^-24 error and f32 score arithmetic.
_MARGIN_SCALE_EUCLID = 3.0
_MARGIN_SCALE_DOT = 1.5


def _exact1p_pool(k: int, t_all: int) -> tuple[int, int]:
    """(m2 supers, m tiles) for the 1-pass certified refine pool.

    The certificate needs the k-th refined row to clear the m-th tile's
    coarse minimum: since each tile min is a best-of-SUB order statistic,
    ~m rows beat the m-th tile min in expectation, so m must exceed k by
    a variance cushion ~ sqrt(SUB*k). Measured knees: k=10 -> m=32
    certifies 32768/32768 while m=24 leaves 0.4% uncertified
    (benchmarks/exp_exact1p2.py); k=100 -> m=144/160/192 certify
    76%/99.5%/100% at N=2^20 x 768 iid (r2 probe). Small k uses the
    measured knee directly (the refine is DMA-descriptor-bound, ~70 ns
    per candidate tile per query, so every pool tile above the knee costs
    ~0.6 ms per 4096-query batch at 768-d: m=42 -> 74.1 ms vs m=32 ->
    68.4 ms, both 4096/4096 certified, benchmarks/exp_sel3_ab.py); large
    k keeps the conservative 2.5x-sqrt cushion (k=100 -> m=201, the
    measured 100% knee — 160 left 0.5% uncertified)."""
    t2 = t_all // SUPER
    coeff = 1.7 if SUB * int(k) <= 256 else 2.5
    slack = max(22, int(coeff * (SUB * int(k)) ** 0.5) + 1)
    m = min(max(32, int(k) + slack), t_all)
    m2 = min(max(32, int(k) + slack), t2)
    return m2, min(m, m2 * SUPER)


def supports_1p(capacity: int, d: int, k_eff: int) -> bool:
    """The hierarchical selection needs whole super-tiles."""
    return (supports(capacity, d, k_eff)
            and capacity % (SUB * SUPER) == 0
            and capacity // (SUB * SUPER) >= 2)


def supports_1p_int8(capacity: int, d: int, k_eff: int) -> bool:
    """The int8-source tier additionally needs whole super-tiles per db
    tile (the wide-d single-output fallback kernel has no int8 variant)."""
    return (supports_1p(capacity, d, k_eff)
            and _tile_cols(d) % (SUB * SUPER) == 0)


@functools.partial(jax.jit,
                   static_argnames=("metric_name", "k", "m2", "m",
                                    "interpret", "src", "with_cert"))
def _coarse_search_1p_jit(queries, db, db_sq, db_norms, valid, db_hi,
                          elo_max, metric_name: str, k: int, m2: int,
                          m: int, interpret: bool, src: str, scales=None,
                          with_cert: bool = True):
    mode = _metric_mode(metric_name)
    qp, d = queries.shape
    n = db.shape[0]
    t_all = n // SUB
    qT = queries.T
    qThi = qT.astype(jnp.bfloat16)
    qlo = qT - qThi.astype(jnp.float32)
    qlo_n = jnp.sqrt(jnp.sum(qlo * qlo, axis=0))         # (Qp,) exact
    qsq = jnp.sum(queries * queries, axis=1)
    qn = jnp.sqrt(qsq)
    if mode == "euclidean":
        qrow = qsq[None, :]
        col = db_sq.reshape(1, n)
    elif mode == "dot":
        qrow = jnp.zeros((1, qp), jnp.float32)
        col = jnp.zeros((1, n), jnp.float32)
    else:
        qinv = jnp.where(qn == 0.0, 0.0, 1.0 / qn)
        rinv = jnp.where(db_norms == 0.0, 0.0, 1.0 / db_norms)
        qrow = qinv[None, :]
        col = rinv.reshape(1, n)
    inv_col = (1.0 - valid.astype(jnp.float32)).reshape(1, n)

    # One fused kernel pass emits tile minima AND super-tile minima (the
    # selection never re-reads the big (T, Qp) array from HBM — measured
    # ~10 ms at the headline shape; at 8M-row bf16 storage it also avoids
    # a 2+ GB reduce read). Selection then works entirely in the kernel's
    # natural (T, Qp) layout: only the small (T2, Qp) super array is
    # transposed (the mirrors path used to transpose the full tile array).
    # src == "bf16": db IS its own hi mirror — one buffer serves the scan
    # AND the refine (passing it twice would bill HBM twice in the
    # compiled program's arguments: 24 GB at 8M x 768).
    # src == "int8": db is the code matrix; the kernel casts codes to
    # bf16 (exact) and applies the pow2 row scales in VMEM.
    src_arr = db_hi if src == "mirrors" else db
    tile_tq, sup_tq = _minima_1p_sup(qThi, qrow, src_arr, col, inv_col,
                                     mode, interpret, src, scales)
    t2 = t_all // SUPER
    inf_col = jnp.full((qp,), jnp.inf, jnp.float32)
    if (t2 % SUPER2 == 0 and t2 // SUPER2 >= 2
            and not os.environ.get("VDB_TPU_NO_SEL3")):
        # third selection level: super-supers of SUPER2 supers. Exact by
        # the same containment argument as supers->tiles (the j-th best
        # super's container ranks <= j among containers, so the top-m3
        # containers hold every top-m2 super when m3 >= m2); the extra
        # ss_boundary term keeps the certificate sound even when boundary
        # TIES break containment (top_k tie-break may exclude a tied
        # container; its content is still bounded by the m3-th container
        # min). ss_boundary >= sup_boundary whenever containment holds,
        # so the added term never tightens the certificate in the generic
        # case. Motivation: replaces the (Qp, T2) transpose + top_k
        # (measured ~7 ms of the pipeline at Qp=4096, T2=4096) with a
        # cheap (T2, Qp)-layout reduce and two small top_ks.
        t3 = t2 // SUPER2
        m3 = min(m2, t3)
        sup3_tq = sup_tq.reshape(t3, SUPER2, qp)
        minima3 = jax.lax.optimization_barrier(
            sup3_tq.min(axis=1).T)                       # (Qp, t3) small
        neg_ss, ss_idx = jax.lax.top_k(-minima3, m3)
        sel_sup = sup3_tq[ss_idx, :, jnp.arange(qp)[:, None]]
        sel_sup = sel_sup.reshape(qp, m3 * SUPER2)
        neg_sup, loc2 = jax.lax.top_k(-sel_sup, m2)
        ss_of = jnp.take_along_axis(ss_idx, loc2 // SUPER2, axis=1)
        sup_idx = ss_of * SUPER2 + (loc2 % SUPER2)       # (Qp, m2) global
        ss_boundary = -neg_ss[:, -1] if m3 < t3 else inf_col
    else:
        minima2 = jax.lax.optimization_barrier(sup_tq.T)  # (Qp, T2) small
        neg_sup, sup_idx = jax.lax.top_k(-minima2, m2)
        ss_boundary = inf_col
    m3_tq = tile_tq.reshape(t2, SUPER, qp)
    sel = m3_tq[sup_idx, :, jnp.arange(qp)[:, None]]     # (Qp, m2, SUPER)
    sel = sel.reshape(qp, m2 * SUPER)
    neg_t, loc = jax.lax.top_k(-sel, m)
    sup_of = jnp.take_along_axis(sup_idx, loc // SUPER, axis=1)
    tile_idx = sup_of * SUPER + (loc % SUPER)            # (Qp, m) global

    # smallest coarse minimum over everything NOT refined, stratum by
    # stratum: non-selected super-supers are bounded by the m3-th
    # super-super min, non-selected supers inside selected super-supers by
    # the m2-th super min, non-selected tiles inside selected supers by
    # the m-th tile min (every bound is +inf when its stratum is fully
    # selected)
    sup_boundary = -neg_sup[:, -1] if m2 < t2 else inf_col
    tile_boundary = -neg_t[:, -1] if m < m2 * SUPER else inf_col
    b = jnp.minimum(ss_boundary, jnp.minimum(sup_boundary, tile_boundary))

    offs = jnp.arange(SUB, dtype=jnp.int32)
    cand = (tile_idx[:, :, None] * SUB + offs[None, None, :]).reshape(
        qp, m * SUB)

    # exact refine via the shared helper (DMA refine kernel, chunked over
    # tile groups; XLA tile-gather fallback) — bit-identical either way
    sk, pos, _ = _refine_topk(tile_idx, queries, qsq, qn, db, db_sq,
                              db_norms, valid, mode, m, k, interpret,
                              scales=scales)
    idx_out = jnp.take_along_axis(cand, pos, axis=1)

    if not with_cert:
        # fast mode: approximate ids with exact distances over the refined
        # pool — no certificate (the caller treats all queries as final)
        return (_scores_to_dists(sk, mode), idx_out,
                jnp.zeros((qp,), bool))

    # rigorous per-query margin from computed residual norms (module
    # docstring + benchmarks/exp_exact1p.py for the derivation). The
    # accumulation term carries a 4x coefficient so the margin stays
    # rigorous even when elo_max and qlo_n are BOTH ~0 (bf16-exact data):
    # the requirement is 2*e_coarse + 2*e_refine and each error is bounded
    # by one accumulation term, so 4x covers it on its own.
    xmax = jnp.sqrt(jnp.max(jnp.where(valid, db_sq, 0.0)))
    err_dot = (elo_max * (qn + qlo_n) + xmax * qlo_n
               + 4.0 * d * 2.0 ** -24 * (xmax + elo_max) * (qn + qlo_n))
    if mode == "euclidean":
        margin = _MARGIN_SCALE_EUCLID * err_dot
        smax = qsq + xmax * (xmax + 2.0 * qn)   # |live coarse score| bound
    elif mode == "dot":
        margin = _MARGIN_SCALE_DOT * err_dot
        smax = xmax * qn * 1.001
    else:
        xnmin = jnp.min(jnp.where(valid & (db_norms > 0.0), db_norms,
                                  jnp.inf))
        qinv_m = jnp.where(qn == 0.0, jnp.inf, 1.0 / qn)
        margin = _MARGIN_SCALE_DOT * err_dot * qinv_m / xnmin
        smax = jnp.full_like(qn, 2.0)

    # The additive PENALTY masking (and with it every dead-vs-live
    # selection argument) is only sound while live coarse scores stay far
    # below it; data with |score| approaching PENALTY/4 (norms ~1e15)
    # must take the fallback instead of a certificate.
    sane = smax < 0.25 * PENALTY
    last = sk[:, -1]
    # Non-finite last = fewer than k live rows in the refined pool. Unlike
    # the flat selection (where a selected dead tile proves no live tile
    # was left out), hierarchical selection can strand live tiles in
    # non-selected supers — so the degenerate case certifies only when the
    # boundary itself is dead (>= PENALTY/2 can only come from invalid
    # slots once `sane` bounds live scores below PENALTY/4).
    certified = sane & jnp.where(jnp.isfinite(last), last <= b - margin,
                                 b >= 0.5 * PENALTY)

    return _scores_to_dists(sk, mode), idx_out, certified


def coarse_search_1p(queries, db, db_sq, db_norms, valid, db_hi, elo_max,
                     metric: DistanceMetric, k: int, scales=None):
    """1-pass certified-exact search: (dists, idx, certified).

    ``elo_max`` is an upper bound on max_r |row_r - bf16(row_r)| (the index
    maintains it; stale-high is safe — the margin only widens). With
    ``db_hi is None`` the f32-source kernel streams the database and splits
    in VMEM. With ``scales`` given (int8 storage), ``db`` is the int8 code
    matrix and the kernel searches the stored values code * pow2-scale
    exactly (database-side residual is zero; pass elo_max = 0). Uncertified
    queries must be re-run by the caller through the next exact tier.
    """
    n = db.shape[0]
    m2, m = _exact1p_pool(k, n // SUB)
    src, db_hi = _dispatch_src(db, db_hi, scales)
    return _coarse_search_1p_jit(queries, db, db_sq, db_norms, valid,
                                 db_hi, elo_max, metric.value, int(k),
                                 m2, m, interpret_mode(), src, scales)


def _fast1p_pool(k: int, t_all: int) -> tuple[int, int]:
    """(m2 supers, m tiles) for the 1-pass FAST pool, with m2 = m so the
    containment argument makes tile selection exact over the coarse
    scores. Exact selection needs only m >= k up to bf16 coarse-score
    boundary noise (the j-th best row's tile ranks <= j among tiles by
    true min), so the cushion is small — but it must absorb bf16
    coarse-score noise on data with near-duplicate distances at the k-th
    boundary, not just iid gaussian: m=12 at k=10 measured 1.0000 top-10
    agreement on iid/manifold/64-way-duplicate layouts but 0.9948 on the
    clustered hard mode (in-cluster queries, ~512 near-equidistant rows),
    while m=16 measures 1.0000 on ALL four layouts at N=2^20 x 768
    (benchmarks/exp_fast_clustered.py; exp_fastpool.py for the iid knee).
    The refine is DMA-descriptor-bound so time is ~linear in m: the
    12 -> 16 floor costs ~2.4 ms on a ~48 ms 4096-query batch."""
    slack = max(6, int(0.45 * (SUB * int(k)) ** 0.5))
    m = min(max(16, int(k) + slack), t_all)
    m2 = min(m, t_all // SUPER) if t_all // SUPER >= 1 else 1
    return m2, min(m, m2 * SUPER)


def coarse_search_1p_fast(queries, db, db_sq, db_norms, valid, db_hi,
                          metric: DistanceMetric, k: int):
    """1-pass FAST search: (dists, idx) — approximate ids (exact top-m
    tile selection over single-bf16-pass coarse scores), exact distances
    over the refined pool. Replaces the legacy fast pipeline's full
    (Qp, T) transpose + approx_min_k with the fused tile+super minima
    kernel and hierarchical exact selection: faster AND strictly better
    tile recall (approx_min_k at recall_target=0.99 vs exact top-m).
    Same src dispatch as coarse_search_1p minus int8 (int8 storage always
    serves the certified tier — it is already a single pass).
    """
    n = db.shape[0]
    m2, m = _fast1p_pool(k, n // SUB)
    if db.dtype == jnp.int8:
        raise ValueError(
            "int8 codes serve the certified tier (coarse_search_1p with "
            "scales=) — it is already a single pass")
    src, db_hi = _dispatch_src(db, db_hi, None)
    dists, idx, _ = _coarse_search_1p_jit(
        queries, db, db_sq, db_norms, valid, db_hi, jnp.float32(0.0),
        metric.value, int(k), m2, m, interpret_mode(), src,
        with_cert=False)
    return dists, idx


@jax.jit
def residual_max_norm(db, hi):
    """Upper bound max_r |db_r - hi_r| for the 1-pass certificate."""
    resid = db - hi.astype(jnp.float32)
    return jnp.sqrt(jnp.max(jnp.sum(resid * resid, axis=1)))


@jax.jit
def residual_max_norm_f32(db):
    """residual_max_norm with the bf16 split fused in (no hi mirror
    materialized — used by the f32-source / large-N path)."""
    hi = db.astype(jnp.bfloat16)
    resid = db - hi.astype(jnp.float32)
    return jnp.sqrt(jnp.max(jnp.sum(resid * resid, axis=1)))


def coarse_search(queries, db, db_sq, db_norms, valid, db_hi, db_lo,
                  metric: DistanceMetric, k: int, exact: bool):
    """(dists (Q,k) asc, idx (Q,k), certified (Q,) bool).

    ``exact=True`` runs the bf16x3 certified pipeline; ``exact=False`` runs
    the single-pass bf16 fast pipeline (certified output is meaningless
    there and comes back all-False). With ``db_hi is None`` the kernel
    streams the f32 database and splits hi/lo in VMEM (zero extra HBM).
    """
    n = db.shape[0]
    t = n // SUB
    if exact:
        # same order-statistics cushion as _exact1p_pool (the bf16x3
        # margin is tiny, so a ~1.5x-sqrt slack suffices; uncertified
        # queries still fall back to the XLA scan, so this only tunes
        # the fallback rate)
        slack = max(6, int(1.5 * (SUB * int(k)) ** 0.5) + 1)
        m_tiles = min(max(16, int(k) + slack), t)
    else:
        # smaller tile pool for the fast path: 12 tiles (192 candidates at
        # SUB=16) measured the same agreement as 16 with a cheaper refine
        # gather (benchmarks/exp_fast_recall.py: m=12 55.1 ms / m=16
        # 57.3 ms, overlap 0.9988 both at rt=0.99); large k gets a
        # sqrt-scaled cushion for recall (no certificate here)
        slack = max(2, int((SUB * int(k)) ** 0.5))
        m_tiles = min(max(12, int(k) + slack), t)
    passes = 3 if exact else 1
    if db_hi is None:
        src = "f32"
        db_hi = db_lo = db  # placeholders; DCE'd under src="f32"
    else:
        src = "mirrors"
        if db_lo is None:   # bf16 storage: db IS its own hi, no lo mirror
            db_lo = db_hi
    return _coarse_search_jit(
        queries, db, db_sq, db_norms, valid, db_hi, db_lo, metric.value,
        int(k), m_tiles, passes, interpret_mode(), with_cert=exact,
        src=src)


@jax.jit
def split_hi_lo(db):
    """Derive the kernel's bf16 hi/lo database mirrors from the f32 rows."""
    hi = db.astype(jnp.bfloat16)
    lo = (db - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


@functools.partial(jax.jit, donate_argnums=(0, 1))
def scatter_hi_lo(hi, lo, idx, rows_f32):
    """Patch the hi/lo mirrors in place for dirty rows (donated)."""
    rhi = rows_f32.astype(jnp.bfloat16)
    rlo = (rows_f32 - rhi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi.at[idx].set(rhi), lo.at[idx].set(rlo)


@jax.jit
def scatter_hi_lo_copy(hi, lo, idx, rows_f32):
    rhi = rows_f32.astype(jnp.bfloat16)
    rlo = (rows_f32 - rhi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi.at[idx].set(rhi), lo.at[idx].set(rlo)


__all__ = ["coarse_search", "coarse_search_1p", "coarse_search_1p_fast",
           "split_hi_lo",
           "scatter_hi_lo", "scatter_hi_lo_copy", "supports",
           "supports_1p", "supports_1p_int8", "residual_max_norm",
           "residual_max_norm_f32", "interpret_mode", "SUB", "SUPER",
           "MAX_K", "PENALTY"]
