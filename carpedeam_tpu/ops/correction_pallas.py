"""Fused Pallas TPU kernel for whole-database Bayesian correction.

Device-side replacement for ops/correction_tpu.py's scatter+argmax pair
(reference semantics: src/assembler/correction.cpp:7-123,200-463).  The
XLA formulation scatter-adds ~6M alignment columns into a flat coverage
vector — TPU scatter serialises to ~80ns/element and dominated the whole
pipeline.  This kernel removes the scatter entirely:

  * queries are packed into blocks of G query slots whose records (the
    alignment candidates that survived the host-side pre-filters) fit in
    REC_TILE record slots; records of one query are contiguous, so each
    grid step owns G complete query coverage stacks;
  * per record, the target window is aligned to the QUERY-local frame
    with one barrel-shifter rotation (roll by (tstart - qstart) mod L —
    the query row needs no shift in its own frame), the RY-identity gate
    runs as a masked lane reduction, and each surviving column gets a
    class id c = targetBase*11 + damageLayer in [0, 44);
  * the per-query coverage histogram counts[q, p, c] is then ONE MXU
    matmul: a (2G, REC_TILE) 0/1 membership matrix (query-slot rows,
    plus reverse-orientation rows) times the (REC_TILE, 44*L) one-hot
    class planes — bf16 inputs, f32 accumulation, exact for counts
    <= REC_TILE;
  * the Bayesian argmax (sequencing-error/damage log-likelihood per
    candidate base, ct/ga-ratio early exit, first-max tie semantics)
    is fused in the same program: counts never leave VMEM.

Layouts are class-major (44 static (G, L) lane slices) so no Mosaic
relayouts are needed.  Integer decisions (RY gate, ratio exits, coverage
counts) are exact; the log-likelihood sums are f32 like the XLA kernel
(parity with the f64 oracle is enforced by the end-to-end golden tests).

On non-TPU backends the kernel runs in interpreter mode.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import SMOOTHING_VALUE
from ..damage import DamageModel, seq_error_profile
from ..io.seqdb import SeqDB

G = 32           # query slots per block (plane width <= 128)
REC_TILE = 256   # record slots per block (plane width <= 128)
NB_BUCKET = 128  # block-count bucket (compile reuse across iterations)
MAX_LEN_PALLAS = 2048  # beyond this, fall back to the XLA kernel


def _tiles_for(max_len: int) -> tuple[int, int]:
    """(query slots, record slots) per block, sized so the one-hot
    scratch (REC_TILE x 11L bf16) and per-base counts (2G x 11L f32)
    fit VMEM.  Narrow (read-length) levels use big blocks: the scalar
    planes are sized nb*REC_TILE, so fuller blocks mean fewer padded
    slots crossing the tunnel, and a 2G >= 256 membership matmul keeps
    the MXU's M dimension full.  G >= 32 everywhere: the 2-bit packed
    output block has G//4 sublanes and Mosaic requires >= 8.  Levels
    above 2048 use the layer-chunked accumulation (one (R, L) one-hot
    matmul per damage class instead of an 11L-wide scratch), which keeps
    VMEM linear in L."""
    if max_len <= 128:
        return 128, 512
    if max_len <= 512:
        return 32, 128
    if max_len <= 1024:
        return 32, 64
    return 32, 32


def _chunked_for(max_len: int) -> bool:
    return max_len > 2048


def _roll_rows_left(x, shift, width: int):
    n_bits = max(1, (width - 1).bit_length())
    for k in range(n_bits):
        step = 1 << k
        if step >= width:
            break
        take = (shift & step) != 0
        rolled = jnp.concatenate([x[:, step:], x[:, :step]], axis=1)
        x = jnp.where(take, rolled, x)
    return x


def _make_correction_kernel(G: int, chunked: bool = False):
    def kernel(t_sym_ref, rscal_ref, slot_sym_ref, qscal_ref, wtab_ref,
               packed_ref, onehot):
        return _correction_kernel_body(
            G, t_sym_ref, rscal_ref, slot_sym_ref, qscal_ref, wtab_ref,
            packed_ref, onehot, chunked)
    return kernel


def _correction_kernel_body(G, t_sym_ref, rscal_ref, slot_sym_ref,
                            qscal_ref, wtab_ref, packed_ref, onehot,
                            chunked=False):
    R, L = t_sym_ref.shape
    t_sym = t_sym_ref[:].astype(jnp.int32)
    qstart = rscal_ref[:, 0:1].astype(jnp.int32)
    tstart = rscal_ref[:, 1:2].astype(jnp.int32)
    alen = rscal_ref[:, 2:3].astype(jnp.int32)
    tlen = rscal_ref[:, 3:4].astype(jnp.int32)
    smin = rscal_ref[:, 4:5].astype(jnp.int32)
    keep_pre = rscal_ref[:, 5:6].astype(jnp.int32)
    qslot = rscal_ref[:, 6:7].astype(jnp.int32)
    is_rev = rscal_ref[:, 7:8].astype(jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)

    # per-record slot membership (R, G): one-hot of the record's query
    # slot (sentinel G -> all-zero row); the reverse-orientation subset
    # alongside gives the (R, 2G) matrix whose transpose-contraction
    # with the one-hot class planes is the coverage histogram
    gidx = jax.lax.broadcasted_iota(jnp.int32, (R, G), 1)
    m_all_b = gidx == qslot
    m_all = m_all_b.astype(jnp.bfloat16)
    m_rev = (m_all_b & (is_rev != 0)).astype(jnp.bfloat16)
    membT = jnp.concatenate([m_all, m_rev], axis=1)        # (R, 2G)

    # per-record query symbols via the MXU instead of a host-side row
    # gather upload: records of a slot share the slot's query row, and
    # symbol bytes <= 127 are bf16-exact
    q_sym = jax.lax.dot_general(
        m_all, slot_sym_ref[:].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)

    # align the target window to the query-local frame
    shift = tstart - qstart
    shift = jnp.where(shift < 0, shift + L, shift)
    t_aln = _roll_rows_left(t_sym, shift, L)
    in_aln = (pos >= qstart) & (pos < qstart + alen)

    # RY-identity gate (integer-exact dynamic threshold from the host)
    ry_q = (q_sym == ord("C")) | (q_sym == ord("T"))
    ry_t = (t_aln == ord("C")) | (t_aln == ord("T"))
    ry_cnt = jnp.sum((in_aln & (ry_q == ry_t)).astype(jnp.int32),
                     axis=1, keepdims=True)
    keep = (keep_pre != 0) & (ry_cnt >= smin)

    # per-column class id: targetBase (A0 C1 G2 T3, others 0) * 11 + layer
    t_base = jnp.zeros((R, L), jnp.int32)
    t_base = jnp.where(t_aln == ord("C"), 1, t_base)
    t_base = jnp.where(t_aln == ord("G"), 2, t_base)
    t_base = jnp.where(t_aln == ord("T"), 3, t_base)
    t_real = tstart + pos - qstart
    layer = jnp.full((R, L), 5, jnp.int32)
    layer = jnp.where(t_real < 5, t_real, layer)
    from_end = t_real - (tlen - 5)
    layer = jnp.where(from_end >= 0, 6 + from_end, layer)
    cls = jnp.where(in_aln & keep, t_base * 11 + layer, 44)

    # ---- fused Bayesian argmax over the G query slots ----
    qlen = qscal_ref[:, 0:1].astype(jnp.int32)
    was_ext = qscal_ref[:, 1:2].astype(jnp.int32) != 0
    slot_sym = slot_sym_ref[:].astype(jnp.int32)
    posg = jax.lax.broadcasted_iota(jnp.int32, (G, L), 1)

    obs = jnp.zeros((G, L), jnp.int32)
    obs = jnp.where(slot_sym == ord("C"), 1, obs)
    obs = jnp.where(slot_sym == ord("G"), 2, obs)
    obs = jnp.where(slot_sym == ord("T"), 3, obs)
    own_layer = jnp.full((G, L), 5, jnp.int32)
    own_layer = jnp.where(posg < 5, posg, own_layer)
    own_end = posg - (qlen - 5)
    own_layer = jnp.where(own_end >= 0, 6 + own_end, own_layer)

    # one target base (11 damage layers) at a time: one-hot planes ->
    # one MXU matmul -> immediate accumulation.  Bounds VMEM to 11L-wide
    # scratch instead of 44L so long-contig shapes still fit.
    base_cov = [None] * 4
    lik = [jnp.zeros((G, L), jnp.float32) for _ in range(4)]
    if chunked:
        # long-contig levels: one (R, L) one-hot matmul per damage class
        # keeps the scratch + counts linear in L (44 small matmuls
        # instead of 4 matmuls over an 11L-wide scratch)
        for t in range(4):
            cov_t = jnp.zeros((G, L), jnp.float32)
            for l in range(11):
                c = t * 11 + l
                onehot[:, :] = (cls == c).astype(jnp.bfloat16)
                counts = jax.lax.dot_general(
                    membT, onehot[:], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)       # (2G, L)
                Cc = counts[0:G]
                Rc = counts[G:2 * G]
                F = Cc - Rc
                cov_t = cov_t + Cc
                for q in range(4):
                    lik[q] = lik[q] + F * wtab_ref[c, q] \
                        + Rc * wtab_ref[c, 4 + q]
            base_cov[t] = cov_t
    else:
        for t in range(4):
            for l in range(11):
                onehot[:, l * L:(l + 1) * L] = \
                    (cls == t * 11 + l).astype(jnp.bfloat16)
            counts = jax.lax.dot_general(
                membT, onehot[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (2G, 11L)
            cov_t = jnp.zeros((G, L), jnp.float32)
            for l in range(11):
                c = t * 11 + l
                Cc = counts[0:G, l * L:(l + 1) * L]
                Rc = counts[G:2 * G, l * L:(l + 1) * L]
                F = Cc - Rc
                cov_t = cov_t + Cc
                for q in range(4):
                    lik[q] = lik[q] + F * wtab_ref[c, q] \
                        + Rc * wtab_ref[c, 4 + q]
            base_cov[t] = cov_t
    tot = base_cov[0] + base_cov[1] + base_cov[2] + base_cov[3]

    # candidate-base prior: damage table for original positions,
    # sequencing-error table for already-extended sequence
    obs_mask = [(obs == t).astype(jnp.float32) for t in range(4)]
    for q in range(4):
        dam = jnp.zeros((G, L), jnp.float32)
        for t in range(4):
            lay = jnp.zeros((G, L), jnp.float32)
            for l in range(11):
                lay = lay + jnp.where(own_layer == l,
                                      wtab_ref[t * 11 + l, q], 0.0)
            dam = dam + obs_mask[t] * lay
        err = (obs_mask[0] * wtab_ref[44, q] + obs_mask[1] * wtab_ref[45, q]
               + obs_mask[2] * wtab_ref[46, q] + obs_mask[3] * wtab_ref[47, q])
        log_q = jnp.where(was_ext, err, dam)
        lik[q] = lik[q] + tot * log_q

    # first-max argmax (jnp.argmax tie semantics: strict > to update)
    best = lik[0]
    bi = jnp.zeros((G, L), jnp.int32)
    for q in range(1, 4):
        upd = lik[q] > best
        best = jnp.where(upd, lik[q], best)
        bi = jnp.where(upd, q, bi)

    # ct/ga >= 0.4 early exit (exact: 5*count >= 2*total on integer f32)
    ratio_exit = (~was_ext) & ((5.0 * base_cov[3] >= 2.0 * tot)
                               | (5.0 * base_cov[0] >= 2.0 * tot))
    # coverage<=1 gate folded into the base itself (position keeps its
    # own base): queries with any non-ACGT/lowercase character are
    # routed to the host oracle, so ACGT[obs] == the original byte and
    # the pull needs only 2 bits per base — FOUR query slots per byte
    # (slots g, g+G/4, g+2G/4, g+3G/4), a 4x narrower D2H pull
    final = jnp.where(ratio_exit | (tot < 2.0), obs, bi)
    q = G // 4
    packed_ref[:] = (final[0:q] + 4 * final[q:2 * q] + 16 * final[2 * q:3 * q]
                     + 64 * final[3 * q:4 * q]).astype(jnp.int8)


@partial(jax.jit, static_argnames=("nb", "max_len", "interpret", "g",
                                   "rec_tile"))
def _correction_pallas_device(sym2, rec_rows_t, rscal, slot_qid, qscal,
                              wtab, nb: int, max_len: int, interpret: bool,
                              g: int = G, rec_tile: int = REC_TILE):
    G_, REC_TILE_ = g, rec_tile
    t_sym = sym2[rec_rows_t].astype(jnp.int8)       # (nb*R, L) row gathers
    slot_sym = sym2[slot_qid].astype(jnp.int8)      # (nb*G, L)
    L = max_len
    chunked = _chunked_for(max_len)

    def spec(shape, mem=pltpu.VMEM):
        return pl.BlockSpec(shape, lambda i: (i, 0), memory_space=mem)

    packed = pl.pallas_call(
        _make_correction_kernel(G_, chunked),
        grid=(nb,),
        in_specs=[spec((REC_TILE_, L)), spec((REC_TILE_, 8)),
                  spec((G_, L)), spec((G_, 8)),
                  pl.BlockSpec((48, 16), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=spec((G_ // 4, L)),
        out_shape=jax.ShapeDtypeStruct((nb * G_ // 4, L), jnp.int8),
        scratch_shapes=[pltpu.VMEM(
            (REC_TILE_, (1 if chunked else 11) * L), jnp.bfloat16)],
        interpret=interpret,
    )(t_sym, rscal, slot_sym, qscal, wtab)
    return packed


@jax.jit
def _derive_corrected_planes(sym2, lengths, packed, src_slot):
    """Rebuild the corrected shared planes ON DEVICE from the correction
    kernel's packed 2-bit output: decode the four bit-pair slices into
    per-slot symbol rows, then row-gather each sequence's corrected row
    (original row where src_slot < 0: the query had no device slot, so
    correction left it unchanged).  Lengths are unchanged by correction,
    so the RC/code planes re-derive as usual — nothing crosses the
    host<->device tunnel except the tiny src map."""
    from .rescore_tpu import _assemble_planes
    nbq, L = packed.shape          # (nb * G//4, L)
    n = lengths.shape[0]
    sym_fwd = sym2[:n]
    slices = [(packed >> (2 * j)) & 3 for j in range(4)]
    # slot s = b*G+g lands at decoded row (b*(G//4) + g%(G//4))*4 +
    # g//(G//4); src_slot from the host encodes exactly this index
    # (_slot_row_index), so the interleave order is self-consistent
    codes = jnp.concatenate(
        [s.reshape(-1, 1, L) for s in slices], axis=1).reshape(-1, L)
    sym = jnp.full(codes.shape, ord("A"), dtype=jnp.uint8)
    sym = jnp.where(codes == 1, jnp.uint8(ord("C")), sym)
    sym = jnp.where(codes == 2, jnp.uint8(ord("G")), sym)
    sym = jnp.where(codes == 3, jnp.uint8(ord("T")), sym)
    picked = sym[jnp.clip(src_slot, 0, sym.shape[0] - 1)]
    has_slot = src_slot >= 0
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    in_len = pos < lengths.astype(jnp.int32)[:, None]
    new_fwd = jnp.where(has_slot[:, None] & in_len, picked, sym_fwd)
    return _assemble_planes(new_fwd, lengths)


def _slot_row_index(slot_pos, g: int):
    """Row index of slot `slot_pos` (= block*G + slot) inside the decoded
    `codes` array of _derive_corrected_planes: the four bit-pair slices
    of quarter-row r are interleaved at rows 4*r + j."""
    b = slot_pos // g
    s = slot_pos % g
    quarter = g // 4
    return (b * quarter + (s % quarter)) * 4 + s // quarter


def build_correction_blocks(rec, lengths, n_seqs, g: int = G,
                            rec_tile: int = REC_TILE, heavy_mask=None):
    """Pack queries (with their surviving records) into (g, rec_tile)
    blocks.  Returns None if any single query owns more than rec_tile
    records (caller falls back to the XLA kernel).  `heavy_mask` marks
    additional per-sequence ids to route through the host per-query
    oracle (e.g. queries longer than the device plane width)."""
    from ..utils import bucket
    G, REC_TILE = g, rec_tile

    keep = rec["rec_keep_pre"]
    idx = np.nonzero(keep)[0]
    if len(idx) == 0:
        # nothing survived the pre-filters (empty AlnDB, or e.g. a
        # contig-phase where every target has ext=True): no blocks
        return None
    q = rec["rec_q"][idx]
    order = np.argsort(q, kind="stable")
    idx = idx[order]
    q = q[order]
    uq, starts, cnts = np.unique(q, return_index=True, return_counts=True)
    is_heavy = cnts > REC_TILE
    if heavy_mask is not None:
        is_heavy |= heavy_mask[uq]
    heavy_qids = uq[is_heavy]
    if len(heavy_qids):
        light = ~is_heavy
        keep_rec = np.isin(q, uq[light])
        idx = idx[keep_rec]
        q = q[keep_rec]
        uq, starts, cnts = uq[light], None, cnts[light]
        starts = np.concatenate([[0], np.cumsum(cnts)])[:-1]
    nq = len(uq)
    if nq == 0:
        # only heavy stacks remain: the host oracle handles the whole DB
        return None
    nrec = len(q)
    cum = np.concatenate([[0], np.cumsum(cnts)])

    # greedy pack boundaries: one loop per BLOCK (not per query)
    bstart = []
    pos = 0
    while pos < nq:
        bstart.append(pos)
        j_rec = int(np.searchsorted(cum, cum[pos] + REC_TILE,
                                    side="right")) - 1
        pos = min(pos + G, max(j_rec, pos + 1))
    bstart = np.asarray(bstart, dtype=np.int64)
    bend = np.concatenate([bstart[1:], [nq]])
    nb = bucket(max(1, len(bstart)), NB_BUCKET)

    # vectorised slot assignment
    block_of_q = np.repeat(np.arange(len(bstart)), bend - bstart)
    slot_of_q = np.arange(nq) - bstart[block_of_q]
    rank = np.repeat(np.arange(nq), cnts)          # query rank per record
    blk_r = block_of_q[rank]
    ridx = np.arange(nrec) - cum[bstart[blk_r]]    # record pos in block
    rec_pos = blk_r * REC_TILE + ridx

    rec_sel = np.zeros(nb * REC_TILE, dtype=np.int64)
    rec_use = np.zeros(nb * REC_TILE, dtype=bool)
    qslot = np.zeros((nb, 8, REC_TILE), dtype=np.int32)
    qslot[:, 0, :] = G  # no slot
    rec_sel[rec_pos] = np.arange(nrec)
    rec_use[rec_pos] = True
    qslot0 = np.full(nb * REC_TILE, G, dtype=np.int32)
    qslot0[rec_pos] = slot_of_q[rank]
    qslot[:, 0, :] = qslot0.reshape(nb, REC_TILE)
    slot_qid = np.zeros(nb * G, dtype=np.int32)
    slot_valid = np.zeros(nb * G, dtype=bool)
    slot_pos = block_of_q * G + slot_of_q
    slot_qid[slot_pos] = uq
    slot_valid[slot_pos] = True
    sel = idx[rec_sel]  # indices into the original record arrays
    return {"nb": nb, "sel": sel, "use": rec_use,
            "qslot": qslot, "slot_qid": slot_qid,
            "slot_valid": slot_valid, "heavy_qids": heavy_qids}


# device length levels for correction: queries run in the narrowest
# level holding the query AND every target in its surviving stack;
# levels above 2048 use the layer-chunked kernel (VMEM linear in L);
# beyond the last level the per-query host oracle takes over.
CORR_LEN_LEVELS = (512, 2048, 4096, 8192)


def _run_correction_level(planes, lens, rec, rows, q_lvl, t_row_lvl,
                          ext_lvl, tlen_lvl, n_lvl, damage, out_flat,
                          offsets, qid_of, lens_global, sink=None,
                          defer_list=None):
    """One length level: pack blocks, run the fused kernel, write the
    corrected bytes of this level's queries into out_flat.  Returns the
    level's heavy query ids (stacks too deep for the record tile),
    REMAPPED BACK to global ids."""
    from ..utils import subtimer
    max_len = planes["sym"].shape[1]
    G, REC_TILE = _tiles_for(max_len)
    rec_lvl = {"rec_keep_pre": rec["rec_keep_pre"][rows],
               "rec_q": q_lvl,
               "rec_qstart": rec["rec_qstart"][rows],
               "rec_tstart": rec["rec_tstart"][rows],
               "rec_alen": rec["rec_alen"][rows],
               "rec_ry_smin": rec["rec_ry_smin"][rows],
               "rec_is_rev": rec["rec_is_rev"][rows]}
    with subtimer(f"corr.blocks_L{max_len}"):
        blocks = build_correction_blocks(rec_lvl, lens, n_lvl, g=G,
                                         rec_tile=REC_TILE)
    if blocks is None:
        return qid_of[np.unique(q_lvl[rec_lvl["rec_keep_pre"]])] \
            if rec_lvl["rec_keep_pre"].any() else np.zeros(0, np.int64)
    nb = blocks["nb"]
    sel, use = blocks["sel"], blocks["use"]

    _st_scal = subtimer(f"corr.scalars_L{max_len}")
    _st_scal.__enter__()
    # level-dependent scalar dtype: every per-record value is bounded by
    # the level width (and qslot by G <= 128), so narrow levels ship
    # uint8 scalars — half the tunnel bytes of int16
    sdt = np.uint8 if max_len <= 255 and G <= 255 else np.int16
    rscal = np.zeros((nb * REC_TILE, 8), dtype=sdt)
    rscal[:, 0] = rec_lvl["rec_qstart"][sel]
    rscal[:, 1] = rec_lvl["rec_tstart"][sel]
    rscal[:, 2] = rec_lvl["rec_alen"][sel]
    rscal[:, 3] = tlen_lvl[sel]
    rscal[:, 4] = rec_lvl["rec_ry_smin"][sel]
    rscal[:, 5] = use  # keep_pre already applied by the block builder
    rscal[:, 6] = blocks["qslot"][:, 0, :].reshape(nb * REC_TILE)
    rscal[:, 7] = rec_lvl["rec_is_rev"][sel] & use

    qscal = np.zeros((nb * G, 8), dtype=sdt)
    qscal[:, 0] = np.asarray(lens)[blocks["slot_qid"]]
    qscal[:, 1] = ext_lvl[blocks["slot_qid"]] & blocks["slot_valid"]

    seq_err = seq_error_profile(0.01)
    log_err = np.log(seq_err).astype(np.float32)
    log_f = np.log(np.maximum(damage.fwd, SMOOTHING_VALUE)).astype(np.float32)
    log_r = np.log(np.maximum(damage.rev, SMOOTHING_VALUE)).astype(np.float32)
    wtab = np.zeros((48, 16), dtype=np.float32)
    for t in range(4):
        for l in range(11):
            wtab[t * 11 + l, 0:4] = log_f[l, :, t]
            wtab[t * 11 + l, 4:8] = log_r[l, :, t]
        # log_q_err[p, q] = log_err[q, obs[p]]
        wtab[44 + t, 0:4] = log_err[:, t]

    _st_scal.__exit__()
    with subtimer(f"corr.device_L{max_len}"):
        dev_out = _correction_pallas_device(
            planes["sym"], t_row_lvl[sel].astype(np.int32),
            rscal, blocks["slot_qid"], qscal, wtab,
            nb=nb, max_len=max_len,
            interpret=jax.default_backend() == "cpu",
            g=G, rec_tile=REC_TILE)
        dev_out.copy_to_host_async()
    if sink is not None:
        sink["dev_out"] = dev_out
        sink["blocks"] = blocks
        sink["g"] = G

    def _unpack_numpy(packed):
        acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
        # un-2-bit: block row b*G/4+g holds slots g, g+G/4, g+2G/4,
        # g+3G/4 in bit pairs 0..3; every position < qlen is written
        # (coverage gate folded on device; non-ACGT queries never take
        # this path)
        quarter = packed.reshape(nb, G // 4, max_len)
        full = np.concatenate([quarter & 3, (quarter >> 2) & 3,
                               (quarter >> 4) & 3, (quarter >> 6) & 3],
                              axis=1)
        full = full.reshape(nb * G, max_len)
        valid = np.nonzero(blocks["slot_valid"])[0]
        qids_g = qid_of[blocks["slot_qid"][valid]]
        posg = np.arange(max_len)
        pv = full[valid]
        m = posg[None, :] < lens_global[qids_g][:, None]
        rows_m, cols = np.nonzero(m)
        flat_idx = offsets[qids_g[rows_m]] + cols
        out_flat[flat_idx] = acgt[pv[rows_m, cols]]

    def _pull_and_unpack():
        with subtimer(f"corr.pull_L{max_len}"):
            packed = np.asarray(dev_out)
        from .. import native
        with subtimer(f"corr.unpack_L{max_len}"):
            nat_ok = native.corr_unpack2_scatter(
                packed, nb, G, max_len, blocks["slot_valid"],
                blocks["slot_qid"], qid_of, lens_global, offsets,
                out_flat)
        if not nat_ok:
            _unpack_numpy(packed)

    if defer_list is not None:
        # the device->host copy is already streaming; the caller overlaps
        # other work and materialises via the deferred closure
        defer_list.append(_pull_and_unpack)
        return qid_of[blocks["heavy_qids"]]
    _pull_and_unpack()
    return qid_of[blocks["heavy_qids"]]


def correction_pallas(seqdb: SeqDB, aln, damage: DamageModel,
                      corr_reads_ry_seq_id: float, seq_id_thr: float,
                      planes=None, lengths=None,
                      return_planes: bool = False, defer: bool = False):
    """Fused-Pallas drop-in for ops.correction_tpu.correction_tpu,
    length-levelled: each query runs in the narrowest device level
    (CORR_LEN_LEVELS) that holds it and every target in its surviving
    record stack; only queries beyond the last level (or with stacks
    deeper than the record tile) use the per-query host oracle."""
    from ..utils import bucket_len, subtimer
    from .correction_tpu import prepare_correction_inputs
    from .rescore_tpu import device_planes

    n = len(seqdb)
    db_max = int(seqdb.lengths.max()) if n else 1
    with subtimer("corr.prepare_inputs"):
        rec = prepare_correction_inputs(seqdb, aln, n, corr_reads_ry_seq_id,
                                        seq_id_thr)
    lens_all = seqdb.lengths.astype(np.int64)

    # per-query width requirement: own length and the longest target in
    # the surviving stack
    wq = lens_all.copy()
    kp = np.nonzero(rec["rec_keep_pre"])[0]
    if len(kp):
        np.maximum.at(wq, rec["rec_q"][kp],
                      lens_all[rec["rec_t_row"][kp] % n])

    total_len = int(seqdb.lengths.sum())
    out_flat = seqdb.data[:total_len].copy()
    offsets = seqdb.offsets.astype(np.int64)
    heavy_all: list[np.ndarray] = []

    # queries containing any non-ACGT or lowercase character take the
    # host oracle: the device path's 2-bit pull is exact only when the
    # unchanged positions round-trip through ACGT[obs] == original byte
    from .window_pallas import has_non_acgt_flags
    done_q = has_non_acgt_flags(seqdb).copy()
    if done_q.any():
        heavy_all.append(np.nonzero(done_q)[0].astype(np.int64))
    planes_sink = None
    non_shared_lvl_ran = False
    defer_list: list | None = [] if defer else None
    for lvl in CORR_LEN_LEVELS:
        if done_q.all():
            break
        in_lvl = ~done_q & (wq <= lvl)
        done_q |= in_lvl
        if not in_lvl.any():
            continue
        rows = np.nonzero(rec["rec_keep_pre"]
                          & in_lvl[rec["rec_q"]])[0]
        qs_lvl = np.nonzero(in_lvl)[0]
        shared_lvl = lvl == CORR_LEN_LEVELS[0] and planes is not None \
            and planes["sym"].shape[1] <= bucket_len(lvl)
        if shared_lvl:
            pl_b, len_b = planes, np.asarray(lengths)
            qid_of = np.arange(n, dtype=np.int64)
            q_lvl = rec["rec_q"][rows]
            t_row_lvl = rec["rec_t_row"][rows]
            ext_lvl = seqdb.ext
            n_lvl = n
        else:
            sub = np.unique(np.concatenate(
                [qs_lvl, rec["rec_t_row"][rows] % n]))
            remap = np.full(n, -1, dtype=np.int64)
            remap[sub] = np.arange(len(sub))
            cap = bucket_len(min(lvl, int(wq[qs_lvl].max())))
            pl_b, len_b = device_planes(seqdb, max_len=cap, ids=sub)
            n_lvl = len(sub)
            qid_of = sub.astype(np.int64)
            q_lvl = remap[rec["rec_q"][rows]]
            tr = rec["rec_t_row"][rows]
            t_row_lvl = remap[tr % n] + np.where(tr >= n, n_lvl, 0)
            ext_lvl = seqdb.ext[sub]
        if not shared_lvl:
            non_shared_lvl_ran = True
        sink = {} if (return_planes and shared_lvl) else None
        heavy = _run_correction_level(
            pl_b, len_b, rec, rows, q_lvl, t_row_lvl, ext_lvl,
            lens_all[rec["rec_t_row"][rows] % n], n_lvl, damage,
            out_flat, offsets, qid_of, lens_all, sink=sink,
            defer_list=defer_list)
        if len(heavy):
            heavy_all.append(np.asarray(heavy, dtype=np.int64))
        if sink is not None and sink:
            planes_sink = sink

    rest = np.nonzero(~done_q)[0]
    if len(rest):
        heavy_all.append(rest.astype(np.int64))

    # queries beyond the device levels or with record stacks exceeding
    # the block's record tile run through the per-query host oracle
    # (rare: very long contigs / deep-coverage stacks; exact)
    heavy = np.unique(np.concatenate(heavy_all)) if heavy_all \
        else np.zeros(0, np.int64)
    from ..utils import coverage_add
    coverage_add("correction", n - len(heavy), len(heavy))
    if len(heavy):
        # make silent host fallback visible (device-coverage telemetry)
        from ..utils import log_info
        log_info(f"correction: {n - len(heavy)}/{n} queries on device, "
                 f"{len(heavy)} via host oracle")

    def _finish() -> SeqDB:
        for fn in (defer_list or ()):
            fn()                       # deferred pulls -> out_flat
        if len(heavy):
            from ..aligndb import AlnDB
            from ..stages.correction import correction_per_query
            key2qi = {int(k): i for i, k in enumerate(aln.qkeys)}
            sel_q = [key2qi[int(seqdb.keys[qid])] for qid in heavy
                     if int(seqdb.keys[qid]) in key2qi]
            row_idx = np.concatenate(
                [np.arange(aln.starts[qi], aln.starts[qi + 1])
                 for qi in sel_q]) if sel_q else np.zeros(0, np.int64)
            grp = np.array([aln.starts[qi + 1] - aln.starts[qi]
                            for qi in sel_q], dtype=np.int64)
            aln_h = AlnDB.from_arrays(
                aln.qkey[row_idx], aln.qkeys[sel_q],
                np.concatenate([[0], np.cumsum(grp)]),
                **{k_: v[row_idx] for k_, v in aln.cols.items()})
            corr_h = correction_per_query(seqdb, aln_h, damage,
                                          corr_reads_ry_seq_id,
                                          seq_id_thr)
            for qid in heavy:
                o = offsets[qid]
                Lq = int(seqdb.lengths[qid])
                out_flat[o:o + Lq] = corr_h.seq_bytes(int(qid))
        return SeqDB.from_flat(out_flat, seqdb.lengths.copy(),
                               keys=seqdb.keys.copy(),
                               ext=seqdb.ext.copy(),
                               headers=seqdb.headers)

    # corrected shared planes, derived on device when every corrected
    # query ran in the shared level-0 blocks (no heavy/host-corrected
    # rows that would leave stale plane rows); `None` tells the caller
    # to fall back to a fresh pack+upload.  Derivation dispatches BEFORE
    # the deferred pulls execute, so in defer mode the planes are
    # available while the correction output still streams to the host.
    shared_out = None
    if return_planes and planes is not None and len(heavy) == 0 \
            and not non_shared_lvl_ran:
        if planes_sink is not None:
            blocks = planes_sink["blocks"]
            g = planes_sink["g"]
            slot_pos = np.nonzero(blocks["slot_valid"])[0]
            src = np.full(n, -1, dtype=np.int32)
            src[blocks["slot_qid"][slot_pos]] = \
                _slot_row_index(slot_pos, g).astype(np.int32)
            with _subtimer_planes():
                derived = _derive_corrected_planes(
                    planes["sym"], planes["len"],
                    planes_sink["dev_out"], src)
            shared_out = {"planes": derived, "lengths": lengths}
        elif kp.size == 0:
            # nothing survived the pre-filters anywhere: correction was
            # the identity, the input planes are still exact
            shared_out = {"planes": planes, "lengths": lengths}
    if defer:
        return (_finish, shared_out) if return_planes else _finish
    out_db = _finish()
    return (out_db, shared_out) if return_planes else out_db


def _subtimer_planes():
    from ..utils import subtimer
    return subtimer("corr.derive_planes")


# pipeline.nuclassemble checks this to request device-derived corrected
# planes instead of re-packing + re-uploading them for the extension stage
correction_pallas.supports_planes_out = True
