"""Device-side residual bit packing (SURVEY §7 build step 5).

Packs each subframe's complete residual section — coding method, partition
order, partition headers, Rice/escape-coded residuals — into a single
uint32 word buffer ON DEVICE via per-symbol bit-length computation, an
intra-subframe prefix sum over code lengths, and a two-word scatter-OR per
symbol (implemented as scatter-add: symbol bit fields never overlap, and
unary zeros are implicit in the zero-initialised buffer).

This removes the raw residual arrays from the device->host transfer — the
host receives ~compressed-size packed bits plus tiny parameter arrays and
just splices blobs between headers (native copy_bits).

Round-5 rework: all (B, N) sample math runs in int32/uint32 when the
residual panel is narrow (quotients clamped at 2^18 — any clamped row
already exceeds every real budget and is flagged for host fallback), and
every field scatter CHAINS onto one running buffer instead of summing
per-field zero-initialised copies (each of which cost a full buffer
zero + add pass on TPU, ~0.3 ms per field at production shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rice import KIND_CONSTANT, KIND_ESCAPE, KIND_RICE, MAX_PARTITIONS, zigzag

# any single Rice symbol at least this long overflows every real section
# budget (<= 18 * 65535 bits), so clamping quotients here keeps the int32
# prefix sum exact (4096 * (2^18 + 41) < 2^31) without changing which rows
# get flagged for host fallback
_QUOTIENT_CAP = 1 << 18


def make_scatter(out_words: int):
    """Build the two-word scatter-OR helper for a shared uint32 buffer.

    The returned ``scatter(buf, values, widths, end_offsets, mask)`` ORs
    ``widths``-bit ``values`` ending at absolute bit ``end_offsets`` into
    ``buf`` via chained scatter-ADDs (bit fields written this way never
    overlap, and unary/padding zeros are implicit in the zero-initialised
    buffer) — in place when XLA can prove ``buf`` dead afterwards, which
    the chained-accumulator call pattern guarantees.
    """

    def scatter(buf, values, widths, end_offsets, mask):
        start = end_offsets - widths
        word0 = jax.lax.shift_right_logical(start, start.dtype.type(5))
        sh = start & 31
        # 64-bit window anchored at word0's bit 0
        pattern = jax.lax.shift_left(
            values.astype(jnp.uint64),
            (64 - sh - widths).astype(jnp.uint64))
        hi = jax.lax.shift_right_logical(
            pattern, jnp.uint64(32)).astype(jnp.uint32)
        lo = (pattern & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        hi = jnp.where(mask, hi, 0)
        lo = jnp.where(mask, lo, 0)
        idx0 = jnp.where(mask, word0, 0).astype(jnp.int32)
        return (buf
                .at[idx0.reshape(-1)].add(hi.reshape(-1), mode="drop")
                .at[(idx0 + 1).reshape(-1)].add(lo.reshape(-1), mode="drop"))

    return scatter


def pack_residual_sections(res: jnp.ndarray, order: jnp.ndarray,
                           po: jnp.ndarray, kinds: jnp.ndarray,
                           params: jnp.ndarray, rice_bits: jnp.ndarray,
                           block_size: int, out_words: int,
                           base_bits: jnp.ndarray, budget_bits: int,
                           live=None, samples: str = "scatter",
                           panel_words: int = 0, fields=None):
    """Pack one slot's residual sections for the whole batch.

    res: (B, N) int32 (narrow mode) or int64 residuals at positions >=
        order.
    order/po/rice_bits: (B,).  kinds/params: (B, 64).
    base_bits: (B,) int64 absolute starting BIT offset of each subframe's
        residual section in the shared output buffer (need not be aligned).
    budget_bits: per-subframe section capacity; bits past it are dropped
        (the caller detects overflow via the returned bit length and falls
        back to host encoding for that frame).
    live: optional (B,) bool — rows whose writes are suppressed entirely
        (constant/verbatim slots).  None means all rows live.
    samples: "scatter" (two-word scatter-add per symbol) or "panel"
        (chunked one-hot MXU + Pallas merge, see ops.packpanel) — the
        panel strategy requires ``panel_words`` (the per-row panel size P;
        rows must be laid out at P-word strides, i.e. base_bits - the
        residual section's in-panel offset must be b * P * 32).
    fields: optional list of (values, widths, ends, mask) header-field
        groups, each (B,) or (B, K) with ABSOLUTE flat bit ends — packed
        for free through the one-hot field window (panel strategy; every
        field must end within the panel's first FIELD_WINDOW_WORDS words,
        true for all subframe header fields) or chained scatters
        (scatter strategy).

    Returns (words (out_words,) uint32, bit_len (B,), pack_ovf) — the
    caller may chain more field scatters onto ``words``; ``pack_ovf``
    (B,) flags rows whose symbols exceeded a one-hot chunk window (panel
    strategy only; those frames must fall back to host).
    """
    B, N = res.shape
    narrow = res.dtype == jnp.int32
    pos = jnp.arange(N, dtype=jnp.int32)
    in_res = pos[None, :] >= order.astype(jnp.int32)[:, None]

    from .rice import expand_to_samples

    # fine-grid expansion (see rice.expand_to_samples): any chosen po is
    # bounded by the block size's trailing zeros and MAX_PARTITIONS
    max_po = min((block_size & -block_size).bit_length() - 1, 6)
    fine_parts = 1 << max_po
    po32 = po.astype(jnp.int32)
    k_per = expand_to_samples(params.astype(jnp.int32), po32, N, max_po)
    kind_per = expand_to_samples(kinds.astype(jnp.int32), po32, N, max_po)

    u = zigzag(res)                     # uint32 (narrow) / uint64
    rb32 = rice_bits.astype(jnp.int32)[:, None]            # 4 or 5

    # --- per-sample code lengths (int32, quotient-clamped) ---
    k_pos = jnp.maximum(k_per, 0)
    quotient = jax.lax.shift_right_logical(u, k_pos.astype(u.dtype))
    q32 = jnp.minimum(quotient, u.dtype.type(_QUOTIENT_CAP)).astype(jnp.int32)
    sample_len = jnp.where(
        kind_per == KIND_RICE, q32 + k_per + 1,
        jnp.where(kind_per == KIND_ESCAPE, k_per, 0))
    sample_len = jnp.where(in_res, sample_len, 0)

    # fold per-partition header lengths into the first in-residual sample
    # of each partition (partitions with no samples cannot occur, p0>=1):
    # a sample is its partition's first iff it sits on a chosen-partition
    # boundary — or, for partition 0, exactly at `order`
    f = jnp.arange(fine_parts, dtype=jnp.int32)
    cell_is_pstart = (f[None, :] & ((1 << (max_po - po32[:, None])) - 1)) == 0
    cell_in_part0 = (f[None, :] >> (max_po - po32[:, None])) == 0
    sub = N >> max_po                                      # samples per cell
    is_cell_start = (pos % sub) == 0                       # (N,) static
    starts = jnp.repeat(cell_is_pstart, sub, axis=1) & is_cell_start[None, :]
    in_part0 = jnp.repeat(cell_in_part0, sub, axis=1)
    first_of_part = jnp.where(in_part0,
                              pos[None, :] == order.astype(jnp.int32)[:, None],
                              starts)
    hdr_len_per = jnp.where(kind_per == KIND_RICE, rb32, rb32 + 5)
    extra = jnp.where(first_of_part & in_res, hdr_len_per, 0)

    # partition-TABLE header lengths/values ((B, 64), partition layout):
    # the header scatter below runs on these tiny tables, not the sample
    # panel — only the per-sample `extra` fold above needs the fine grid
    p_ids = jnp.arange(MAX_PARTITIONS, dtype=jnp.int32)
    parts_chosen = jnp.int32(1) << po32
    p_live = p_ids[None, :] < parts_chosen[:, None]        # (B, 64)
    rb64 = rice_bits.astype(jnp.int64)[:, None]
    k_tab = params.astype(jnp.int64)
    kind_tab = kinds.astype(jnp.int32)
    hdr_len_tab = jnp.where(kind_tab == KIND_RICE, rb64, rb64 + 5)

    # section prefix: 2 bits method + 4 bits partition order
    lens = sample_len + extra
    if lens.dtype == jnp.int32 and N % 128 == 0:
        # exact MXU prefix sum: one triangular matmul per 16-bit half vs
        # cumsum's ~12 reduce-window HBM round-trips (row sums < 2^31 by
        # the quotient clamp)
        from .common import prefix_sum_i32
        ends = prefix_sum_i32(lens) + 6
    else:
        ends = jnp.cumsum(lens, axis=1) + 6
    bit_len = ends[:, -1]                                  # (B,) section bits

    base_bits = base_bits.astype(jnp.int64)
    live_b = jnp.ones(B, bool) if live is None else live

    in_budget = ends <= budget_bits  # (B, N) per-sample budget guard

    # sample-code values/widths
    #    rice: (1 << k) | (u & mask) in the low k+1 bits (unary zeros
    #    implicit); escape: u's signed value in k bits
    one = u.dtype.type(1)
    k_mask = (one << k_pos.astype(u.dtype)) - one
    rice_val = (one << k_per.astype(u.dtype)) | (u & k_mask)
    esc_w = jnp.maximum(k_per, 1)
    if narrow:
        esc_mask = ((jnp.uint32(1) << esc_w.astype(jnp.uint32))
                    - jnp.uint32(1))
        esc_val = res.astype(jnp.uint32) & jnp.where(
            k_per > 0, esc_mask, 0)
    else:
        esc_mask = (jnp.int64(1) << esc_w.astype(jnp.int64)) - 1
        esc_val = res & jnp.where(k_per > 0, esc_mask, 0)
    val = jnp.where(kind_per == KIND_RICE, rice_val,
                    esc_val.astype(u.dtype))
    width = jnp.where(kind_per == KIND_RICE, k_per + 1, k_per)
    mask = live_b[:, None] & in_res & (kind_per != KIND_CONSTANT) & in_budget
    pack_ovf = jnp.zeros(B, bool)

    scatter = make_scatter(out_words)

    # section prefix (method (2) + partition order (4), ending at bit 6
    # of the section) rides the header-field pass with any caller fields
    prefix_val = (jnp.where(rice_bits == 4, 0, 1).astype(jnp.int64) << 4) \
        | po.astype(jnp.int64)
    field_groups = [(prefix_val, jnp.full(B, 6, jnp.int64),
                     base_bits + 6, live_b)]
    if fields:
        field_groups += [tuple(g) for g in fields]

    def _as2d(a):
        return a[:, None] if a.ndim == 1 else a

    def _norm(g):  # normalize a field group to a common (B, K) shape
        v, w, e, m = (_as2d(x) for x in g)
        K = max(v.shape[1], w.shape[1], e.shape[1], m.shape[1])
        return tuple(jnp.broadcast_to(x, (B, K)) for x in (v, w, e, m))

    field_groups = [_norm(g) for g in field_groups]

    # partition-header table values/lengths (shared by both strategies;
    # see the header-placement comment below)
    escape_code = (jnp.int64(1) << rb64[:, 0]) - 1         # (B,)

    if samples == "panel":
        # chunked one-hot MXU + Pallas merge (ops.packpanel): rows are
        # laid out at panel_words strides, so the merged (B, P) panel IS
        # the flat buffer's row-major content — it becomes the running
        # buffer every remaining field chains onto
        from .packpanel import (CHUNK_T, FIELD_WINDOW_WORDS, chunk_panels,
                                chunkmerge_panels, merge_panels,
                                merge_strategy, pack_fields_window)

        P = panel_words
        assert P > 0 and out_words >= B * P, (out_words, B, P)
        # panel-local offsets fit int32 (<= P * 32 per row)
        row_base = (base_bits
                    - jnp.arange(B, dtype=jnp.int64) * (P * 32)).astype(
                        jnp.int32)
        v_p, w_p, e_p, m_p = val, width, row_base[:, None] + ends, mask

        # partition headers ride the one-hot symbol stream as pseudo-
        # symbol columns, one interleaved before each fine cell (live iff
        # the cell starts a chosen partition): each header is <= 10 bits
        # ending right where the partition's first sample code begins
        # (its length is already folded into that sample via `extra`).
        # Replaces the (B, 64)-table scatter-adds, whose 4 chained full-
        # buffer passes measured ~0.57 ms/step at production shapes
        # (tools/xplane_table.py round 5).
        from .rice import expand_fine

        cellcum_p = ends.reshape(B, fine_parts, sub)[:, :, -1]
        part_endcum_p = jnp.zeros((B, MAX_PARTITIONS), ends.dtype)
        for lvl in range(max_po + 1):
            step = fine_parts >> lvl
            lvl_end = cellcum_p[:, step - 1::step]
            lvl_end = jnp.pad(lvl_end,
                              ((0, 0), (0, MAX_PARTITIONS - (1 << lvl))))
            part_endcum_p = jnp.where(po32[:, None] == lvl, lvl_end,
                                      part_endcum_p)
        prev_end_p = jnp.concatenate(
            [jnp.full((B, 1), 6, ends.dtype), part_endcum_p[:, :-1]],
            axis=1).astype(jnp.int32)                      # (B, 64) partition
        hdr_len32 = jnp.where(kind_tab == KIND_RICE, rb32,
                              rb32 + 5)                    # (B, 64)
        hdr_val32 = jnp.where(
            kind_tab == KIND_RICE, params.astype(jnp.int32),
            (escape_code.astype(jnp.int32)[:, None] << 5)
            | jnp.where(kind_tab == KIND_ESCAPE, params.astype(jnp.int32),
                        0)).astype(jnp.uint32)
        pe_fine = expand_fine(prev_end_p, po32, max_po)    # (B, fine_parts)
        hl_fine = expand_fine(hdr_len32, po32, max_po)
        hv_fine = expand_fine(hdr_val32, po32, max_po)
        pm_fine = live_b[:, None] & cell_is_pstart \
            & (pe_fine + hl_fine <= budget_bits)
        pe_fine = row_base[:, None] + pe_fine + hl_fine    # panel-local ends

        def ilv(cols, panel, fill=None):
            grp = panel.reshape(B, fine_parts, sub)
            return jnp.concatenate([cols[:, :, None].astype(panel.dtype),
                                    grp], axis=2).reshape(B, -1)

        v_p = ilv(hv_fine, v_p)
        w_p = ilv(hl_fine, w_p)
        e_p = ilv(pe_fine, e_p)
        m_p = ilv(pm_fine, m_p)

        tail = (-(N + fine_parts)) % CHUNK_T
        if tail:  # block sizes not divisible by the chunk width
            v_p = jnp.pad(v_p, ((0, 0), (0, tail)))
            w_p = jnp.pad(w_p, ((0, 0), (0, tail)), constant_values=1)
            e_p = jnp.pad(e_p, ((0, 0), (0, tail)), mode="edge")
            m_p = jnp.pad(m_p, ((0, 0), (0, tail)))
        if merge_strategy() == "einsum":
            merged, pack_ovf = chunkmerge_panels(v_p, w_p, e_p, m_p, P)
        else:
            panels, offs, pack_ovf = chunk_panels(v_p, w_p, e_p, m_p)
            merged = merge_panels(panels, offs, P)

        # header fields land in the panel's first FIELD_WINDOW_WORDS
        # words via one one-hot MXU pass instead of per-field scatters
        origin = base_bits - row_base.astype(jnp.int64)  # (B,) panel bit 0
        fv = jnp.concatenate(
            [g[0].astype(jnp.uint32) for g in field_groups], axis=1)
        fw = jnp.concatenate(
            [g[1].astype(jnp.int32) for g in field_groups], axis=1)
        fe = jnp.concatenate(
            [(g[2] - origin[:, None]).astype(jnp.int32)
             for g in field_groups], axis=1)
        fm = jnp.concatenate([g[3] for g in field_groups], axis=1)
        win = pack_fields_window(fv, fw, fe, fm)
        merged = merged.at[:, :FIELD_WINDOW_WORDS].add(win)

        words = jnp.concatenate(
            [merged.reshape(-1), jnp.zeros(out_words - B * P, jnp.uint32)])
    else:
        words = jnp.zeros(out_words, jnp.uint32)
        words = scatter(words, val, width.astype(jnp.int64),
                        base_bits[:, None] + ends.astype(jnp.int64), mask)
        for gv, gw, ge, gm in field_groups:
            words = scatter(words, gv.astype(jnp.int64),
                            gw.astype(jnp.int64), ge.astype(jnp.int64), gm)

    # 2. partition headers (scatter strategy only — the panel strategy
    #    interleaved them into the symbol stream above): placed
    #    immediately before their first sample's code; value = rice
    #    param, or escape code + 5-bit escape size / constant marker.
    #    Scattered from the (B, 64) partition TABLE, not the (B, N)
    #    sample panel (<= 64 live headers per row): partition p's header
    #    ends at (cumulative bits through partition p-1) + header
    #    length, and the per-partition cumulative comes from the sample
    #    cumsum's value at each partition's last sample — a strided
    #    slice of the fine-cell grid, selected over the 7 static levels.
    if samples != "panel":
        cellcum = ends.reshape(B, fine_parts, sub)[:, :, -1]  # (B, 64) cum
        part_endcum = jnp.zeros((B, MAX_PARTITIONS), ends.dtype)
        for lvl in range(max_po + 1):
            step = fine_parts >> lvl
            lvl_end = cellcum[:, step - 1::step]           # (B, 2^lvl)
            lvl_end = jnp.pad(lvl_end,
                              ((0, 0), (0, MAX_PARTITIONS - (1 << lvl))))
            part_endcum = jnp.where(po32[:, None] == lvl, lvl_end,
                                    part_endcum)
        prev_end = jnp.concatenate(
            [jnp.full((B, 1), 6, ends.dtype), part_endcum[:, :-1]],
            axis=1).astype(jnp.int64)
        hdr_end_tab = base_bits[:, None] + prev_end + hdr_len_tab
        hdr_val_tab = jnp.where(
            kind_tab == KIND_RICE, k_tab,
            (escape_code[:, None] << 5)
            | jnp.where(kind_tab == KIND_ESCAPE, k_tab, 0))
        hdr_mask = live_b[:, None] & p_live & \
            (prev_end + hdr_len_tab <= budget_bits)
        words = scatter(words, hdr_val_tab, hdr_len_tab, hdr_end_tab,
                        hdr_mask)

    return words, bit_len.astype(jnp.int64), pack_ovf
