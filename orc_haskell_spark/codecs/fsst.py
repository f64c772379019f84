"""FSST: Fast Static Symbol Table compression for string/html streams.

ABSENT in the reference (SURVEY.md §2.1 C19) — implemented from the FSST
paper (Boncz, Neumann, Leis: "FSST: Fast Random Access String
Compression", VLDB 2020): a static table of ≤255 symbols, each 1-8
bytes; each output byte is a symbol code, with code 255 escaping one
literal input byte.

Implementation notes (numpy-vectorized, no per-byte Python):

- Matching follows the paper's table design: a 64K hash-slot table keyed
  on the first 3 bytes holds one candidate symbol of length ≥3 (exact
  masked-window compare confirms it), a 64K direct table resolves 2-byte
  symbols, a 256 table resolves single bytes. One probe per position,
  all gathers — no per-length passes.
- Greedy left-to-right parsing is inherently sequential, BUT any
  segmentation into table symbols decodes identically — the decoder
  only expands codes. So encoding runs in lockstep over independent
  4 KiB blocks: all blocks advance one token per iteration as a vector,
  giving ≤4096 numpy-light iterations regardless of input size.
- Training is deterministic (fixed sample stride, stable sorts,
  tie-break by key) as required for resumable re-runs: ~4 generations
  of parse-sample → count adjacent-token concatenations → keep top
  symbols by gain = count × (len-1), seeded with frequent single bytes.
"""

from __future__ import annotations

import ctypes

import numpy as np

from . import native

ESCAPE = 255
MAX_SYMBOLS = 255
MAX_LEN = 8
BLOCK = 4096
# (64 KiB sample, 6 generations) measured best on html: +6% ratio over
# (64K, 4) AND the fastest compression of the sweep (longer symbols ->
# fewer tokens); bigger samples buy ~2% more ratio but cost ~15%
# concurrent throughput
SAMPLE_BYTES = 1 << 16
GENERATIONS = 6
NSLOTS = 65536
_HASH_P = 0x9E3779B97F4A7C15

_MASKS = np.array(
    [0] + [(1 << (8 * k)) - 1 for k in range(1, 8)] + [0xFFFFFFFFFFFFFFFF],
    dtype=np.uint64,
)


def _windows_u64(data: np.ndarray) -> np.ndarray:
    """Little-endian 8-byte window starting at each position (zero padded).

    A byte-strided unaligned uint64 view over the padded buffer: zero
    construction cost — consumers read through SIMD unaligned loads
    (x86/arm handle these natively). ~3x faster than building the
    windows from aligned lanes.
    """
    n = data.size
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    padded = np.zeros(n + 8, dtype=np.uint8)
    padded[:n] = data
    return np.ndarray(buffer=padded, dtype="<u8", shape=(n,), strides=(1,))


def _slot_of(key3: int) -> int:
    return ((key3 * _HASH_P) & 0xFFFFFFFFFFFFFFFF) >> 48


class SymbolTable:
    """Static symbol table: codes 0..n_syms-1, code 255 = escape."""

    __slots__ = ("lens", "flat", "flat_padded", "offsets", "single_code",
                 "pair_code", "slot_key", "slot_len", "slot_code",
                 "slot_combo")

    def __init__(self, symbols: list[bytes]):
        assert len(symbols) <= MAX_SYMBOLS
        self.lens = np.array([len(s) for s in symbols], dtype=np.int64)
        self.offsets = np.zeros(len(symbols) + 1, dtype=np.int64)
        np.cumsum(self.lens, out=self.offsets[1:])
        self.flat = np.frombuffer(b"".join(symbols), dtype=np.uint8)
        self.single_code = np.full(256, -1, dtype=np.int16)
        self.pair_code = np.full(65536, -1, dtype=np.int16)
        # hash-slot table for symbols of length >= 3, keyed on first 3
        # bytes; lower codes (higher training gain) win slot collisions.
        # Empty slots hold an impossible key (all-ones) so the masked
        # compare can never match them — saves a cl>0 pass in the matcher.
        self.slot_key = np.full(NSLOTS, 0xFFFFFFFFFFFFFFFF, dtype=np.uint64)
        self.slot_len = np.zeros(NSLOTS, dtype=np.uint8)
        self.slot_code = np.zeros(NSLOTS, dtype=np.int16)
        for code in range(len(symbols) - 1, -1, -1):
            s = symbols[code]
            key = int.from_bytes(s, "little")
            if len(s) == 1:
                self.single_code[s[0]] = code
            elif len(s) == 2:
                self.pair_code[key] = code
            else:
                h = _slot_of(key & 0xFFFFFF)
                self.slot_key[h] = key
                self.slot_len[h] = len(s)
                self.slot_code[h] = code
        # fused code<<8|len table: the matcher does TWO gathers (key +
        # combo) instead of three — measured 181 vs 130 MB/s-eq.
        # (A (NSLOTS,2) row gather is SLOWER than flat gathers: numpy
        # 2D fancy indexing overhead dominates.)
        self.slot_combo = (self.slot_code.astype(np.uint16) << 8) \
            | self.slot_len.astype(np.uint16)
        # 8 zero bytes of slack so the C decoder's unconditional 8-byte
        # symbol copy can never read past the buffer
        self.flat_padded = np.concatenate(
            [self.flat, np.zeros(8, dtype=np.uint8)])

    def serialize(self) -> bytes:
        n = self.lens.size
        return bytes([n]) + self.lens.astype(np.uint8).tobytes() + self.flat.tobytes()

    @staticmethod
    def deserialize(buf: np.ndarray) -> "SymbolTable":
        n = int(buf[0])
        lens = buf[1: 1 + n].astype(np.int64)
        payload = buf[1 + n:]
        syms, pos = [], 0
        for ln in lens.tolist():
            syms.append(payload[pos: pos + ln].tobytes())
            pos += ln
        return SymbolTable(syms)


_MATCH_SEG = 1 << 16  # 64 KiB; must be a multiple of BLOCK.
# Sized by a 32-process barrier sweep (2^18/2^16/2^15/2^14 -> 12.5/
# 17.4/16.9/14.3 MB/s per core): the matcher's ~6 uint64 temporaries
# must fit L2 with every core busy — at 2^18 they are 2 MB each and the
# shared memory bus, not compute, caps throughput.


def _match(data: np.ndarray, table: SymbolTable) -> tuple[np.ndarray, np.ndarray]:
    """Longest-ish match per position -> (mlen uint8, mcode int16; -1 = escape).

    One hash-slot probe per position for ≥3-byte symbols (exact compare of
    the masked window confirms), then 2-byte and single-byte tables. A
    slot collision can hide a symbol — that only costs ratio, never
    correctness (any table segmentation decodes identically).

    Processed in 256 KiB segments so the uint64 window/hash temporaries
    stay cache-resident: with 32 concurrent executor workers the full-array
    form saturates DRAM bandwidth (measured 6.5x per-core slowdown).
    """
    n = data.size
    mcode = np.empty(n, dtype=np.int16)
    mlen = np.empty(n, dtype=np.uint8)
    has_slots = bool(table.slot_len.any())
    for s in range(0, max(n, 1), _MATCH_SEG):
        e = min(s + _MATCH_SEG, n)
        _match_segment(data, s, e, n, table, has_slots,
                       mlen[s:e], mcode[s:e])
    return mlen, mcode


def _match_segment(data, s, e, n, table, has_slots, mlen_out, mcode_out):
    m = e - s
    # windows may read past the segment (up to 7 bytes into the next)
    seg = data[s: min(e + 8, n)]
    mcode_out[:] = table.single_code[seg[:m]]
    mlen_out[:] = 1
    if m < 2:
        return
    # materialize the strided window view ONCE (1162 MB/s-eq vs 280 for
    # the old aligned-lane build); downstream passes then run aligned
    w8 = np.ascontiguousarray(_windows_u64(seg)[:m])
    if has_slots:
        h = ((w8 & np.uint64(0xFFFFFF)) * np.uint64(_HASH_P)) >> np.uint64(48)
        combo = table.slot_combo[h]
        cl = (combo & np.uint16(0xFF)).astype(np.uint8)
        hit = (w8 & _MASKS[cl]) == table.slot_key[h]
        # block-edge guard, strided (segment start is BLOCK-aligned)
        for off in range(BLOCK - 7, BLOCK):
            hit[off::BLOCK] &= cl[off::BLOCK] <= BLOCK - off
        # end-of-buffer guard (window is zero-padded past n)
        if e + 8 > n:
            tail = max(0, n - 8 - s)
            hit[tail:] &= (np.arange(s + tail, e) + cl[tail:]) <= n
        np.copyto(mlen_out, cl, where=hit)
        np.copyto(mcode_out, (combo >> np.uint16(8)).view(np.int16),
                  where=hit)
    # exact 2-byte symbols where nothing longer matched
    c2 = table.pair_code[(w8 & np.uint64(0xFFFF)).astype(np.uint16)]
    take2 = (c2 >= 0) & (mlen_out == 1)
    take2[BLOCK - 1:: BLOCK] = False  # 2-byte symbol would cross the block
    if e == n:
        take2[m - 1] = False
    np.copyto(mlen_out, np.uint8(2), where=take2)
    np.copyto(mcode_out, c2, where=take2)


def _parse_tokens(data: np.ndarray, table: SymbolTable):
    """Lockstep greedy parse -> (token positions, codes, lengths) in order.

    All blocks advance one token per iteration; a block stays active for a
    prefix of iterations, so final ordering is a bincount-offset scatter
    (no sort): token t of block b lands at cum_tokens[b] + step(t).
    """
    n = data.size
    mlen, mcode = _match(data, table)
    starts = np.arange(0, n, BLOCK, dtype=np.int32)
    ends = np.minimum(starts.astype(np.int64) + BLOCK, n).astype(np.int32)
    nblocks = starts.size
    pos = starts.copy()
    tok_pos: list[np.ndarray] = []  # int32 positions, one array per step
    while True:
        active = pos < ends
        if not active.any():
            break
        p = pos[active]
        tok_pos.append(p)
        pos[active] = p + mlen[p]
    if not tok_pos:
        empty = np.zeros(0, dtype=np.int64)
        return empty, empty, empty
    ap = np.concatenate(tok_pos)
    ab = ap >> np.int32(BLOCK.bit_length() - 1)  # block id = pos // BLOCK
    per_block = np.bincount(ab, minlength=nblocks)
    block_off = (np.cumsum(per_block) - per_block).astype(np.int32)
    # blocks stay active for a prefix of iterations, so the k-th step's
    # token of block b lands exactly at block_off[b] + k — no sort needed
    steps = np.repeat(
        np.arange(len(tok_pos), dtype=np.int32),
        np.fromiter((a.size for a in tok_pos), dtype=np.int64,
                    count=len(tok_pos)))
    dest = block_off[ab] + steps
    out_pos = np.empty(ap.size, dtype=np.int32)
    out_pos[dest] = ap
    return out_pos, mcode[out_pos], mlen[out_pos]


def _parse_for_train(sample: np.ndarray, table: SymbolTable):
    """Token stream for a training generation. Uses the C greedy parse
    when available (same tables; no 4 KiB block-edge guards, so counts
    differ slightly from the numpy lockstep parse — training remains
    deterministic WITHIN each path, and decode always uses the
    serialized table, so tables from either path interoperate)."""
    lib = native.load()
    if lib is None:
        return _parse_tokens(sample, table)
    sample = np.ascontiguousarray(sample, dtype=np.uint8)
    n = sample.size
    pos = np.empty(n, dtype=np.int32)
    codes = np.empty(n, dtype=np.int16)
    lens = np.empty(n, dtype=np.uint8)
    t = lib.fsst_parse(
        native.ptr(sample, ctypes.c_uint8), n,
        native.ptr(table.slot_key, ctypes.c_uint64),
        native.ptr(table.slot_combo, ctypes.c_uint16),
        native.ptr(table.pair_code, ctypes.c_int16),
        native.ptr(table.single_code, ctypes.c_int16),
        native.ptr(pos, ctypes.c_int32),
        native.ptr(codes, ctypes.c_int16),
        native.ptr(lens, ctypes.c_uint8))
    return pos[:t], codes[:t], lens[:t]


def train(data: np.ndarray) -> SymbolTable:
    """Deterministically train a symbol table on (a sample of) the data."""
    n = data.size
    if n > SAMPLE_BYTES:
        stride = n // SAMPLE_BYTES + 1
        # deterministic strided sample of 256-byte pieces, keeps locality
        piece = 256
        starts = np.arange(0, n - piece, piece * stride, dtype=np.int64)
        idx = (starts[:, None] + np.arange(piece)).ravel()
        sample = data[idx[idx < n]]
    else:
        sample = data
    # generation 0: frequent single bytes
    counts = np.bincount(sample, minlength=256)
    order = np.argsort(-counts, kind="stable")
    singles = [bytes([int(b)]) for b in order if counts[b] > 0][:MAX_SYMBOLS]
    table = SymbolTable(singles)
    u = np.ascontiguousarray(_windows_u64(sample))
    for _ in range(GENERATIONS):
        p, codes, lens = _parse_for_train(sample, table)
        if p.size < 2:
            break
        # adjacent-token concatenations ≤ 8 bytes, within the same block
        comb_len = lens[:-1].astype(np.int16) + lens[1:]
        ok = (comb_len <= MAX_LEN) & ((p[:-1] >> 12) == (p[1:] >> 12))
        keys = u[p[:-1][ok]] & _MASKS[comb_len[ok]]
        klen = comb_len[ok].astype(np.uint64)
        # count (key, len) pairs via one sort; the len tag xor is imperfect
        # for 8-byte keys but deterministic (counting noise only costs ratio)
        if keys.size:
            comb = keys ^ (klen << np.uint64(61))
            # quicksort + min-reduce instead of a stable argsort: the
            # representative of each comb group must be its FIRST
            # occurrence in the original order (what stable sort gave);
            # min-of-original-indices per group is the same value at
            # ~5x less sort cost (this is the training hot loop)
            order_ix = np.argsort(comb)
            sc = comb[order_ix]
            bounds = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
            cnts = np.diff(np.r_[bounds, sc.size])
            rep = np.minimum.reduceat(order_ix, bounds)
            gains = cnts * (klen[rep].astype(np.int64) - 1)
            # keep only the top candidates worth considering
            top = min(gains.size, MAX_SYMBOLS * 4)
            sel = np.argpartition(-gains, top - 1)[:top] if gains.size > top \
                else np.arange(gains.size)
        else:
            rep = gains = klen = keys  # empty
            sel = np.arange(0)
        # score existing symbols by current usage, then rank the union
        # of existing + candidate symbols by (-gain, symbol bytes) and
        # keep the top MAX_SYMBOLS — all in numpy (the tuple-list sort
        # this replaces was ~40% of training wall). Comparison key: a
        # symbol's bytes right-zero-padded to 8 and read big-endian
        # orders exactly like the bytes themselves, with the length as
        # tiebreak for prefix pairs ('ab' < 'ab\0'). byteswap() turns
        # the little-endian packed keys (first byte lowest) into that
        # big-endian form, the unused high bytes becoming the zero pad.
        sym_counts = np.bincount(codes[codes >= 0], minlength=table.lens.size)
        ex_lens = table.lens
        ex_le = np.zeros(ex_lens.size, dtype=np.uint64)
        starts = table.offsets[:-1]
        for i in range(8):
            m = ex_lens > i
            ex_le[m] |= (table.flat[starts[m] + i].astype(np.uint64)
                         << np.uint64(8 * i))
        ex_gains = sym_counts.astype(np.int64) * np.maximum(1, ex_lens - 1)
        r = rep[sel]
        all_pads = np.concatenate([ex_le.byteswap(), keys[r].byteswap()])
        all_lens = np.concatenate([ex_lens,
                                   klen[r].astype(np.int64)])
        all_gains = np.concatenate([ex_gains, gains[sel].astype(np.int64)])
        # dedup: a symbol can appear as both existing and candidate;
        # keeping its max-gain instance is identical to "first
        # occurrence wins" under the (-gain, bytes) order
        o = np.lexsort((-all_gains, all_lens, all_pads))
        p1, l1, g1 = all_pads[o], all_lens[o], all_gains[o]
        grp = np.r_[True, (p1[1:] != p1[:-1]) | (l1[1:] != l1[:-1])]
        p1, l1, g1 = p1[grp], l1[grp], g1[grp]
        o2 = np.lexsort((l1, p1, -g1))[:MAX_SYMBOLS]
        chosen = [int(p1[j]).to_bytes(8, "big")[:int(l1[j])] for j in o2]
        table = SymbolTable(chosen)
    return table


# Whole-pipeline segmentation: match+parse+emit run per piece so the
# working set (input + mlen + mcode int16 + parse snapshots + payload,
# ~6x the input bytes) stays cache-sized with every core busy. Measured
# with the 32-process barrier harness on 25 MB stripes: unsegmented
# collapses to 1.9 MB/s/core (aggregate BELOW the 8-process run);
# per-piece processing restores the small-input rates. Any
# segmentation decodes identically (BLOCK-aligned pieces).
_COMPRESS_SEG = 1 << 20  # 1 MiB, multiple of BLOCK (sweep: 1M 16.5 >
# 2M 15.6 > 4M 8.2 MB/s per core, 32 procs, 25 MB inputs)


def compress(data: np.ndarray, table: SymbolTable | None = None) -> tuple[bytes, bytes]:
    """-> (serialized table, payload). data is a uint8 array.

    Payload framing: u32-LE piece count, then per-piece u32-LE byte
    lengths, then the pieces. The frame lets decompress run per piece
    with the same cache-resident working set the encoder has — without
    it, decoding a 25 MB stripe with 32 busy cores measured NEGATIVE
    aggregate scaling (160 -> 97 MB/s from 8 to 32 workers).
    """
    data = np.ascontiguousarray(data, dtype=np.uint8)
    if table is None:
        table = train(data)
    if data.size == 0:
        return table.serialize(), b""
    pieces = []
    for s in range(0, data.size, _COMPRESS_SEG):
        pieces.append(_compress_piece(data[s:s + _COMPRESS_SEG], table))
    header = np.empty(1 + len(pieces), dtype="<u4")
    header[0] = len(pieces)
    header[1:] = [len(p) for p in pieces]
    return table.serialize(), header.tobytes() + b"".join(pieces)


def _compress_piece(data: np.ndarray, table: SymbolTable) -> bytes:
    lib = native.load()
    if lib is not None:
        return _compress_piece_c(data, table, lib)
    return _compress_piece_np(data, table)


def _compress_piece_c(data: np.ndarray, table: SymbolTable, lib) -> bytes:
    """Sequential greedy encode in C (fsst_kernel.c): same tables, same
    decodable output space as the numpy lockstep parse, ~20x faster.
    Payload bytes may differ from the numpy encoder (no block-edge
    guards -> slightly better ratio); any segmentation decodes the same.
    """
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(2 * data.size, dtype=np.uint8)
    n = lib.fsst_compress(
        native.ptr(data, ctypes.c_uint8), data.size,
        native.ptr(table.slot_key, ctypes.c_uint64),
        native.ptr(table.slot_combo, ctypes.c_uint16),
        native.ptr(table.pair_code, ctypes.c_int16),
        native.ptr(table.single_code, ctypes.c_int16),
        native.ptr(out, ctypes.c_uint8))
    return out[:n].tobytes()


def _compress_piece_np(data: np.ndarray, table: SymbolTable) -> bytes:
    p, codes, lens = _parse_tokens(data, table)
    esc = codes < 0
    out_sizes = np.where(esc, np.int32(2), np.int32(1))
    out_off = np.cumsum(out_sizes, dtype=np.int64).astype(np.int32)
    total = int(out_off[-1]) if out_off.size else 0
    out_off -= out_sizes
    out = np.empty(total, dtype=np.uint8)
    out[out_off] = np.where(esc, ESCAPE, codes).astype(np.uint8)
    out[out_off[esc] + 1] = data[p[esc]]
    return out.tobytes()


def decompress(table_buf: np.ndarray, payload: np.ndarray) -> np.ndarray:
    """Inverse of compress -> uint8 array (per piece, see compress)."""
    table = SymbolTable.deserialize(
        np.ascontiguousarray(table_buf, dtype=np.uint8))
    buf = np.ascontiguousarray(payload, dtype=np.uint8)
    if buf.size == 0:
        return np.zeros(0, dtype=np.uint8)
    n_pieces = int(buf[:4].view("<u4")[0])
    lens = buf[4:4 + 4 * n_pieces].view("<u4").astype(np.int64)
    pos = 4 + 4 * n_pieces
    outs = []
    for ln in lens.tolist():
        outs.append(_decompress_piece(buf[pos:pos + ln], table))
        pos += ln
    return outs[0] if len(outs) == 1 else np.concatenate(outs)


def _decompress_piece(c: np.ndarray, table: SymbolTable) -> np.ndarray:
    n = c.size
    if n == 0:
        return np.zeros(0, dtype=np.uint8)
    lib = native.load()
    if lib is not None:
        cc = np.ascontiguousarray(c)
        out = np.empty(8 * n + 8, dtype=np.uint8)
        written = lib.fsst_decompress(
            native.ptr(cc, ctypes.c_uint8), n,
            native.ptr(table.flat_padded, ctypes.c_uint8),
            native.ptr(table.offsets, ctypes.c_int64),
            native.ptr(table.lens, ctypes.c_int64), table.lens.size,
            native.ptr(out, ctypes.c_uint8))
        if written < 0:
            raise ValueError("corrupt FSST payload: code out of range")
        return out[:written]
    return _decompress_piece_np(c, table)


def _decompress_piece_np(c: np.ndarray, table: SymbolTable) -> np.ndarray:
    n = c.size
    if n == 0:
        return np.zeros(0, dtype=np.uint8)
    is_esc_byte = c == ESCAPE
    # classify 255-runs: within each maximal run, even offsets are escape
    # markers, odd offsets are consumed literals; an odd-length run's final
    # marker consumes the next non-255 byte. Fully vectorized via run ids.
    consumed = np.zeros(n, dtype=bool)
    markers = np.zeros(n, dtype=bool)
    esc_pos = np.flatnonzero(is_esc_byte)
    if esc_pos.size:
        new_run = np.ones(esc_pos.size, dtype=bool)
        new_run[1:] = np.diff(esc_pos) > 1
        run_idx = np.cumsum(new_run) - 1
        run_start = esc_pos[new_run][run_idx]
        marker_pos = esc_pos[((esc_pos - run_start) % 2) == 0]
        markers[marker_pos] = True
        lit = marker_pos + 1
        consumed[lit[lit < n]] = True
    token_mask = ~consumed
    tpos = np.flatnonzero(token_mask)
    tcodes = c[tpos]
    tesc = markers[tpos]
    # output lengths and source offsets in an extended flat table
    # (symbols first, then 256 single literal bytes for escapes)
    flat2 = np.concatenate([table.flat, np.arange(256, dtype=np.uint8)])
    lit_base = table.flat.size
    safe_codes = np.where(tesc, 0, tcodes).astype(np.int64)
    src_off = np.where(
        tesc,
        lit_base + c[np.minimum(tpos + 1, n - 1)].astype(np.int64),
        table.offsets[safe_codes],
    ).astype(np.int32)
    out_lens = np.where(tesc, 1, table.lens[safe_codes]).astype(np.int32)
    total = int(out_lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.uint8)
    # gather indices via scatter+cumsum instead of arange+2x repeat
    # (3 sequential passes; the repeats were the decode hot spot)
    out_off = np.cumsum(out_lens) - out_lens
    d = np.ones(total, dtype=np.int32)
    d[0] = src_off[0]
    if src_off.size > 1:
        d[out_off[1:]] = src_off[1:] - (src_off[:-1] + out_lens[:-1]) + 1
    idx = np.cumsum(d, dtype=np.int32)
    return flat2[idx]
