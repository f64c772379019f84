"""FSST: Fast Static Symbol Table compression for string/html streams.

ABSENT in the reference (SURVEY.md §2.1 C19) — implemented from the FSST
paper (Boncz, Neumann, Leis: "FSST: Fast Random Access String
Compression", VLDB 2020): a static table of ≤255 symbols, each 1-8
bytes; each output byte is a symbol code, with code 255 escaping one
literal input byte.

Implementation notes (numpy-vectorized, no per-byte Python):

- The matcher computes, for every input position, the longest matching
  symbol via 8-byte little-endian windows (8 shift-or passes build a
  uint64 per position; per length L, a sorted-key searchsorted lookup).
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

import numpy as np

ESCAPE = 255
MAX_SYMBOLS = 255
MAX_LEN = 8
BLOCK = 4096
SAMPLE_BYTES = 1 << 16
GENERATIONS = 4

_MASKS = np.array(
    [0] + [(1 << (8 * k)) - 1 for k in range(1, 8)] + [0xFFFFFFFFFFFFFFFF],
    dtype=np.uint64,
)


def _windows_u64(data: np.ndarray) -> np.ndarray:
    """Little-endian 8-byte window starting at each position (zero padded)."""
    n = data.size
    padded = np.zeros(n + 8, dtype=np.uint8)
    padded[:n] = data
    u = np.zeros(n, dtype=np.uint64)
    for k in range(8):
        u |= padded[k: k + n].astype(np.uint64) << np.uint64(8 * k)
    return u


class SymbolTable:
    """Static symbol table: codes 0..n_syms-1, code 255 = escape."""

    __slots__ = ("lens", "flat", "offsets", "keys_by_len", "codes_by_len",
                 "single_code")

    def __init__(self, symbols: list[bytes]):
        assert len(symbols) <= MAX_SYMBOLS
        self.lens = np.array([len(s) for s in symbols], dtype=np.int64)
        self.offsets = np.zeros(len(symbols) + 1, dtype=np.int64)
        np.cumsum(self.lens, out=self.offsets[1:])
        self.flat = np.frombuffer(b"".join(symbols), dtype=np.uint8)
        # per length: sorted window keys + matching codes
        self.keys_by_len: dict[int, np.ndarray] = {}
        self.codes_by_len: dict[int, np.ndarray] = {}
        self.single_code = np.full(256, -1, dtype=np.int64)
        by_len: dict[int, list[tuple[int, int]]] = {}
        for code, s in enumerate(symbols):
            key = int.from_bytes(s, "little")
            if len(s) == 1:
                self.single_code[s[0]] = code
            else:
                by_len.setdefault(len(s), []).append((key, code))
        for length, pairs in by_len.items():
            pairs.sort()
            self.keys_by_len[length] = np.array([k for k, _ in pairs], dtype=np.uint64)
            self.codes_by_len[length] = np.array([c for _, c in pairs], dtype=np.int64)

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


def _match(data: np.ndarray, table: SymbolTable) -> tuple[np.ndarray, np.ndarray]:
    """Longest-match per position -> (mlen, mcode); mcode -1 means escape."""
    n = data.size
    u = _windows_u64(data)
    mlen = np.zeros(n, dtype=np.int64)
    mcode = np.full(n, -1, dtype=np.int64)
    idx_all = np.arange(n, dtype=np.int64)
    for length in sorted(table.keys_by_len, reverse=True):
        keys = table.keys_by_len[length]
        k = u & _MASKS[length]
        pos = np.searchsorted(keys, k)
        pos_c = np.minimum(pos, keys.size - 1)
        hit = (keys[pos_c] == k) & (pos < keys.size)
        # in-bounds, not already matched longer, not crossing a block edge
        hit &= (idx_all + length <= n)
        hit &= (idx_all % BLOCK) + length <= BLOCK
        hit &= mlen == 0
        mlen[hit] = length
        mcode[hit] = table.codes_by_len[length][pos_c[hit]]
    rest = mlen == 0
    mlen[rest] = 1
    mcode[rest] = table.single_code[data[rest]]  # -1 -> escape
    return mlen, mcode


def _parse_tokens(data: np.ndarray, table: SymbolTable):
    """Lockstep greedy parse -> (token positions, codes, lengths) in order."""
    n = data.size
    mlen, mcode = _match(data, table)
    starts = np.arange(0, n, BLOCK, dtype=np.int64)
    ends = np.minimum(starts + BLOCK, n)
    pos = starts.copy()
    block_ids = np.arange(starts.size, dtype=np.int64)
    tok_pos: list[np.ndarray] = []
    tok_block: list[np.ndarray] = []
    step = 0
    tok_step: list[np.ndarray] = []
    while True:
        active = pos < ends
        if not active.any():
            break
        p = pos[active]
        tok_pos.append(p)
        tok_block.append(block_ids[active])
        tok_step.append(np.full(p.size, step, dtype=np.int64))
        pos[active] = p + mlen[p]
        step += 1
    if not tok_pos:
        empty = np.zeros(0, dtype=np.int64)
        return empty, empty, empty
    ap = np.concatenate(tok_pos)
    ab = np.concatenate(tok_block)
    asq = np.concatenate(tok_step)
    order = np.lexsort((asq, ab))
    p = ap[order]
    return p, mcode[p], mlen[p]


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
    u = _windows_u64(sample)
    for _ in range(GENERATIONS):
        p, codes, lens = _parse_tokens(sample, table)
        if p.size < 2:
            break
        # adjacent-token concatenations ≤ 8 bytes, within the same block
        comb_len = lens[:-1] + lens[1:]
        ok = (comb_len <= MAX_LEN) & (p[:-1] // BLOCK == p[1:] // BLOCK)
        keys = u[p[:-1][ok]] & _MASKS[comb_len[ok]]
        klen = comb_len[ok]
        # count (key, len) pairs
        cand_counts: dict[tuple[int, int], int] = {}
        uq, cnt = np.unique(
            np.stack([keys, klen.astype(np.uint64)]), axis=1, return_counts=True,
        )
        for i in range(uq.shape[1]):
            cand_counts[(int(uq[0, i]), int(uq[1, i]))] = int(cnt[i])
        # score existing symbols by current usage
        sym_counts = np.bincount(codes[codes >= 0], minlength=table.lens.size)
        scored: list[tuple[int, bytes]] = []
        for code in range(table.lens.size):
            s = table.flat[table.offsets[code]: table.offsets[code + 1]].tobytes()
            gain = int(sym_counts[code]) * max(1, len(s) - 1)
            scored.append((gain, s))
        for (key, ln), c in cand_counts.items():
            s = int(key).to_bytes(8, "little")[:ln]
            scored.append((c * (ln - 1), s))
        # escape pressure: always keep bytes that appear, as singles
        scored.sort(key=lambda t: (-t[0], t[1]))
        seen: set[bytes] = set()
        chosen: list[bytes] = []
        for _, s in scored:
            if s not in seen:
                seen.add(s)
                chosen.append(s)
            if len(chosen) == MAX_SYMBOLS:
                break
        table = SymbolTable(chosen)
    return table


def compress(data: np.ndarray, table: SymbolTable | None = None) -> tuple[bytes, bytes]:
    """-> (serialized table, payload). data is a uint8 array."""
    data = np.ascontiguousarray(data, dtype=np.uint8)
    if table is None:
        table = train(data)
    if data.size == 0:
        return table.serialize(), b""
    p, codes, lens = _parse_tokens(data, table)
    esc = codes < 0
    out_sizes = np.where(esc, 2, 1).astype(np.int64)
    out_off = np.cumsum(out_sizes) - out_sizes
    out = np.empty(int(out_sizes.sum()), dtype=np.uint8)
    out[out_off] = np.where(esc, ESCAPE, codes).astype(np.uint8)
    out[out_off[esc] + 1] = data[p[esc]]
    return table.serialize(), out.tobytes()


def decompress(table_buf: np.ndarray, payload: np.ndarray) -> np.ndarray:
    """Inverse of compress -> uint8 array."""
    table = SymbolTable.deserialize(np.ascontiguousarray(table_buf, dtype=np.uint8))
    c = np.ascontiguousarray(payload, dtype=np.uint8)
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
    src_off = np.where(
        tesc,
        lit_base + c[np.minimum(tpos + 1, n - 1)].astype(np.int64),
        table.offsets[np.where(tesc, 0, tcodes).astype(np.int64)],
    )
    out_lens = np.where(tesc, 1, table.lens[np.where(tesc, 0, tcodes).astype(np.int64)])
    total = int(out_lens.sum())
    out_off = np.cumsum(out_lens) - out_lens
    idx = (np.arange(total, dtype=np.int64)
           - np.repeat(out_off, out_lens)
           + np.repeat(src_off, out_lens))
    return flat2[idx]
