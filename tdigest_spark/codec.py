"""Simple64 / Simple32 word-packed integer codecs (reference parity: C1).

Behavioral match for the reference's test-support codec
(/root/reference/test/SimpleCompression.jl:22-1176, exercised by
test/histogram.jl:61-76): a greedy variable-width packer that smashes
several small unsigned integers into each 64-bit (resp. 32-bit) output
word.  The low 4 bits of every word are a selector code; the remaining 60
(resp. 28) bits hold equal-width values:

    Simple64 widths (code 1..14): 1,2,3,4,5,6,7,8,10,12,15,20,30,60 bits
    Simple32 widths (code 1..9):  1,2,3,4,5,7,9,14,28 bits

Encoding is the reference's greedy rule: buffer incoming values with their
minimal width codes; whenever the buffered payload could fill a word even
at the worst width seen so far, find the smallest width whose full
word-count of upcoming values all fit, and emit that word.  `flush`
zero-pads the tail, so decompression yields >= the original count — always
compare/slice the prefix (exactly what the reference histogram test does).

Not a port: the reference unrolls one Julia branch per (code, slot) pair
(~1000 lines); here packing/unpacking is a single shift loop driven by the
width table.  Output words are bit-identical to the reference layout
(value j of a word sits at bit offset 4 + j*width).

Role in this library: at rest the engine stores sketch state in
parquet+zstd (SURVEY §2.1), which subsumes generic entropy coding; this
codec exists for reference parity and for wire-format experiments where a
self-contained, schema-free packed vector is handy (e.g. LogHistogram
count vectors, which are mostly small integers — see
tests/test_codec.py::test_histogram_counts_compress).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np

_SIZES_64 = (1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 15, 20, 30, 60)
_SIZES_32 = (1, 2, 3, 4, 5, 7, 9, 14, 28)


class _SimpleCodec:
    """Greedy word-packing codec over a width table (base for 64/32)."""

    SIZES: tuple[int, ...] = ()
    TOTAL_BITS: int = 0
    WORD_DTYPE = np.uint64

    def __init__(self) -> None:
        self._values: list[int] = []
        self._min_code: list[int] = []
        self._max_code = 0

    # ---------------------------------------------------------------- encode

    def _bit_code(self, v: int) -> int:
        """1-based index of the smallest width that holds v
        (SimpleCompression.jl:143-151)."""
        if v < 0:
            raise ValueError(f"negative value {v} cannot be encoded")
        bits = int(v).bit_length()
        for i, w in enumerate(self.SIZES):
            if w >= bits:
                return i + 1
        raise ValueError(f"value {v} has more than {self.SIZES[-1]} bits")

    def reset(self) -> None:
        self._values.clear()
        self._min_code.clear()
        self._max_code = 0

    def add(self, v: int, out: list[int]) -> None:
        """Buffer one value; append any completed words to `out`
        (greedy emission rule of SimpleCompression.jl:185-210).

        NOTE: _max_code is deliberately NEVER reset after a word is
        emitted — the reference resets maxCode only in empty!
        (SimpleCompression.jl:158-159), so after one wide value the
        greedy trigger fires on every subsequent add and small values
        get one word each until reset().  That degrades compression on
        mixed-width input, but it is the reference's own wire behavior
        and this port keeps bit-parity over fixing it (pinned by
        tests/test_codec.py::test_wide_value_poisons_packing_like_reference).
        The practical use (log-histogram counts of similar magnitude)
        never hits the regime."""
        code = self._bit_code(v)
        self._values.append(int(v))
        self._min_code.append(code)
        if code > self._max_code:
            self._max_code = code

        first_code = self._min_code[0]
        while self.SIZES[self._max_code - 1] * len(self._values) >= self.TOTAL_BITS:
            bits = self.SIZES[first_code - 1]
            n = self.TOTAL_BITS // bits
            if n <= len(self._values) and max(self._min_code[:n]) <= first_code:
                out.append(self._encode_one(first_code))
                break
            first_code += 1

    def _encode_one(self, code: int) -> int:
        bits = self.SIZES[code - 1]
        n = self.TOTAL_BITS // bits
        word = code
        shift = 4
        for _ in range(n):
            word |= self._values.pop(0) << shift
            self._min_code.pop(0)
            shift += bits
        return word

    def flush(self, out: list[int]) -> None:
        """Emit every buffered value, zero-padding the final word(s).

        Intent correction: the reference flush (SimpleCompression.jl:802-806)
        pads by looping add(0) until the buffer drains, which livelocks when
        the greedy emission pops fewer values than its own trigger threshold
        (e.g. Simple32 with 3-bit data: emission fires at 10 buffered, pops
        9, leaves 1 — forever).  Here the tail is emitted directly: pick the
        smallest width covering the leading values, pad that one word with
        zeros, emit, repeat.  Decoded output still satisfies the reference
        contract (>= original length, zero tail)."""
        while self._values:
            for code in range(1, len(self.SIZES) + 1):
                bits = self.SIZES[code - 1]
                n = self.TOTAL_BITS // bits
                k = min(n, len(self._values))
                if max(self._min_code[:k]) <= code:
                    while len(self._values) < n:
                        self._values.append(0)
                        self._min_code.append(1)
                    out.append(self._encode_one(code))
                    break

    # ---------------------------------------------------------------- decode

    def decode_word(self, word: int, out: list[int]) -> None:
        code = int(word) & 0xF
        if not 1 <= code <= len(self.SIZES):
            raise ValueError(f"invalid selector code {code}")
        bits = self.SIZES[code - 1]
        n = self.TOTAL_BITS // bits
        mask = (1 << bits) - 1
        v = int(word) >> 4
        for _ in range(n):
            out.append(v & mask)
            v >>= bits

    # ------------------------------------------------------------- vector API

    def compress(self, values: Iterable[int]) -> np.ndarray:
        """Pack a sequence of unsigned ints into words
        (compress! of SimpleCompression.jl:1136-1160)."""
        self.reset()
        out: list[int] = []
        for v in np.asarray(list(values)).tolist():
            self.add(int(v), out)
        self.flush(out)
        return np.array(out, dtype=self.WORD_DTYPE)

    def decompress(self, words: Iterable[int], n: int | None = None) -> np.ndarray:
        """Unpack words; yields >= the original count (flush zero-padding) —
        pass `n` to slice back to the original length
        (uncompress! of SimpleCompression.jl:1162-1176)."""
        out: list[int] = []
        for w in np.asarray(list(words)).tolist():
            self.decode_word(int(w), out)
        arr = np.array(out, dtype=np.uint64)
        return arr[:n] if n is not None else arr


class Simple64(_SimpleCodec):
    SIZES = _SIZES_64
    TOTAL_BITS = 60
    WORD_DTYPE = np.uint64


class Simple32(_SimpleCodec):
    SIZES = _SIZES_32
    TOTAL_BITS = 28
    WORD_DTYPE = np.uint32
