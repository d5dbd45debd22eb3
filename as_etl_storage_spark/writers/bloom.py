"""Split-block bloom filters for manifest-level point-lookup skipping.

Min/max bounds (the stats manifest, ``versioned.py``) prune range
predicates well but are useless for ``key = X`` on a high-cardinality
UNSORTED column: after a few ingest cycles every file's [min, max]
spans the whole key space and nothing skips — yet that equality probe
is the single most common selective predicate a 100 TB table serves.
Delta Lake answers it with per-file bloom-filter indexes; parquet
standardizes the filter format itself (the split-block bloom filter,
SBBF). This module implements that SBBF shape:

- the filter is an array of 32-byte BLOCKS (8 x uint32 words); an
  element maps to ONE block (cache-line locality — the reason parquet
  picked the format), and within the block each of the 8 words gets
  exactly one bit, chosen by multiplying the low 32 hash bits with 8
  fixed odd salts (parquet's constants) and taking the top 5 bits;
- block selection is the unbiased fixed-point scaling
  ``((h >> 32) * nblocks) >> 32`` (parquet's rule) — no modulo bias;
- sizing follows the standard bloom bound ``m = -n ln(p) / ln(2)^2``
  for ``n`` distinct values at false-positive rate ``p``.

Hashing is blake2b-8 over a TYPE-TAGGED canonical encoding (int/str/
bool/bytes; floats and temporals are excluded — their canonical forms
are unstable and an unstable hash turns false positives into FALSE
NEGATIVES, i.e. wrong answers). blake2b is a standardized, stable
algorithm: a filter built today probes identically forever, across
Python and library versions — the property the whole scheme rests on.
The type tag is stored beside each filter so a probe with a literal of
a DIFFERENT canonical type (e.g. ``intcol = true``, which Spark casts)
degrades to "cannot skip" instead of skipping wrongly.

The build path is numpy-vectorized over hashed batches
(``np.bitwise_or.at`` handles duplicate block indices); per-value
hashing is the bottleneck (~1-2M values/s/core), which is why the
caller fans the per-file builds out as a Spark job at high file counts
(see VersionedTable._build_filters).

False positives are the contract: ``might_contain`` returning True for
an absent value only costs a wasted scan of one file. False negatives
are impossible by construction for supported types.

Reference scope: the reference engine has no bloom indexes; this is
part of the versioned-table extension surface (Delta bloom-filter
index parity).
"""

from __future__ import annotations

import hashlib
import math
import struct

import numpy as np

#: parquet's eight SBBF salt constants (format spec, BlockSplitBloomFilter)
_SALT = np.array(
    [
        0x47B6137B,
        0x44974D91,
        0x8824AD5B,
        0xA2B7289D,
        0x705495C7,
        0x2DF1424B,
        0x9EFC4947,
        0x5C6BFB31,
    ],
    dtype=np.uint32,
)

_MAGIC = b"SBBF1"

#: canonical-type tags: a filter remembers what it indexed; a probe
#: with a literal of another tag cannot skip (see module docstring)
TAG_INT = "i"
TAG_STR = "s"
TAG_BOOL = "b"
TAG_BYTES = "y"


def canon_tag(value: object) -> str | None:
    """The canonical-type tag for ``value``, or None for types this
    index does not support (floats, temporals, None, ...)."""
    if isinstance(value, bool) or isinstance(value, np.bool_):
        return TAG_BOOL
    if isinstance(value, (int, np.integer)):
        return TAG_INT
    if isinstance(value, str):
        return TAG_STR
    if isinstance(value, (bytes, bytearray)):
        return TAG_BYTES
    return None


def _canon_bytes(value: object, tag: str) -> bytes:
    if tag == TAG_BOOL:
        return b"b1" if value else b"b0"
    if tag == TAG_INT:
        return b"i" + str(int(value)).encode()
    if tag == TAG_STR:
        return b"s" + str(value).encode("utf-8")
    return b"y" + bytes(value)


def hash_one(value: object) -> tuple[int, str] | None:
    """(64-bit hash, type tag) for one literal, or None when the type
    is unsupported (caller must treat that as 'cannot skip')."""
    tag = canon_tag(value)
    if tag is None:
        return None
    digest = hashlib.blake2b(
        _canon_bytes(value, tag), digest_size=8
    ).digest()
    return struct.unpack("<Q", digest)[0], tag


def hash_values(values: list) -> tuple[np.ndarray, str | None]:
    """Hash a column batch: (uint64 array over the supported non-null
    values, the column's type tag). Tag is None when the column holds
    no supported value (no filter is built). A column is uniformly
    typed (parquet), so the first supported value fixes the tag; any
    value of a DIFFERENT tag poisons the column (returns tag None)
    rather than building a filter that would half-index it."""
    out: list[int] = []
    tag: str | None = None
    for v in values:
        if v is None:
            continue
        t = canon_tag(v)
        if t is None:
            continue
        if tag is None:
            tag = t
        elif t != tag:
            return np.empty(0, dtype=np.uint64), None
        digest = hashlib.blake2b(
            _canon_bytes(v, t), digest_size=8
        ).digest()
        out.append(struct.unpack("<Q", digest)[0])
    return np.array(out, dtype=np.uint64), tag


class SplitBlockBloomFilter:
    """Parquet-shape SBBF over 64-bit hashes. ``words`` is an
    (nblocks, 8) uint32 array."""

    def __init__(self, nblocks: int):
        if nblocks < 1:
            raise ValueError(f"nblocks must be >= 1, got {nblocks}")
        self.nblocks = int(nblocks)
        self.words = np.zeros((self.nblocks, 8), dtype=np.uint32)

    @classmethod
    def sized_for(cls, ndv: int, fpp: float) -> "SplitBlockBloomFilter":
        """Standard bloom sizing for ``ndv`` distinct values at target
        false-positive rate ``fpp``, rounded up to whole 256-bit
        blocks; clamped to [1, 2^21] blocks (64 MiB) so a pathological
        ndv can never produce an unbounded blob."""
        if not (0.0 < fpp < 1.0):
            raise ValueError(f"fpp must be in (0, 1), got {fpp}")
        bits = -max(1, ndv) * math.log(fpp) / (math.log(2.0) ** 2)
        nblocks = max(1, math.ceil(bits / 256.0))
        return cls(min(nblocks, 1 << 21))

    def _blocks(self, hashes: np.ndarray) -> np.ndarray:
        # parquet's unbiased block pick: ((h >> 32) * n) >> 32
        return (
            (hashes >> np.uint64(32)) * np.uint64(self.nblocks)
        ) >> np.uint64(32)

    def add_hashes(self, hashes: np.ndarray) -> None:
        if hashes.size == 0:
            return
        h = hashes.astype(np.uint64, copy=False)
        blocks = self._blocks(h).astype(np.int64)
        key = (h & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        for i in range(8):
            # uint32 multiply wraps mod 2^32 (the spec's arithmetic);
            # top 5 bits pick one bit in word i
            bits = (key * _SALT[i]) >> np.uint32(27)
            vals = (np.uint32(1) << bits).astype(np.uint32)
            # bitwise_or.at: duplicate block indices accumulate (plain
            # fancy-index |= would silently drop duplicates)
            np.bitwise_or.at(self.words[:, i], blocks, vals)

    def might_contain_hash(self, h: int) -> bool:
        hu = np.uint64(h)
        block = int(self._blocks(np.array([hu], dtype=np.uint64))[0])
        key = np.uint32(int(hu) & 0xFFFFFFFF)
        row = self.words[block]
        for i in range(8):
            bit = np.uint32(1) << np.uint32(
                (int(key) * int(_SALT[i])) % (1 << 32) >> 27
            )
            if not (row[i] & bit):
                return False
        return True

    def to_bytes(self) -> bytes:
        return (
            _MAGIC
            + struct.pack("<I", self.nblocks)
            + self.words.astype("<u4").tobytes()
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "SplitBlockBloomFilter":
        if blob[: len(_MAGIC)] != _MAGIC:
            raise ValueError("not an SBBF blob (bad magic)")
        (nblocks,) = struct.unpack_from("<I", blob, len(_MAGIC))
        flt = cls(nblocks)
        flt.words = (
            np.frombuffer(
                blob, dtype="<u4", offset=len(_MAGIC) + 4
            )
            .reshape((nblocks, 8))
            .astype(np.uint32)
        )
        return flt


def build_column_filter(
    values: list, fpp: float
) -> tuple[bytes, str, int] | None:
    """(blob, type tag, ndv) for one file's column values, or None when
    the column holds no supported value. Sized to the DISTINCT count
    (hash-level dedup), not the row count — repeated keys cost nothing."""
    hashes, tag = hash_values(values)
    if tag is None or hashes.size == 0:
        return None
    uniq = np.unique(hashes)
    flt = SplitBlockBloomFilter.sized_for(int(uniq.size), fpp)
    flt.add_hashes(uniq)
    return flt.to_bytes(), tag, int(uniq.size)
