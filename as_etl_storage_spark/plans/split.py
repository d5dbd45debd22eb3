"""Range-split computation — parity with the reference's "planner".

The reference turns one table scan into N parallel scans by splitting the
domain of a split key into N near-equal ranges, each scanned with a predicate
``key >= lo AND key < hi`` (last range closed ``<=``), AND-ed with the user
``where`` (reference: database/dbms/reader/job.go:122-187).

Three key domains (split.go:114-119):
  * bigint — arbitrary-precision integers (split.go:224-242); Python ints are
    natively unbounded so parity is exact.
  * string — ASCII-only strings encoded to an integer in radix 128
    (split.go:244-287), enabling lexicographic range split on string keys.
  * time   — timestamps as integer multiples of an accuracy unit
    (day/min/s/ms/us/ns; split.go:289-359).

The core ``do_split`` divides ``[left, right]`` into ``num`` steps
distributing the remainder one unit each to the first ``gap % num`` ranges
(split.go:361-391) — deterministic pure arithmetic, ported as a test oracle.

At Spark scale these ranges serve two purposes:
  * JDBC sources: a ``predicates=[...]`` list for ``spark.read.jdbc`` —
    required for string keys, which Spark's ``partitionColumn`` cannot split.
  * native sources: ``repartitionByRange`` already balances, so the ranges
    are only materialized when the user asks for explicit task predicates.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Protocol

#: accuracy -> unit in nanoseconds (split.go:289-359; layout prefix lengths
#: 10/16/19/23/26/29 select day/min/s/ms/us/ns)
_TIME_UNITS_NS = {
    "day": 86_400_000_000_000,
    "min": 60_000_000_000,
    "s": 1_000_000_000,
    "ms": 1_000_000,
    "us": 1_000,
    "ns": 1,
}

_ACCURACY_FMT = {
    "day": "%Y-%m-%d",
    "min": "%Y-%m-%d %H:%M",
    "s": "%Y-%m-%d %H:%M:%S",
    "ms": "%Y-%m-%d %H:%M:%S.%f",
    "us": "%Y-%m-%d %H:%M:%S.%f",
    "ns": "%Y-%m-%d %H:%M:%S.%f",
}


class SplitError(ValueError):
    pass


def do_split(left: int, right: int, num: int) -> list[tuple[int, int]]:
    """Divide integer interval ``[left, right]`` into ``num`` contiguous
    ranges with near-equal width, remainder distributed one unit each to the
    leading ranges — parity with doSplit (split.go:361-391).

    Returns boundary pairs ``(lo, hi)``; range i scans ``lo <= k < hi``
    except the last which scans ``lo <= k <= hi``.
    """
    if num <= 0:
        raise SplitError(f"split number must be positive, got {num}")
    if left > right:
        raise SplitError(f"invalid range: left {left} > right {right}")
    gap = right - left
    if gap == 0 or num == 1:
        return [(left, right)]
    num = min(num, gap)  # no empty ranges
    step, rem = divmod(gap, num)
    out: list[tuple[int, int]] = []
    lo = left
    for i in range(num):
        hi = lo + step + (1 if i < rem else 0)
        out.append((lo, hi))
        lo = hi
    assert out[-1][1] == right
    return out


class RangeConvertor(Protocol):
    """Domain value <-> big integer (split.go:203-222 convertor SPI)."""

    def to_int(self, value) -> int: ...
    def from_int(self, value: int): ...
    def literal(self, value) -> str: ...


class BigIntConvertor:
    """Integer keys (split.go:224-242). Python int is unbounded => exact
    parity with the reference's math/big.Int."""

    def to_int(self, value) -> int:
        return int(value)

    def from_int(self, value: int) -> int:
        return value

    def literal(self, value) -> str:
        return str(int(value))


class StringConvertor:
    """ASCII string keys <-> radix-128 integers (split.go:244-287).

    Strings are interpreted as base-128 numerals (most significant character
    first). Non-ASCII input is an error, matching the reference. Note the
    reference caveat: comparison is numeric on the encoding, which orders
    longer strings after shorter ones regardless of lexicographic order —
    boundaries are still a valid partitioning of the key domain because
    decode(encode(s)) == s and the scan predicates use string comparison
    against boundary *strings* of the same alphabet.
    """

    RADIX = 128

    def to_int(self, value: str) -> int:
        acc = 0
        for ch in value:
            code = ord(ch)
            if code >= self.RADIX:
                raise SplitError(f"non-ASCII character {ch!r} in string split key")
            acc = acc * self.RADIX + code
        return acc

    def from_int(self, value: int) -> str:
        if value < 0:
            raise SplitError("negative radix-128 value")
        if value == 0:
            return ""
        digits: list[str] = []
        while value > 0:
            value, code = divmod(value, self.RADIX)
            digits.append(chr(code))
        return "".join(reversed(digits))

    def literal(self, value: str) -> str:
        escaped = str(value).replace("'", "''")
        return f"'{escaped}'"


class TimeConvertor:
    """Time keys <-> integer multiples of an accuracy unit
    (split.go:289-359). Accuracy in {day,min,s,ms,us,ns}; values are UTC."""

    def __init__(self, accuracy: str = "day"):
        if accuracy not in _TIME_UNITS_NS:
            raise SplitError(
                f"invalid timeAccuracy {accuracy!r}; want one of "
                f"{sorted(_TIME_UNITS_NS)}"
            )
        self.accuracy = accuracy
        self.unit_ns = _TIME_UNITS_NS[accuracy]

    def to_int(self, value: datetime) -> int:
        if value.tzinfo is None:
            value = value.replace(tzinfo=timezone.utc)
        # integer arithmetic only — float timestamps lose sub-ms precision
        epoch_s = int(value.replace(microsecond=0).timestamp())
        epoch_ns = epoch_s * 1_000_000_000 + value.microsecond * 1000
        return epoch_ns // self.unit_ns

    def from_int(self, value: int) -> datetime:
        epoch_ns = value * self.unit_ns
        secs, ns = divmod(epoch_ns, 1_000_000_000)
        return datetime.fromtimestamp(secs, tz=timezone.utc).replace(
            microsecond=ns // 1000
        )

    def literal(self, value: datetime) -> str:
        fmt = _ACCURACY_FMT[self.accuracy]
        s = value.strftime(fmt)
        return f"TIMESTAMP '{s}'"


def convertor_for(range_type: str, accuracy: str = "day") -> RangeConvertor:
    """Pick a convertor for split.range.type, validating the combination
    (type checks: split.go:63-111 / S15)."""
    if range_type == "bigint":
        return BigIntConvertor()
    if range_type == "string":
        return StringConvertor()
    if range_type == "time":
        return TimeConvertor(accuracy)
    raise SplitError(f"unsupported split range type {range_type!r}")


@dataclass(frozen=True)
class SplitRangeResult:
    """One computed range: domain-typed boundaries + SQL predicate."""

    lo: object
    hi: object
    closed_right: bool
    predicate: str


def split_ranges(
    min_value, max_value, num: int, convertor: RangeConvertor
) -> list[tuple[object, object, bool]]:
    """Split ``[min_value, max_value]`` of any supported domain into at most
    ``num`` ranges; returns (lo, hi, closed_right) domain-typed triples."""
    lo_i = convertor.to_int(min_value)
    hi_i = convertor.to_int(max_value)
    pairs = do_split(lo_i, hi_i, num)
    out = []
    for idx, (a, b) in enumerate(pairs):
        out.append(
            (convertor.from_int(a), convertor.from_int(b), idx == len(pairs) - 1)
        )
    return out


def range_predicates(
    key: str, min_value, max_value, num: int, convertor: RangeConvertor
) -> list[str]:
    """Render the per-task predicates the reference injects into each scan
    (templates at reader/job.go:184-187 via split.go:184-196):
    ``key >= lo AND key < hi``; last range ``<= hi``."""
    preds = []
    for lo, hi, closed in split_ranges(min_value, max_value, num, convertor):
        op = "<=" if closed else "<"
        preds.append(
            f"{key} >= {convertor.literal(lo)} AND {key} {op} {convertor.literal(hi)}"
        )
    return preds
