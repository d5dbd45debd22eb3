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
from datetime import date, datetime, timezone
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
    first). Non-ASCII input is an error, matching the reference.

    The naive variable-length encoding is NOT order-preserving across mixed
    key lengths ('b' -> 98 but 'aa' -> 12513, yet 'aa' < 'b'
    lexicographically), so integer-order boundaries would overlap when
    evaluated as lexicographic scan predicates — the reference ships that
    flaw; we do not. Fix: before splitting, :meth:`fit` pins a fixed width
    W = max(len(min), len(max)) and values are right-padded with NUL
    (code 0, below every permitted key character) to W digits. Fixed-width
    base-128 numeric order == bytewise lexicographic order, and the padding
    digit sorts below all key characters, so ``encode`` is strictly
    monotone w.r.t. lexicographic order on NUL-free keys. ``from_int``
    decodes a boundary to the smallest NUL-free string b with
    ``encode(b) >= v`` (exact when only trailing padding remains; otherwise
    prefix + chr(1)), so boundary strings come out lex-sorted and the
    rendered predicates tile the key domain with no overlap or gap — keys
    longer than W simply fall lexicographically into whichever range
    contains them. Keys containing NUL are rejected (they would collide
    with the padding digit).
    """

    RADIX = 128

    def __init__(self, width: int = 0, backslash_escapes: bool = True):
        #: fixed digit width; 0 = unfitted (plain variable-length codec,
        #: round-trip only — never use for range boundaries)
        self.width = width
        #: whether the TARGET SQL parser treats backslash as an escape in
        #: string literals. True for Spark SQL (default parser) and MySQL
        #: — a key like ``C:\alpha`` must render as ``'C:\\alpha'`` or the
        #: predicate silently matches the wrong string and drops rows.
        #: False for standard-SQL engines (Derby, Oracle) where backslash
        #: is an ordinary character.
        self.backslash_escapes = backslash_escapes

    def fit(self, min_value: str, max_value: str) -> None:
        """Pin the encoding width from the split domain's bounds."""
        self.width = max(len(str(min_value)), len(str(max_value)))

    def to_int(self, value: str) -> int:
        acc = 0
        for ch in value:
            code = ord(ch)
            if code >= self.RADIX:
                raise SplitError(f"non-ASCII character {ch!r} in string split key")
            if code == 0 and self.width:
                raise SplitError("NUL character in string split key")
            acc = acc * self.RADIX + code
        if self.width:
            if len(value) > self.width:
                raise SplitError(
                    f"string split key {value!r} longer than fitted width {self.width}"
                )
            acc *= self.RADIX ** (self.width - len(value))
        return acc

    def from_int(self, value: int) -> str:
        if value < 0:
            raise SplitError("negative radix-128 value")
        digits: list[int] = []
        v = value
        while v > 0:
            v, code = divmod(v, self.RADIX)
            digits.append(code)
        digits.reverse()
        if not self.width:
            return "".join(chr(d) for d in digits)
        if len(digits) > self.width:
            raise SplitError("radix-128 value exceeds fitted width")
        digits = [0] * (self.width - len(digits)) + digits
        # lexicographic ceiling: smallest NUL-free string b with
        # encode(b) >= value
        while digits and digits[-1] == 0:
            digits.pop()  # trailing padding — exact preimage
        if 0 in digits:
            digits = digits[: digits.index(0)] + [1]
        return "".join(chr(d) for d in digits)

    def literal(self, value: str) -> str:
        escaped = str(value)
        if self.backslash_escapes:
            escaped = escaped.replace("\\", "\\\\")
        escaped = escaped.replace("'", "''")
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

    def to_int(self, value) -> int:
        if isinstance(value, date) and not isinstance(value, datetime):
            # DateType split keys (types.TYPE_TIME includes DateType):
            # promote to midnight UTC — a bare date has no .tzinfo
            value = datetime(value.year, value.month, value.day)
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

    @staticmethod
    def _as_utc_wall(value: datetime) -> datetime:
        """Timezone-aware bounds (e.g. an S13 ISO string with an offset)
        must be converted to UTC BEFORE rendering: strftime prints the
        wall time and drops tzinfo, and the rendered literal is then
        interpreted as session-UTC — shifting the bound by the offset
        and silently excluding the rows in the gap. Naive values pass
        through (already session-UTC by contract)."""
        if value.tzinfo is not None:
            return value.astimezone(timezone.utc)
        return value

    def literal(self, value: datetime) -> str:
        fmt = _ACCURACY_FMT[self.accuracy]
        s = self._as_utc_wall(value).strftime(fmt)
        return f"TIMESTAMP '{s}'"

    def literal_exact(self, value) -> str:
        """Full-precision literal, independent of the accuracy format —
        used for the final closed upper bound, where rendering the
        accuracy-FLOORED boundary would silently exclude every row
        between floor(max) and max (e.g. a 13:45 event under day
        accuracy)."""
        if isinstance(value, date) and not isinstance(value, datetime):
            value = datetime(value.year, value.month, value.day)
        value = self._as_utc_wall(value)
        return f"TIMESTAMP '{value.strftime('%Y-%m-%d %H:%M:%S.%f')}'"


#: Go reference-layout tokens → strptime directives, longest first so
#: "2006" is consumed before its "06"/"01"-shaped substrings
_GO_LAYOUT_TOKENS = [
    ("2006", "%Y"),
    (".000000", ".%f"),
    (".000", ".%f"),
    ("15", "%H"),
    ("01", "%m"),
    ("02", "%d"),
    ("04", "%M"),
    ("05", "%S"),
]


def parse_time_bound(value: str, layout: str = "") -> datetime:
    """Parse a declared S13 time bound: ISO-8601 by default, or the job's
    Go reference layout when ``split.range.layout`` is declared
    (split.go:47-61 — the reference parses bounds with the job's layout,
    e.g. ``2006/01/02`` for ``2026/03/01``)."""
    if not layout:
        try:
            return datetime.fromisoformat(value)
        except ValueError as exc:
            raise SplitError(
                f"time bound {value!r} is not ISO-8601; declare "
                f"split.range.layout for other formats"
            ) from exc
    fmt = layout
    for go, py in _GO_LAYOUT_TOKENS:
        fmt = fmt.replace(go, py)
    try:
        return datetime.strptime(value, fmt)
    except ValueError as exc:
        raise SplitError(
            f"time bound {value!r} does not match layout {layout!r} "
            f"(strptime {fmt!r})"
        ) from exc


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
    fit = getattr(convertor, "fit", None)
    if fit is not None:
        fit(min_value, max_value)
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
    ``key >= lo AND key < hi``; last range ``<= hi``.

    The final CLOSED bound renders the ORIGINAL ``max_value`` at full
    precision, not the decoded boundary: integer encoding floors time
    keys to the accuracy unit, and ``<= floor(max)`` would silently drop
    every row in (floor(max), max] — e.g. any afternoon timestamp on the
    last day under the default day accuracy. Interior bounds stay
    floored, which is safe: range i's ``< b`` and range i+1's ``>= b``
    share the same literal, so the tiling has no gap or overlap."""
    preds = []
    exact = getattr(convertor, "literal_exact", convertor.literal)
    for lo, hi, closed in split_ranges(min_value, max_value, num, convertor):
        if closed:
            op, hi_lit = "<=", exact(max_value)
        else:
            op, hi_lit = "<", convertor.literal(hi)
        preds.append(
            f"{key} >= {convertor.literal(lo)} AND {key} {op} {hi_lit}"
        )
    return preds
