"""IPv4 analysis functions for log tables (VPCFlow/ALB srcaddr columns).

The reference's canonical corpus is IP-heavy (top talkers by srcaddr,
action filters — FIXTURES.md B1/B2) but delegates IP semantics to
whatever the RDS engine offers; Spark likewise has no inet functions.
These are pure codegen'd column expressions (split/cast/shift — no
UDFs), so CIDR filters push through whole-stage codegen and, when
applied to a literal prefix range via :func:`cidr_range`, can prune
parquet row groups through ordinary min/max stats on the numeric form.

Malformed addresses yield NULL (total functions, same ANSI-safety
contract as operators/coerce.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Strict dotted-quad guard: 1-3 digits x4. Range (0-255) is enforced
#: by the octet comparison below, not the regex.
_IP4_RE = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"


def ip4_to_long(col: Column) -> Column:
    """Dotted-quad string → unsigned-32 value in a BIGINT; NULL for
    malformed input (bad shape or any octet > 255)."""
    parts = F.split(col, r"\.")
    octets = [parts.getItem(i).cast("bigint") for i in range(4)]
    value = (
        octets[0] * F.lit(16777216)
        + octets[1] * F.lit(65536)
        + octets[2] * F.lit(256)
        + octets[3]
    )
    in_range = (
        (octets[0] <= 255) & (octets[1] <= 255) & (octets[2] <= 255) & (octets[3] <= 255)
    )
    return F.when(col.rlike(_IP4_RE) & in_range, value).otherwise(F.lit(None))


def long_to_ip4(col: Column) -> Column:
    """Inverse of :func:`ip4_to_long` (values outside [0, 2^32) → NULL)."""
    ok = (col >= 0) & (col <= F.lit(4294967295))
    quad = F.concat_ws(
        ".",
        ((col / 16777216).cast("bigint") % 256).cast("string"),
        ((col / 65536).cast("bigint") % 256).cast("string"),
        ((col / 256).cast("bigint") % 256).cast("string"),
        (col % 256).cast("string"),
    )
    return F.when(ok, quad).otherwise(F.lit(None))


def cidr_range(cidr: str) -> tuple[int, int]:
    """Driver-side [lo, hi] bounds of a literal CIDR block — use these as
    plain numeric BETWEEN predicates so parquet min/max pruning applies
    to a pre-computed ``ip4_to_long`` column."""
    base, _, bits_s = cidr.partition("/")
    bits = int(bits_s) if bits_s else 32
    if not 0 <= bits <= 32:
        raise ValueError(f"bad prefix length in {cidr!r}")
    o = [int(x) for x in base.split(".")]
    if len(o) != 4 or any(not 0 <= x <= 255 for x in o):
        raise ValueError(f"bad IPv4 address in {cidr!r}")
    val = (o[0] << 24) | (o[1] << 16) | (o[2] << 8) | o[3]
    mask = ((1 << bits) - 1) << (32 - bits) if bits else 0
    lo = val & mask
    return lo, lo | (0xFFFFFFFF ^ mask)


def cidr_contains(cidr: str, ip_col: Column) -> Column:
    """True when ``ip_col`` (dotted-quad string) falls inside the literal
    ``cidr`` block; NULL for malformed addresses."""
    lo, hi = cidr_range(cidr)
    v = ip4_to_long(ip_col)
    return v.between(F.lit(lo), F.lit(hi))


#: RFC1918 + loopback + link-local, as literal ranges.
_PRIVATE_BLOCKS = ("10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16")


def is_private_ip(ip_col: Column) -> Column:
    """RFC1918 membership (NULL for malformed addresses)."""
    v = ip4_to_long(ip_col)
    cond = F.lit(False)
    for block in _PRIVATE_BLOCKS:
        lo, hi = cidr_range(block)
        cond = cond | v.between(F.lit(lo), F.lit(hi))
    return F.when(v.isNull(), F.lit(None)).otherwise(cond)
