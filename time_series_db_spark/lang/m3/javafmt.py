"""Java formatting shims for golden-file parity.

The reference's explain dumps go through ``String.format(Locale.ROOT)``,
``Double.toString`` and ``HashMap.toString`` — this module reproduces
those exactly so our plan dumps byte-match the reference's golden files
(lang/m3/data/plan/*.txt).
"""

from __future__ import annotations


def java_double_str(v: float) -> str:
    """Java ``Double.toString``: always a decimal point; scientific
    notation outside [1e-3, 1e7); exponent rendered as ``E``."""
    if v != v:
        return "NaN"
    if v == float("inf"):
        return "Infinity"
    if v == float("-inf"):
        return "-Infinity"
    a = abs(v)
    if a != 0 and (a < 1e-3 or a >= 1e7):
        s = repr(v)  # shortest round-trip decimal, like Java
        if "e" in s or "E" in s:
            mant, exp = s.split("e")
            exp = int(exp)
        else:
            # repr chose plain notation; normalize to scientific
            mant, exp = _to_sci(s)
        if "." not in mant:
            mant += ".0"
        return f"{mant}E{exp}"
    s = repr(float(v))
    if "e" in s:  # repr went scientific inside Java's plain range
        mant, exp = s.split("e")
        return _expand_plain(mant, int(exp))
    if "." not in s:
        s += ".0"
    return s


def _to_sci(s: str) -> tuple[str, int]:
    neg = s.startswith("-")
    if neg:
        s = s[1:]
    int_part, _, frac = s.partition(".")
    digits = (int_part + frac).lstrip("0")
    exp = len(int_part.lstrip("0")) - 1 if int_part.strip("0") else -(
        len(frac) - len(frac.lstrip("0")) + 1
    )
    digits = digits.rstrip("0") or "0"
    mant = digits[0] + ("." + digits[1:] if len(digits) > 1 else "")
    return ("-" if neg else "") + mant, exp


def _expand_plain(mant: str, exp: int) -> str:
    neg = mant.startswith("-")
    if neg:
        mant = mant[1:]
    int_part, _, frac = mant.partition(".")
    digits = int_part + frac
    point = len(int_part) + exp
    if point <= 0:
        out = "0." + "0" * (-point) + digits
    elif point >= len(digits):
        out = digits + "0" * (point - len(digits)) + ".0"
    else:
        out = digits[:point] + "." + digits[point:]
    return ("-" if neg else "") + out


def java_float_str(v: float) -> str:
    """Java ``Float.toString`` — adequate for golden percentile lists
    (values parsed from short decimal literals round-trip identically)."""
    return java_double_str(v)


def java_string_hash(s: str) -> int:
    """``String.hashCode()`` — 32-bit wrapping polynomial hash."""
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) & 0xFFFFFFFF
    return h


def java_hashmap_order(keys: list[str]) -> list[str]:
    """Iteration order of ``java.util.HashMap`` for string keys inserted
    in the given order (default capacity 16, load factor 0.75, Java 8+
    bucket spreading) — required to byte-match FETCH plan dumps."""
    n = len(keys)
    capacity = 16
    while n > capacity * 0.75:
        capacity *= 2
    buckets: list[list[str]] = [[] for _ in range(capacity)]
    for k in keys:
        h = java_string_hash(k)
        h ^= h >> 16  # HashMap.hash() spreading (>>> on non-negative int)
        buckets[h & (capacity - 1)].append(k)
    return [k for b in buckets for k in b]


def java_map_str(d: dict[str, str | list[str]], hashmap_order: bool = True) -> str:
    keys = java_hashmap_order(list(d)) if hashmap_order else list(d)
    parts = []
    for k in keys:
        v = d[k]
        vs = "[" + ", ".join(v) + "]" if isinstance(v, list) else str(v)
        parts.append(f"{k}={vs}")
    return "{" + ", ".join(parts) + "}"
