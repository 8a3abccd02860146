"""LegacyDec — cosmos 18-digit fixed-point semantics vs an exact
Fraction reference (round-half-to-even on the 18th digit, truncate
variants toward zero, parse truncation, canonical String())."""

from fractions import Fraction

import numpy as np
import pytest

from cosmwasm_etl_ray.functions.legacydec import (
    ONE,
    amount_add,
    legacy_from_int,
    legacy_mul,
    legacy_quo,
    legacy_str,
    parse_legacy,
)


def test_parse_truncates_past_18_digits():
    got = parse_legacy(["1.2345678901234567899", "-0.0000000000000000019", "7", " 2.5 "])
    assert got[0] == 1234567890123456789  # 19th digit dropped, no round
    assert got[1] == -1  # -0.000000000000000001 (9 truncated, sign after)
    assert got[2] == 7 * ONE
    assert got[3] == 25 * ONE // 10


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        parse_legacy([""])
    with pytest.raises(ValueError):
        parse_legacy(["-"])


def test_mul_matches_fraction_round_half_even():
    rng = np.random.default_rng(3)
    # compose past-int64 magnitudes from two int64 draws (object ints)
    a = [int(x) * int(m) for x, m in zip(
        rng.integers(-(10**18), 10**18, 300), rng.integers(1, 500, 300))]
    b = [int(x) * int(m) for x, m in zip(
        rng.integers(-(10**18), 10**18, 300), rng.integers(1, 500, 300))]
    got = legacy_mul(a, b)
    for x, y, g in zip(a, b, got):
        assert int(g) == round(Fraction(x * y, ONE))  # round() = half-even


def test_mul_exact_half_goes_to_even():
    # 0.5 * 10^-18 boundary: a*b = q*ONE + ONE/2 exactly
    a = [ONE // 2, ONE // 2, -(ONE // 2)]
    b = [3, 5, 3]  # products: 1.5e18/ONE=1.5→2(even), 2.5→2(even), -1.5→-2
    got = legacy_mul(a, b)
    assert [int(v) for v in got] == [2, 2, -2]


def test_mul_truncate_toward_zero():
    a, b = [ONE + 1, -(ONE + 1)], [ONE - 1, ONE - 1]
    got = legacy_mul(a, b, truncate=True)
    # (1+e)(1-e) = 1 - e^2 → truncates to 0.999... ; negative → toward 0
    assert int(got[0]) == ONE - 1
    assert int(got[1]) == -(ONE - 1)


def test_quo_matches_fraction():
    rng = np.random.default_rng(5)
    a = [int(x) * 13 for x in rng.integers(-(10**18), 10**18, 200)]
    b = [int(x) or 7 for x in rng.integers(-(10**10), 10**10, 200)]
    got = legacy_quo(a, b)
    for x, y, g in zip(a, b, got):
        # cosmos: truncating big.Int quo on the double-scaled magnitude,
        # then the half-even chop — reproduce independently
        mag = (abs(x) * ONE * ONE) // abs(y)
        sgn = 1 if (x < 0) == (y < 0) else -1
        q, r = divmod(mag, ONE)
        if 2 * r > ONE or (2 * r == ONE and q % 2 == 1):
            q += 1
        assert int(g) == sgn * q


def test_quo_by_zero_raises():
    with pytest.raises(ZeroDivisionError):
        legacy_quo([ONE], [0])


def test_from_int_exact_shift_and_str():
    got = legacy_from_int(["123456789012345678901234", 5], decimals=6)
    assert got[0] == 123456789012345678901234 * 10**12  # big.Int width ok
    s = legacy_str(legacy_from_int([-5], decimals=1))
    assert s[0] == "-0.500000000000000000"
    assert legacy_str([0])[0] == "0.000000000000000000"


def test_amount_add_bigint_strings():
    got = amount_add(["99999999999999999999999999", "-1"], ["1", "-2"])
    assert got[0] == "100000000000000000000000000"
    assert got[1] == "-3"


def test_reference_pipeline_shape():
    """volume.Quo(10^decimals).Mul(price) — the aggregator's price-math
    shape (/root/reference/aggregator/task.go:436-442) end to end."""
    amounts = [1_500_000, 2_750_000]      # micro-denominated (6 decimals)
    price = parse_legacy(["0.333333333333333333"] * 2)
    vol = legacy_from_int(amounts, decimals=6)
    got = legacy_str(legacy_mul(vol, price))
    # 1.5 * 0.333...333 = 0.4999999999999999995 → 18-digit chop (half
    # ends in ...9995 → 2r > ONE? compute via Fraction reference)
    for amt, g in zip(amounts, got):
        v = Fraction(amt, 10**6) * Fraction(333333333333333333, ONE)
        scaled = round(Fraction(v * ONE))
        q, r = divmod(int(v * ONE * ONE), ONE * ONE)  # guard: exactness
        expect = round(Fraction(amt, 10**6) * Fraction(333333333333333333, ONE) * ONE)
        sgn = "" if expect >= 0 else "-"
        assert g == f"{sgn}{abs(expect) // ONE}.{abs(expect) % ONE:018d}"


# ---- hypothesis fuzz: every kernel vs exact Fraction arithmetic ----

from hypothesis import given, settings
from hypothesis import strategies as st

_raw = st.integers(min_value=-(10**40), max_value=10**40)
_nonzero = _raw.filter(lambda v: v != 0)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(_raw, _raw), min_size=1, max_size=8))
def test_fuzz_mul_half_even(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = legacy_mul(a, b)
    for x, y, g in zip(a, b, got):
        assert int(g) == round(Fraction(x * y, ONE))  # round() is half-even


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(_raw, _nonzero), min_size=1, max_size=8))
def test_fuzz_quo_truncate_then_chop(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = legacy_quo(a, b)
    for x, y, g in zip(a, b, got):
        mag = (abs(x) * ONE * ONE) // abs(y)
        sgn = 1 if (x < 0) == (y < 0) else -1
        q, r = divmod(mag, ONE)
        if 2 * r > ONE or (2 * r == ONE and q % 2 == 1):
            q += 1
        assert int(g) == sgn * q


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**30),
    st.integers(min_value=0, max_value=30),
    st.text(alphabet="0123456789", min_size=0, max_size=25),
    st.sampled_from(["", "-", "+"]),
)
def test_fuzz_parse_str_roundtrip(ip, _unused, frac, sign):
    s = f"{sign}{ip}.{frac}" if frac else f"{sign}{ip}"
    got = int(parse_legacy([s])[0])
    kept = frac[:18]
    mag = ip * ONE + (int(kept) * 10 ** (18 - len(kept)) if kept else 0)
    assert got == (-mag if sign == "-" else mag)
    # String() of what survived re-parses to the same value
    assert int(parse_legacy([str(legacy_str([got])[0])])[0]) == got
