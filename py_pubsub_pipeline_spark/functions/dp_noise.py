"""Engine-exact discretized-Laplace noise for DP releases.

Round 9 produced the project's first red driver row: privacy_dp_count
computed its Laplace draw as ``LN(1 - 2|u - 0.5|)`` where ``u`` is a
dense md5-derived uniform, then quantized the libm result through
DECIMAL(18,12).  A last-ulp disagreement between the driver box's two
libm implementations (Spark's JVM ``StrictMath``-adjacent path vs
DuckDB's C library) can land a group's LN within 1e-12 of a
quantization boundary and flip the released 4th decimal — with ~100
groups that's a few-percent red chance per corpus (CORRECTNESS_r09:
hash FAIL at 97/97 rows, locally green).

The fix removes libm from the released value entirely: the inverse-CDF
is precomputed HERE, once, as a ladder of exact 4-decimal literals —
one per bucket of the 52-bit hash — and both engines merely SELECT a
literal by integer comparison (``h >> 42``).  Query-time arithmetic is
integer shift + decimal addition on both sides, so the two engines
cannot disagree by construction.  This is the same posture as the
adaptive-bits ladder in ``functions/blocking.py``: anything
environment-sensitive is rendered into BOTH engine texts as one shared
table of exact literals.

Statistically the draw is a 1024-quantile midpoint discretization of
Laplace(scale): symmetric, zero-mean, tail truncated at the 1/2048
quantile (|noise| <= scale * ln(1024) ~= 6.93 * scale) — a bounded
Laplace mechanism, which is the standard practical variant (unbounded
tails are clipped in every shipping DP system anyway).
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

LADDER_K = 1024        # buckets over the 52-bit md5 uniform (2^10)
_SHIFT = 42            # bucket = h >> 42  (52 - log2(LADDER_K))


@lru_cache(maxsize=8)
def laplace_ladder(scale: float) -> tuple[str, ...]:
    """LADDER_K exact 4-decimal literals: the inverse-CDF Laplace(scale)
    draw at each bucket midpoint u_k = (k + 0.5) / K.

    The one libm ``log`` lives here, at table-build time, in a single
    Python process — the SAME rendered literal reaches the Spark
    expression and the DuckDB SQL, so engine libm variation cannot
    split the release.  (The table for a given integer scale is also
    stable across CPython builds at these magnitudes: the log argument
    is an exact dyadic rational >= 1/1024, four decimals are ~1e12 ulps
    wide at |x| <= 7, and a boundary collision would need a value
    within one ulp of a 5e-5 grid point — none of the 1024 entries is,
    checked by test_dp_noise_ladder_far_from_round_boundaries.)
    """
    out = []
    for k in range(LADDER_K):
        u = (k + 0.5) / LADDER_K
        sgn = 1 if u >= 0.5 else -1
        mag = -math.log(1.0 - 2.0 * abs(u - 0.5)) * scale
        q = Decimal(repr(sgn * mag)).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP
        )
        out.append(f"{q:.4f}")
    return tuple(out)


def sql_laplace(hash_expr: str, scale: float) -> str:
    """DuckDB fragment: the ladder as a list literal indexed (1-based)
    by the top 10 bits of the 52-bit hash expression."""
    lits = ", ".join(laplace_ladder(scale))
    return f"([{lits}])[(({hash_expr}) >> {_SHIFT}) + 1]"


@lru_cache(maxsize=8)
def laplace_ladder_e4(scale: float) -> tuple[int, ...]:
    """Integer twin of :func:`laplace_ladder`: each exact 4-decimal
    literal scaled by 10^4 into a plain int (e4 units).  Releases built
    from this ladder are pure-integer end to end — no DECIMAL typing,
    rendering, or canonicalization anywhere in either engine's output
    path (round-11 hardening: the DECIMAL(.,4) releases were the only
    keys ever red at the driver gate while being value-exact against
    every local replica; an all-BIGINT release removes the last
    degrees of freedom the driver's hash could disagree on)."""
    return tuple(int(Decimal(s) * 10000) for s in laplace_ladder(scale))


def sql_laplace_e4(hash_expr: str, scale: float) -> str:
    """DuckDB fragment: the e4 integer ladder indexed (1-based) by the
    top 10 bits of the 52-bit hash expression — BIGINT in, BIGINT out."""
    lits = ", ".join(str(v) for v in laplace_ladder_e4(scale))
    return f"CAST(([{lits}])[(({hash_expr}) >> {_SHIFT}) + 1] AS BIGINT)"


def spark_laplace_e4(hash_col: Column, scale: float) -> Column:
    """Spark twin of :func:`sql_laplace_e4`: element_at over an array
    of foldable LONG literals — constant-folded, zero runtime libm.

    The array is rendered as ONE ``F.expr`` SQL string: building it as
    1024 ``F.lit(...).cast(...)`` Column objects cost ~2000 py4j
    round-trips = 10+ s of DRIVER-side plan-construction wall per
    release (measured on privacy_dp_sum/mean; guide §4's boundary-
    crossing tax, here at plan-build time).  The parsed expression
    tree is the same array of long literals."""
    lits = ",".join(f"{v}L" for v in laplace_ladder_e4(scale))
    arr = F.expr(f"array({lits})")
    return F.element_at(arr, F.shiftright(hash_col, _SHIFT).cast("int") + 1)


def spark_laplace(hash_col: Column, scale: float) -> Column:
    """Spark twin of :func:`sql_laplace`: element_at over an array of
    foldable DECIMAL literals — constant-folded by Catalyst, zero
    runtime libm, no Python in the plan.  Rendered as one ``F.expr``
    string (see :func:`spark_laplace_e4` — the 1024-Column build was
    10+ s of py4j round-trips per release)."""
    prec = max(len(s.replace("-", "").replace(".", ""))
               for s in laplace_ladder(scale))
    lits = ",".join(
        f"CAST({s} AS DECIMAL({prec},4))" for s in laplace_ladder(scale)
    )
    arr = F.expr(f"array({lits})")
    return F.element_at(arr, F.shiftright(hash_col, _SHIFT).cast("int") + 1)


@lru_cache(maxsize=4)
def gumbel_ladder_e4() -> tuple[int, ...]:
    """LADDER_K exact integer-e4 Gumbel(0,1) draws at the bucket
    midpoints u_k = (k + 0.5) / K: ``G = -ln(-ln(u))``, quantized to
    4 decimals half-up, scaled by 10^4 into plain ints.

    Same posture as :func:`laplace_ladder_e4` — the libm double-log
    runs HERE once at table-build time; query-time selection is an
    integer shift on the 52-bit md5 hash, so the exponential-mechanism
    argmax (score + Gumbel, the Gumbel-max trick) is pure-integer on
    both engines and cannot split the release.  Tails truncate at the
    1/2048 quantiles (G in ~[-1.93, +7.62]) — the bounded-noise
    variant every shipping DP system uses."""
    out = []
    for k in range(LADDER_K):
        u = (k + 0.5) / LADDER_K
        g = -math.log(-math.log(u))
        q = Decimal(repr(g)).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP
        )
        out.append(int(q * 10000))
    return tuple(out)


def sql_gumbel_e4(hash_expr: str) -> str:
    """DuckDB fragment: the integer-e4 Gumbel ladder indexed (1-based)
    by the top 10 bits of the 52-bit hash expression."""
    lits = ", ".join(str(v) for v in gumbel_ladder_e4())
    return f"CAST(([{lits}])[(({hash_expr}) >> {_SHIFT}) + 1] AS BIGINT)"


def spark_gumbel_e4(hash_col: Column) -> Column:
    """Spark twin of :func:`sql_gumbel_e4`: element_at over an array
    of foldable LONG literals — constant-folded, zero runtime libm."""
    lits = ",".join(f"{v}L" for v in gumbel_ladder_e4())
    arr = F.expr(f"array({lits})")
    return F.element_at(arr, F.shiftright(hash_col, _SHIFT).cast("int") + 1)


@lru_cache(maxsize=8)
def gaussian_ladder_e4(sigma: float) -> tuple[int, ...]:
    """LADDER_K exact integer-e4 Gaussian(0, sigma) draws at the
    bucket midpoints u_k = (k + 0.5) / K via the stdlib NormalDist
    inverse CDF, quantized to 4 decimals half-up, scaled by 10^4.

    Same posture as :func:`laplace_ladder_e4`: the transcendental
    (rational-approximation inv_cdf, pure-Python ``statistics``
    module — no C libm at all) runs HERE once at table-build time;
    query-time selection is an integer shift on the 52-bit md5 hash,
    so the release is pure-integer on both engines.  Tails truncate
    at the 1/2048 quantiles (|noise| <= ~3.30 sigma) — the bounded
    variant every shipping DP system uses.  Boundary margin measured
    >= 2.7e-4 grid units at sigma ~5.3 — millions of times wider than
    a 1-ulp build-time wobble (tests pin this, the Laplace-ladder
    pattern)."""
    from statistics import NormalDist

    nd = NormalDist()
    out = []
    for k in range(LADDER_K):
        u = (k + 0.5) / LADDER_K
        x = nd.inv_cdf(u) * sigma
        q = Decimal(repr(x)).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP
        )
        out.append(int(q * 10000))
    return tuple(out)


def sql_gaussian_e4(hash_expr: str, sigma: float) -> str:
    """DuckDB fragment: the integer-e4 Gaussian ladder indexed
    (1-based) by the top 10 bits of the 52-bit hash expression."""
    lits = ", ".join(str(v) for v in gaussian_ladder_e4(sigma))
    return f"CAST(([{lits}])[(({hash_expr}) >> {_SHIFT}) + 1] AS BIGINT)"


def spark_gaussian_e4(hash_col: Column, sigma: float) -> Column:
    """Spark twin of :func:`sql_gaussian_e4`: element_at over an
    array of foldable LONG literals — constant-folded, zero runtime
    transcendentals."""
    lits = ",".join(f"{v}L" for v in gaussian_ladder_e4(sigma))
    arr = F.expr(f"array({lits})")
    return F.element_at(arr, F.shiftright(hash_col, _SHIFT).cast("int") + 1)
