"""Optimizer barriers for computed-column materialization.

Catalyst's CollapseProject inlines a computed column into every textual
reference downstream.  For scalar consumers SPARK-36718 guards against
duplicating non-cheap expressions, but a reference INSIDE a higher-order-
function lambda body slips through with a single textual occurrence — and
is then re-evaluated PER ARRAY ELEMENT at runtime.  Nest two HOF stages
(array built from a computed column, then a second lambda referencing that
array) and the cost multiplies: profiled on the winnowed-fingerprint
operator, 500 sub-KB documents ran for >10 MINUTES because every
sliding-window element re-evaluated the full k-gram md5 array, which
itself re-evaluated the regex-normalized text per gram — O(L²·regex)
per document instead of O(L).

:func:`project_barrier` is the surgical fix: an ``explode(array(struct))``
Generate node between the defining projection and its consumers.  Generate
evaluates its child once per row and emits the computed columns as plain
bound attributes; CollapseProject cannot inline across a Generate, so
downstream lambdas read row values instead of re-running expressions.
Cost: one extra narrow operator per row — no shuffle, no caching, no
memory pinning (unlike persist(), which needs lifecycle management).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def project_barrier(df: DataFrame) -> DataFrame:
    """Materialize ``df``'s (possibly computed) columns as plain attributes
    before downstream projections consume them.  Schema-preserving,
    row-preserving, zero-shuffle."""
    return df.select(
        F.explode(F.array(F.struct(*[F.col(c) for c in df.columns]))).alias("_row")
    ).select("_row.*")
