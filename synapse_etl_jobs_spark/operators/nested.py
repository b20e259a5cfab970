"""Nested/array operators (reference N1-N5), all native expressions.

- ``explode_array``      ← gs_explode (certified_quiz_question_snapshots.py:18-25)
- ``reshape_array``      ← per-element struct rebuild (same file :46-57)
- ``first_element``      ← first email (user_profile_snapshots.py:35-40)
- struct construction is plain ``F.struct`` at call sites (N4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_array(df: DataFrame, array_col: str, new_col: str, *, outer: bool = False) -> DataFrame:
    """One output row per array element, keeping all other columns.

    ``outer=True`` keeps rows whose array is null/empty (element = null) —
    Glue's gs_explode drops them, matching ``F.explode``.
    """
    fn = F.explode_outer if outer else F.explode
    return df.select("*", fn(F.col(array_col)).alias(new_col))


def reshape_array(array_col, element_builder) -> Column:
    """``F.transform`` wrapper: rebuild each element of an array of structs.

    ``element_builder(elem) -> Column`` receives the lambda variable; e.g.
    reshaping quiz corrections::

        reshape_array(
            "snapshot.corrections",
            lambda c: F.struct(
                c["question"]["questionIndex"].alias("question_index"),
                c["isCorrect"].alias("is_correct"),
            ),
        )
    """
    col = array_col if isinstance(array_col, Column) else F.col(array_col)
    return F.transform(col, element_builder)
