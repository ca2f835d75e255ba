"""GROUPED_AGG pandas UDAFs (§2.11 aggregate-UDF surface).

Defined in their own module WITHOUT `from __future__ import
annotations`: PySpark infers the GROUPED_AGG eval type from the
`pd.Series -> float` signature, and postponed evaluation turns the
hints into strings the inference rejects (UNSUPPORTED_SIGNATURE).

Scale caveat shared by every GROUPED_AGG: the group's column is
buffered in one Arrow batch, so memory is O(largest group). Safe for
enum-sized groups (return flags, statuses); for high-cardinality keys
prefer algebraic aggregates or approx_percentile two-pass forms.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def median_udaf(v: pd.Series) -> float:
    """Exact median. pandas' even-count rule (mean of the two middle
    values) matches DuckDB's continuous-interpolation median
    bit-for-bit on doubles."""
    return float(v.median())


@pandas_udf("double")
def mad_udaf(v: pd.Series) -> float:
    """Median absolute deviation — median of |x - median(x)|: two
    dependent exact medians, which no single built-in expresses."""
    return float((v - v.median()).abs().median())
