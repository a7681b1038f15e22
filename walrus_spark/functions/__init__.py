"""User-defined function surface (SURVEY.md §2.6).

The reference has no UDF surface at all (payloads are opaque bytes);
our engine exposes PySpark's full native one. This package holds the
worked examples of each family — vectorized pandas UDAF and Python
UDTF — with the scale rules they follow: Arrow-batched transfer, no
driver-side state, and built-in expressions everywhere a UDF isn't
semantically required.
"""

from walrus_spark.functions.udx import SplitWords, median_udaf  # noqa: F401
