"""Pure-Python extraction core (no Spark imports).

Replicates the reference pipeline's rules-only semantics exactly so that
byte-identity tests run without a SparkSession and the same functions can be
called from inside Arrow-batched pandas UDFs.
"""

from indian_address_parser_spark.core.parse import parse_address, flatten_fields  # noqa: F401
from indian_address_parser_spark.core.schemas import ENTITY_LABELS, Span  # noqa: F401
