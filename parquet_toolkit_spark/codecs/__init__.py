"""Pure numpy/pyarrow lightweight codecs (no Spark dependency).

Codec family required by the north rule: dictionary, RLE, FSST-style string
compression, bit-packing, frame-of-reference — plus delta and a plain(+zstd)
floor so the selector never regresses above a general-purpose baseline.
"""

from parquet_toolkit_spark.codecs.chunk import ColumnChunk  # noqa: F401
from parquet_toolkit_spark.codecs.container import (  # noqa: F401
    decode_blob,
    encode_blob,
)
from parquet_toolkit_spark.codecs.selector import select_codec  # noqa: F401
