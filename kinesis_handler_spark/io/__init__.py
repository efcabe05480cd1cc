"""Sources and sinks + multimodal column handling."""

from kinesis_handler_spark.io.multimodal import (
    MULTIMODAL_SCHEMA,
    decode_and_featurize,
    make_multimodal_df,
)

__all__ = ["MULTIMODAL_SCHEMA", "decode_and_featurize", "make_multimodal_df"]
