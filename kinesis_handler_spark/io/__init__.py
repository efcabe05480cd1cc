"""Sources and sinks + multimodal column handling."""

from kinesis_handler_spark.io.multimodal import (
    MULTIMODAL_SCHEMA,
    decode_and_featurize,
    make_multimodal_df,
    resize_media,
    sample_frames,
)
from kinesis_handler_spark.io.bucketing import read_bucketed, write_bucketed
from kinesis_handler_spark.io.sinks import ParquetChannelSinks
from kinesis_handler_spark.io.sources import (
    envelope_json_stream,
    kinesis_source_options,
    kinesis_stream,
    rate_envelope_stream,
)

__all__ = [
    "MULTIMODAL_SCHEMA",
    "ParquetChannelSinks",
    "decode_and_featurize",
    "envelope_json_stream",
    "read_bucketed",
    "write_bucketed",
    "kinesis_source_options",
    "kinesis_stream",
    "make_multimodal_df",
    "rate_envelope_stream",
    "resize_media",
    "sample_frames",
]
