from categoricalnf_tpu.encodings.base import Encoding
from categoricalnf_tpu.encodings.decoders import (LinearDecoder, MLPDecoder,
                                                  create_decoder)
from categoricalnf_tpu.encodings.dequantization import VariationalDequantization
from categoricalnf_tpu.encodings.factory import create_encoding
from categoricalnf_tpu.encodings.linear_flows import LinearFlowEncoding
from categoricalnf_tpu.encodings.mixture import MixtureEncoding

__all__ = [
    "Encoding", "LinearDecoder", "MLPDecoder", "create_decoder",
    "VariationalDequantization", "create_encoding", "LinearFlowEncoding",
    "MixtureEncoding",
]
