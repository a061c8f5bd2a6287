from .decoder import ViterbiDecoder, decode_frames
from .functional import decode_fn, decode_symbols
from .streaming import StreamingDecoder

__all__ = [
    "ViterbiDecoder",
    "decode_frames",
    "decode_fn",
    "decode_symbols",
    "StreamingDecoder",
]
