from .builder import IndexMeta, build_index, read_meta
from .codec import decode_varbyte, delta_decode, delta_encode, encode_varbyte

__all__ = [
    "IndexMeta",
    "build_index",
    "read_meta",
    "encode_varbyte",
    "decode_varbyte",
    "delta_encode",
    "delta_decode",
]
