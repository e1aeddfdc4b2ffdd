"""Bytes-level convenience API mirroring the csc CLI framing
(csc.cpp:101-170): `[10-byte props][MemIO stream]`.
"""

from ..props import CSCProps, props_init, write_properties, read_properties
from .encoder import encode_stream
from .decoder import CSCDecoder


def compress(data: bytes, level: int = 2, dict_size: int = None,
             props: CSCProps = None) -> bytes:
    """Compress with the csc file framing (props header + stream)."""
    if props is None:
        if dict_size is None:
            dict_size = min(len(data) if data else 1, 64 * 1024 * 1024)
        props = props_init(dict_size, level)
    return write_properties(props) + encode_stream(props, data)


def decompress(blob: bytes) -> bytes:
    """Decompress a csc-framed blob (props header + stream)."""
    props = read_properties(blob[:10])
    return decompress_stream(props, blob, 10)


def compress_stream(props: CSCProps, data: bytes) -> bytes:
    """Compress to a raw MemIO stream (no header) with explicit props."""
    return encode_stream(props, data)


def decompress_stream(props: CSCProps, data: bytes, pos: int = 0) -> bytes:
    """Decode a raw MemIO stream starting at `pos`."""
    dec = CSCDecoder(props, data, pos)
    out = bytearray()
    while True:
        block = dec.decompress(props.raw_blocksize)
        if not block:
            break
        out += block
    return bytes(out)
