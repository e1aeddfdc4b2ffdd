"""Streaming / bounded-memory codec API (csc_tpu.stream).

The streamed output must be byte-identical to the whole-buffer golden
encoder for any write chunking (the reference's CSCEnc_Encode consumes
an ISeqInStream in raw_blocksize chunks regardless of caller chunking,
csc_enc.cpp:160-191), and the streaming decoder must decode both our
and reference-produced streams with bounded input buffering."""
import io
import os
import subprocess

import numpy as np
import pytest

from csc_tpu.props import props_init, write_properties
from csc_tpu.golden.encoder import encode_stream
from csc_tpu import stream as cstream


def _mk_text(n, seed=0):
    rng = np.random.default_rng(seed)
    words = [b"the", b"quick", b"brown", b"compression", b"window",
             b"entropy", b"coder", b"range", b"match", b"finder"]
    out = bytearray()
    while len(out) < n:
        out += words[rng.integers(len(words))] + b" "
    return bytes(out[:n])


@pytest.mark.parametrize("chunks", [1, 7, 4096, 1 << 20])
def test_stream_encode_identity(chunks):
    data = _mk_text(300_000, 3)
    p = props_init(64 * 1024, 2)
    p.raw_blocksize = 65536       # multi-chunk stream
    whole = write_properties(p) + encode_stream(p, data)

    out = io.BytesIO()
    enc = cstream.StreamEncoder(p, out)
    for i in range(0, len(data), chunks):
        enc.write(data[i:i + chunks])
    enc.finish()
    assert out.getvalue() == whole


def test_stream_decode_roundtrip():
    data = _mk_text(200_000, 5) + bytes(
        np.random.default_rng(1).integers(0, 256, 50_000, dtype=np.uint8))
    p = props_init(32 * 1024, 1)
    out = io.BytesIO()
    enc = cstream.StreamEncoder(p, out)
    enc.write(data)
    enc.finish()
    dec = cstream.StreamDecoder(io.BytesIO(out.getvalue()))
    got = b"".join(dec.blocks())
    assert got == data


def test_stream_decode_reference_file(ref_build, corpus_dir, tmp_path):
    src = os.path.join(corpus_dir, "corpus_text1m.bin")
    ref_out = tmp_path / "ref.csc"
    subprocess.run([os.path.join(ref_build, "csc"), "c", "-m2",
                    src, str(ref_out)], check=True, capture_output=True)
    with open(ref_out, "rb") as f:
        dec = cstream.StreamDecoder(f)
        got = b"".join(dec.blocks())
    with open(src, "rb") as f:
        assert got == f.read()


def test_stream_cli_bounded(tmp_path, corpus_dir):
    """CLI --stream path round-trips and bounds the reader buffer."""
    from csc_tpu.cli import main
    src = tmp_path / "in.bin"
    src.write_bytes(_mk_text(150_000, 9))
    comp = tmp_path / "out.csc"
    deco = tmp_path / "out.bin"
    assert main(["c", str(src), str(comp), "-m", "1", "--stream"]) == 0
    assert main(["d", str(comp), str(deco), "--stream"]) == 0
    assert deco.read_bytes() == src.read_bytes()
