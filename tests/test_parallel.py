"""Stream-batch sharding over the 8-virtual-device CPU mesh."""

import pytest

pytestmark = pytest.mark.slow
import os

from csc_tpu.golden import compress
from csc_tpu.props import read_properties
from csc_tpu.parallel import make_stream_mesh, decode_batch_sharded


def test_sharded_decode(corpus_dir):
    import jax
    assert len(jax.devices()) >= 8, "conftest forces an 8-device CPU mesh"
    with open(os.path.join(corpus_dir, "corpus_text1m.bin"), "rb") as f:
        data = f.read(48 * 1024)
    chunks = [data[i * 8192:(i + 1) * 8192] for i in range(6)]  # 6 -> pad to 8
    blobs = [compress(c, level=1, dict_size=len(c)) for c in chunks]
    props = [read_properties(b[:10]) for b in blobs]
    mesh = make_stream_mesh(8)
    assert mesh.shape == {"dp": 4, "sp": 2}
    outs = decode_batch_sharded(props, blobs, [10] * len(blobs),
                                out_sizes=[8192] * len(blobs), mesh=mesh)
    assert outs == chunks
