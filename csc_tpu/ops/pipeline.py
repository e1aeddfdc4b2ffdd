"""Batched stream pipelines: host framing/demux -> device scan -> host
filter post-pass.  The public entry points mirror the golden api but take a
LIST of independent streams and run them in lockstep on the device.
"""
import numpy as np
import jax.numpy as jnp

from ..constants import DT_EXE, DT_ENGTXT, SIG_EOF
from ..golden import filters
from . import framing
from .decode_scan import make_decode_state, run_decode_jit


def decode_batch(props_list, blobs, positions=None, out_sizes=None,
                 max_steps=None):
    """Decode B independent csc streams in lockstep.

    props_list: per-stream CSCProps (csc_blocksize/dict must be known).
    blobs: list of bytes (physical streams); positions: start offsets.
    Returns list[bytes] decoded outputs.

    Requires decoded size <= dict_size per stream (no ring wrap) — the
    archiver's task construction guarantees this.
    """
    b = len(blobs)
    assert b > 0
    if positions is None:
        positions = [0] * b
    rcs, bcs, rce, bce = [], [], [], []
    for props, blob, pos in zip(props_list, blobs, positions):
        rc, bc, re_, be_ = framing.demux_stream(blob, pos, props.csc_blocksize)
        rcs.append(rc)
        bcs.append(bc)
        rce.append(re_)
        bce.append(be_)
    rc = framing.batch_pad(rcs, 0, np.uint8)
    bc = framing.batch_pad(bcs, 0, np.uint8)
    rc_ends = framing.pad_ends(rce)
    bc_ends = framing.pad_ends(bce)
    # pad rc so priming reads bytes 1..4 safely
    if rc.shape[1] < 8:
        rc = np.pad(rc, ((0, 0), (0, 8 - rc.shape[1])))
    if bc.shape[1] < 8:
        bc = np.pad(bc, ((0, 0), (0, 8 - bc.shape[1])))

    wnd_size = max(p.dict_size for p in props_list)
    if out_sizes is not None:
        # tight window: big enough for every stream's output
        wnd_size = min(wnd_size, max(max(out_sizes), 1024))
    wnd_size = int(wnd_size)

    if max_steps is None:
        # worst case ~ (bits + copy steps); direct-coded BAD data moves
        # 2 bytes/step, so 8*rc_bits + bc_bytes/2 is a generous bound
        max_steps = int(8 * rc.shape[1] + bc.shape[1] + 64
                        + 2 * wnd_size)

    st = make_decode_state(b, wnd_size, rc, bc, rc_ends, bc_ends)
    final, steps = run_decode_jit(st, wnd_size, max_steps)

    wnd = np.asarray(final["wnd"])
    blk_log = np.asarray(final["blk_log"])
    blk_cnt = np.asarray(final["blk_cnt"])
    out_pos = np.asarray(final["wnd_pos"])
    done = np.asarray(final["done"])
    if not done.all():
        raise RuntimeError("decode scan hit step cap before completion")

    outputs = []
    for i in range(b):
        raw = bytearray(wnd[i, :out_pos[i]].tobytes())
        # post-pass: inverse filters per logged block (EXE / ENGTXT)
        n = blk_cnt[i]
        for k in range(n):
            btype, start = blk_log[i, k]
            end = blk_log[i, k + 1][1] if k + 1 < n else out_pos[i]
            if btype == SIG_EOF:
                break
            if btype == DT_EXE:
                seg = bytearray(raw[start:end])
                filters.inverse_e89(seg, len(seg))
                raw[start:end] = seg
            elif btype == DT_ENGTXT:
                seg = bytearray(raw[start:end])
                filters.inverse_dict(seg, len(seg))
                raw[start:end] = seg
        outputs.append(bytes(raw))
    return outputs


def decode_stream_tpu(props, blob, pos=0):
    """Single-stream decode through the batched path (B=1)."""
    return decode_batch([props], [blob], [pos])[0]


def encode_stream_tpu(props, data):
    """Batched encoder: not yet wired for single streams; see encode_scan."""
    raise NotImplementedError(
        "TPU encode path lands via csc_tpu.ops.encode_scan; "
        "use backend=golden meanwhile")
