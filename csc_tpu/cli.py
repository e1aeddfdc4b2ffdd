"""csc-compatible command line: c/d single-file compress/decompress.

Mirrors csc.cpp:101-170 (option parsing, dict clamp to file size, 10-byte
property header) and decomp.cpp:37-68 (decode-only).  The compute backend
is selected with --backend {golden,tpu}; `tpu` uses the batched JAX path
for supported block types and falls back to golden elsewhere.
"""
import argparse
import os
import sys
import time

from .props import (props_init, read_properties, write_properties,
                    est_mem_usage)
from .constants import KB, MB


def _honor_platform_env():
    """Make JAX_PLATFORMS from the caller's environment win even when a
    site plugin imported jax first and snapshotted its own platform (the
    axon sitecustomize does; see tests/conftest.py)."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            import jax
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass


def _parse_size(s):
    s = s.lower()
    if s.endswith('k'):
        return int(s[:-1]) * KB
    if s.endswith('m'):
        return int(s[:-1]) * MB
    return int(s)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="csc", description=__doc__)
    ap.add_argument("mode", choices=["c", "d"])
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("-m", type=int, default=2, dest="level",
                    help="compression level 1..5")
    ap.add_argument("-d", type=_parse_size, default=32 * MB, dest="dict_size",
                    help="dictionary size (suffix k/m)")
    ap.add_argument("--fdelta0", action="store_true", help="disable DELTA filter")
    ap.add_argument("--fexe0", action="store_true", help="disable EXE filter")
    ap.add_argument("--ftxt0", action="store_true", help="disable TXT filter")
    ap.add_argument("--backend", choices=["golden", "tpu"], default="golden")
    ap.add_argument("--stream", action="store_true",
                    help="bounded-memory streaming mode (golden backend; "
                         "peak RSS ~ dict + buffers, independent of file "
                         "size — the ISeqInStream loop of "
                         "csc_enc.cpp:160-191)")
    args = ap.parse_args(argv)

    if args.stream:
        from . import stream as _stream
        t0 = time.time()
        if args.mode == "c":
            fsize = os.path.getsize(args.input)
            dict_size = min(args.dict_size, max(fsize, 1))
            props = props_init(dict_size, args.level)
            if args.fdelta0:
                props.DLTFilter = 0
            if args.fexe0:
                props.EXEFilter = 0
            if args.ftxt0:
                props.TXTFilter = 0
            print("Estimated memory usage: %d MB"
                  % (est_mem_usage(props) // 1048576), file=sys.stderr)
            with open(args.input, "rb") as fi, \
                    open(args.output, "wb") as fo:
                n = _stream.compress_file(fi, fo, props)
            csize = os.path.getsize(args.output)
            dt = time.time() - t0
            print("%d -> %d (%.2f MB/s)" % (n, csize,
                                            n / 1e6 / max(dt, 1e-9)))
        else:
            with open(args.input, "rb") as fi, \
                    open(args.output, "wb") as fo:
                n = _stream.decompress_file(fi, fo)
            dt = time.time() - t0
            print("%d -> %d (%.2f MB/s)"
                  % (os.path.getsize(args.input), n,
                     n / 1e6 / max(dt, 1e-9)))
        return 0

    with open(args.input, "rb") as f:
        data = f.read()

    t0 = time.time()
    if args.mode == "c":
        dict_size = min(args.dict_size, max(len(data), 1))
        props = props_init(dict_size, args.level)
        if args.fdelta0:
            props.DLTFilter = 0
        if args.fexe0:
            props.EXEFilter = 0
        if args.ftxt0:
            props.TXTFilter = 0
        print("Estimated memory usage: %d MB"
              % (est_mem_usage(props) // 1048576), file=sys.stderr)
        if args.backend == "tpu":
            _honor_platform_env()
            from .ops.pipeline import encode_stream_tpu
            stream = encode_stream_tpu(props, data)
        else:
            from .golden.encoder import encode_stream
            stream = encode_stream(props, data)
        out = write_properties(props) + stream
        with open(args.output, "wb") as f:
            f.write(out)
        dt = time.time() - t0
        print("%d -> %d (%.2f MB/s)" % (len(data), len(out),
                                        len(data) / 1e6 / max(dt, 1e-9)))
    else:
        props = read_properties(data[:10])
        if args.backend == "tpu":
            _honor_platform_env()
            from .ops.pipeline import decode_stream_tpu
            raw = decode_stream_tpu(props, data, 10)
        else:
            from .golden.api import decompress_stream
            raw = decompress_stream(props, data, 10)
        with open(args.output, "wb") as f:
            f.write(raw)
        dt = time.time() - t0
        print("%d -> %d (%.2f MB/s)" % (len(data), len(raw),
                                        len(raw) / 1e6 / max(dt, 1e-9)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
