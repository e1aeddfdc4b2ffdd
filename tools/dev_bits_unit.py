"""Minimal unit check: pallas phase-B vs the encode_bits XLA scan oracle
on hand-built token tapes (interpret mode, CPU).  Fast debug loop."""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from csc_tpu.ops.encode_bits import (make_bits_state, run_bits, K_INT, K_SENT,
                                     K_FLUSH, BSIZE_REF, K_RAW, K_ELIT,
                                     K_DLIT, K_RLEN)
from csc_tpu.ops.encode_scan import K_LIT, K_MATCH, K_REP, K_REP0L1, K_END
from csc_tpu.ops.pallas_encode import encode_bits_pallas
from csc_tpu.constants import DT_NORMAL

CASES = {}

def case(name):
    def deco(f):
        CASES[name] = f
        return f
    return deco

@case("lits")
def c1():
    # DT_NORMAL block of literals then sentinel
    tape = [(K_INT, DT_NORMAL, 0, 0)]
    for ch in b"hello world, hello hello!":
        tape.append((K_LIT, ch, 0, 0))
    tape += [(K_SENT, 64, 0, 0), (K_INT, 1, 0, 0), (K_FLUSH, 0, 0, 0),
             (K_END, 0, 0, 0)]
    return [tape]

@case("match")
def c2():
    tape = [(K_INT, DT_NORMAL, 0, 0)]
    for ch in b"abcdefgh":
        tape.append((K_LIT, ch, 0, 0))
    # match dist 8 len 8 (wire dist-5=3? tape a=dist-5 per encode_scan?)
    tape.append((K_MATCH, 3, 6, ord("h")))    # va=dist', vb=wire len, vc=ctx
    tape.append((K_REP, 0, 4, ord("h")))
    tape.append((K_REP0L1, 0, 0, ord("h")))
    tape += [(K_SENT, 64, 0, 0), (K_INT, 1, 0, 0), (K_FLUSH, 0, 0, 0),
             (K_END, 0, 0, 0)]
    return [tape]

@case("longmatch")
def c3():
    tape = [(K_INT, DT_NORMAL, 0, 0)]
    for ch in b"xyzw" * 4:
        tape.append((K_LIT, ch, 0, 0))
    tape.append((K_MATCH, 9, 20, ord("w")))    # len tree7
    tape.append((K_MATCH, 700, 150, ord("w")))  # longlen + big dist
    tape.append((K_MATCH, 5000, 400, ord("w")))  # longer
    tape += [(K_SENT, 64, 0, 0), (K_INT, 1, 0, 0), (K_FLUSH, 0, 0, 0),
             (K_END, 0, 0, 0)]
    return [tape]

@case("rawelit")
def c4():
    tape = [(K_INT, 4, 0, 0), (K_INT, 6, 0, 0)]   # DT_BAD hdr + size
    tape += [(K_RAW, 0x1234, 16, 0), (K_RAW, 0x56, 8, 0)]
    tape += [(K_INT, 0, 0, 0), (K_INT, 5, 0, 0), (K_INT, 3, 0, 0)]
    for ch in b"AAB":
        tape.append((K_ELIT, ch, 0, 0))
    tape += [(K_INT, 1, 0, 0), (K_FLUSH, 0, 0, 0), (K_END, 0, 0, 0)]
    return [tape]

@case("rle")
def c5():
    tape = [(K_INT, 10, 0, 0), (K_INT, 64, 0, 0)]
    for ch in b"abc":
        tape.append((K_DLIT, ch, 0, ch))
    tape.append((K_RLEN, 0, 30, 0))
    tape.append((K_DLIT, 5, 0, 5))
    tape += [(K_INT, 1, 0, 0), (K_FLUSH, 0, 0, 0), (K_END, 0, 0, 0)]
    return [tape]

def run_case(name, tapes):
    T = max(len(t) for t in tapes) + 2
    B = len(tapes)
    tk = np.zeros((B, T), np.int32); tk[:] = K_END
    ta = np.zeros((B, T), np.int32)
    tb = np.zeros((B, T), np.int32)
    tc = np.zeros((B, T), np.int32)
    for j, t in enumerate(tapes):
        for i, (k, a, b, c) in enumerate(t):
            tk[j, i], ta[j, i], tb[j, i], tc[j, i] = k, a, b, c
    max_rc, max_bc = 4096, 4096
    BSIZE_REF[0] = 65536
    st = make_bits_state(B, tk, ta, tb, tc, max_rc, max_bc)
    fin, _ = jax.jit(run_bits)(st, jnp.int32(200000))
    assert bool(np.asarray(fin["done"]).all()), "scan incomplete"
    rc_cnt = np.asarray(fin["rc_cnt"]); bc_cnt = np.asarray(fin["bc_cnt"])
    rc_ref = [bytes(np.asarray(fin["rc_out"])[j, :rc_cnt[j]]) for j in range(B)]
    bc_ref = [bytes(np.asarray(fin["bc_out"])[j, :bc_cnt[j]]) for j in range(B)]
    rcs, bcs, rcmap, bcmap, chunk_ends, errs = encode_bits_pallas(
        tk, ta, tb, tc, max_rc, max_bc, bsize=65536, interpret=True,
        max_steps=3000)
    ok = True
    for j in range(B):
        if rcs[j] != rc_ref[j]:
            ok = False
            print(f"  {name}[{j}] RC MISMATCH: got {len(rcs[j])}B want "
                  f"{len(rc_ref[j])}B")
            print("   got ", rcs[j][:32].hex())
            print("   want", rc_ref[j][:32].hex())
        if bcs[j] != bc_ref[j]:
            ok = False
            print(f"  {name}[{j}] BC MISMATCH: got {bcs[j][:24].hex()} "
                  f"want {bc_ref[j][:24].hex()}")
    print(f"{name}: {'OK' if ok else 'FAIL'}")
    return ok

names = sys.argv[1:] or list(CASES)
allok = True
for n in names:
    allok &= run_case(n, CASES[n]())
sys.exit(0 if allok else 1)
