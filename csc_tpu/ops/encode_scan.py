"""Batched CSC encoder, phase A: lockstep match-finding + lazy parse.

B independent streams are parsed in lockstep; each loop step executes one
micro-op per stream: a hash-table probe, a 4-byte match-extension chunk, a
SlidePos insertion, or a parser decision.  Output is a token tape per
stream; phase B (encode_bits.py) turns tapes into range-coded bytes.

Exact emulation of csc_mf.cpp (HT2/HT3/HT6 finders, candidate gates,
MTF updates, stride-4 insertion skip) and csc_lz.cpp's lazy parser
(compress_normal, csc_lz.cpp:156-199) for lz_mode 1/2 (levels m1/m2).
The binary-tree finder (m5) and the price-optimal parser (m3/m4) stay on
the golden/host path for now — their pricing reads adaptive probabilities
mid-parse, which couples phases A and B (SURVEY.md §7 hard part #2).

Scope/contract: DT_NORMAL tokens only (filters handled by the driver),
single coder chunk (size <= raw_blocksize), dict >= stream size (no window
wrap, matching the archiver's dict=min(dict,task) rule) — the driver falls
back to golden otherwise.

Window == input: with no wrap the encoder window is exactly the input
buffer, so all byte compares read a static [B, N] array.  4-byte words
(in4) are precomputed so match extension advances 4 bytes per gather.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..constants import MF_DIST_BOUND

MASK32 = 0xFFFFFFFF
HT2_SIZE = 16 * 1024
HT3_SIZE = 64 * 1024
NCAND = 20          # rep0len1 + 4 reps + ht2 + ht3 + 8*ht6 with slack

# token kinds
K_LIT = 0
K_MATCH = 1       # (dist_wire, len_wire) = (dist-5, len-2) of MFUnit coords
K_REP = 2         # (rep_idx, len_wire)
K_REP0L1 = 3
K_END = 5
K_SENT_A = 4      # run-end sentinel marker (host rewrites to a K_SENT token)

# fsm states
E_DONE = 0
E_BLOCK = 1       # sub-block / stream bookkeeping, then probe or finish
E_PREP = 2        # compute hashes for wpos, start rep probes
E_PROBE = 3       # evaluate current probe's candidate / precheck
E_EXT = 4         # 4-byte-per-step match extension
E_DECIDE = 5      # FindMatch best-pick + lazy decision
E_INS = 6         # SlidePos insertion steps

# probe phases within E_PROBE/E_EXT
PH_REP0 = 0       # .. PH_REP3 = 3
PH_HT2 = 4
PH_HT3 = 5
PH_HT6 = 6        # + k in separate reg
PH_DONE = 7

_BOUND = np.zeros(8, np.int32)
for _i, _b in enumerate(MF_DIST_BOUND):
    _BOUND[_i] = _b
_BOUND[7] = 0x7FFFFFFF


def make_encode_state(batch, data, sizes, dict_sizes, hash_bits, hash_width,
                      good_len, lazy, max_tokens, run_ends=None):
    """data: [B, N] u8 (padded); sizes: [B]; per-stream dict/vld ranges.

    run_ends: [B, R] cumulative end offsets of the typed runs inside each
    stream (EncodeNormal is called per run, csc_encoder_main.cpp:35-59);
    a K_END-terminated sentinel token is emitted at each run end.  Default:
    one run spanning the stream.

    hash_bits/hash_width/good_len are shared across the batch (one preset
    per batch; the archiver groups tasks by preset).
    """
    B, N = data.shape
    st = {}
    st["data"] = jnp.asarray(data)
    # 4-byte LE words at every position (padded), for fast extension+hash
    d = data.astype(np.uint32)
    pad = np.zeros((B, 8), np.uint32)
    dd = np.concatenate([d, pad], axis=1)
    in4 = dd[:, :N] | (dd[:, 1:N + 1] << 8) | (dd[:, 2:N + 2] << 16) | (dd[:, 3:N + 3] << 24)
    in2 = dd[:, :N] | (dd[:, 1:N + 1] << 8)
    st["in4"] = jnp.asarray(in4.astype(np.uint32))
    st["in2"] = jnp.asarray(in2.astype(np.uint32))

    z = jnp.zeros(batch, jnp.int32)
    st["size"] = jnp.asarray(np.asarray(sizes, np.int32))
    vld = np.asarray(dict_sizes, np.int32) - 8 * 1024 - 4
    st["vld_rge"] = jnp.asarray(vld)
    st["pos"] = jnp.asarray(vld)          # mf pos_ starts at vld_rge
    st["wpos"] = z                        # window offset = pos - vld_rge
    st["reps"] = jnp.asarray(np.tile(np.asarray(dict_sizes, np.int32)[:, None], (1, 4)))

    st["ht2"] = jnp.zeros((batch, HT2_SIZE), jnp.int32)
    st["ht3"] = jnp.zeros((batch, HT3_SIZE), jnp.int32)
    st["ht6"] = jnp.zeros((batch, hash_width << hash_bits), jnp.int32)

    if run_ends is None:
        run_ends = np.asarray(sizes, np.int32)[:, None]
    st["run_ends"] = jnp.asarray(np.asarray(run_ends, np.int32))
    st["run_idx"] = z
    st["run_end"] = jnp.asarray(np.asarray(run_ends, np.int32)[:, 0])

    st["fsm"] = z + E_BLOCK
    st["blk_off"] = z                     # current 8KB sub-block start
    st["blk_len"] = z
    st["blk_i"] = z                       # i within sub-block
    # probe machinery
    st["phase"] = z
    st["ht6_k"] = z
    st["minlen"] = z
    st["cnt"] = z
    st["dist"] = z                        # 'dist' variable of find_match
    st["cand_len"] = jnp.zeros((batch, NCAND), jnp.int32)
    st["cand_dist"] = jnp.zeros((batch, NCAND), jnp.int32)
    st["h2"] = z
    st["h3"] = z
    st["h6"] = z
    # extension state
    st["ext_dist"] = z                    # current probe distance
    st["ext_len"] = z
    st["ext_climit"] = z
    st["probe_limit"] = z                 # limit arg of this find_match
    # lazy parser
    st["have_u1"] = z
    st["u1_len"] = z
    st["u1_dist"] = z
    st["probe2"] = z                      # current find is the lazy second
    # insertion
    st["ins_base"] = z
    st["ins_i"] = z
    st["ins_len"] = z
    st["ins_limit"] = z
    st["lasth6"] = z
    # token tape
    st["tok_kind"] = jnp.zeros((batch, max_tokens), jnp.int32)
    st["tok_a"] = jnp.zeros((batch, max_tokens), jnp.int32)
    st["tok_b"] = jnp.zeros((batch, max_tokens), jnp.int32)
    st["tok_c"] = jnp.zeros((batch, max_tokens), jnp.int32)
    st["tok_cnt"] = z
    st["done"] = z
    return st, dict(hash_bits=hash_bits, hash_width=hash_width,
                    good_len=good_len, lazy=1 if lazy else 0)


def _gather(tbl, idx):
    return jnp.take_along_axis(tbl, idx[:, None], axis=1)[:, 0]


def _scatter1(tbl, idx, val, mask):
    cur = _gather(tbl, idx)
    return tbl.at[jnp.arange(tbl.shape[0]), idx].set(
        jnp.where(mask, val, cur))



def _mask_lookahead(v2, v4, v2b, rem):
    """Zero hash-lookahead bytes at/after the current 8KB sub-block end:
    the reference window holds only sub-blocks copied so far
    (EncodeNormal, csc_lz.cpp:63-67), so HASH2/3/6 reads past the boundary
    see the zeroed window, not future input."""
    m4 = jnp.select([rem >= 4, rem == 3, rem == 2, rem == 1],
                    [jnp.uint32(0xFFFFFFFF), jnp.uint32(0x00FFFFFF),
                     jnp.uint32(0x0000FFFF), jnp.uint32(0x000000FF)],
                    default=jnp.uint32(0))
    rem2 = rem - 4
    m2b = jnp.select([rem2 >= 2, rem2 == 1],
                     [jnp.uint32(0xFFFF), jnp.uint32(0xFF)],
                     default=jnp.uint32(0))
    m2 = jnp.select([rem >= 2, rem == 1],
                    [jnp.uint32(0xFFFF), jnp.uint32(0xFF)],
                    default=jnp.uint32(0))
    return v2 & m2, v4 & m4, v2b & m2b


def encode_parse_step(st, cfg):
    """One lockstep micro-op of phase A."""
    B = st["fsm"].shape[0]
    fsm = st["fsm"]
    active = st["done"] == 0
    good_len = cfg["good_len"]
    hash_width = cfg["hash_width"]
    hash_bits = cfg["hash_bits"]
    lazy = cfg["lazy"]

    new = dict(st)

    def upd(name, cond, val):
        new[name] = jnp.where(cond, val, new[name])

    wpos = st["wpos"]
    in2 = st["in2"]
    in4 = st["in4"]
    size = st["size"]

    # ---------------- E_BLOCK: run/sub-block/stream bookkeeping -----------
    c = active & (fsm == E_BLOCK)
    need_new = c & (st["blk_i"] >= st["blk_len"])
    nboff = st["blk_off"] + st["blk_len"]
    tape_cols = jnp.arange(st["tok_kind"].shape[1])[None, :]

    # run boundary: emit the block-end sentinel token (csc_lz.cpp:97) and
    # advance to the next run (one run per EncodeNormal call)
    run_done = need_new & (nboff >= st["run_end"]) & (st["blk_len"] > 0)
    upd("tok_kind", run_done[:, None]
        & (tape_cols == st["tok_cnt"][:, None]), K_SENT_A)
    upd("tok_cnt", run_done, st["tok_cnt"] + 1)
    nridx = st["run_idx"] + 1
    upd("run_idx", run_done, nridx)
    upd("run_end", run_done,
        _gather(st["run_ends"], jnp.clip(nridx, 0,
                                         st["run_ends"].shape[1] - 1)))
    upd("blk_off", run_done, nboff)
    upd("blk_len", run_done, 0)
    upd("blk_i", run_done, 0)
    upd("have_u1", run_done, 0)

    fresh = need_new & ~run_done
    stream_end = fresh & (nboff >= size)
    upd("tok_kind", stream_end[:, None]
        & (tape_cols == st["tok_cnt"][:, None]), K_END)
    upd("tok_cnt", stream_end, st["tok_cnt"] + 1)
    upd("done", stream_end, 1)
    upd("fsm", stream_end, E_DONE)
    start_blk = fresh & ~stream_end
    upd("blk_off", start_blk, nboff)
    upd("blk_len", start_blk,
        jnp.minimum(st["run_end"] - nboff, 8 * 1024))
    upd("blk_i", start_blk, 0)
    upd("have_u1", start_blk, 0)         # parser state resets per sub-block
    go_probe = (c & ~need_new) | start_blk
    # decide vs probe: with pending u1, skip the find
    upd("fsm", go_probe & (st["have_u1"] == 1), E_DECIDE)
    upd("fsm", go_probe & (st["have_u1"] == 0), E_PREP)
    upd("probe2", go_probe & (st["have_u1"] == 0), 0)

    # ---------------- E_PREP: hashes + candidate init ---------------------
    c = active & (fsm == E_PREP)
    # probe position: wpos (+1 if this is the lazy second probe)
    ppos = wpos + st["probe2"]
    v2 = _gather(in2, ppos)
    v4 = _gather(in4, ppos)
    v2b = _gather(in2, ppos + 4)
    v2, v4, v2b = _mask_lookahead(v2, v4, v2b,
                                  st["blk_off"] + st["blk_len"] - ppos)
    h2 = ((v2 * 65521) & 0x3FFF).astype(jnp.int32)
    b0 = v2 & 0xFF
    b1 = (v2 >> 8) & 0xFF
    b2 = (v4 >> 16) & 0xFF
    h3 = (((b0 << 8) ^ (b1 << 5) ^ b2) & 0xFFFF).astype(jnp.int32)
    h6full = ((v4 ^ (v2b << 13)) * jnp.uint32(2654435761)) & jnp.uint32(MASK32)
    h6 = (h6full >> (32 - hash_bits)).astype(jnp.int32)
    upd("h2", c, h2)
    upd("h3", c, h3)
    upd("h6", c, h6)
    upd("minlen", c, 1)
    upd("cnt", c, 0)
    upd("dist", c, 0)
    # probe limit: find at wpos: blk_len - blk_i ; second: blk_len-blk_i-1
    upd("probe_limit", c, st["blk_len"] - st["blk_i"] - st["probe2"])
    upd("phase", c, PH_REP0)
    upd("ht6_k", c, 0)
    upd("fsm", c, E_PROBE)

    # ---------------- E_PROBE: candidate select + precheck ----------------
    c = active & (fsm == E_PROBE)
    ph = st["phase"]
    ppos = wpos + st["probe2"]
    dist_u = st["dist"].astype(jnp.uint32)  # 0xFFFFFFFF disable sentinel

    rep_d = _gather(st["reps"], jnp.clip(ph, 0, 3))
    ht2v = _gather(st["ht2"], st["h2"])
    ht3v = _gather(st["ht3"], st["h3"])
    ht6base = st["h6"] * hash_width
    ht6v = _gather(st["ht6"], ht6base + jnp.clip(st["ht6_k"], 0, hash_width - 1))

    is_rep = c & (ph <= 3)
    is_ht2 = c & (ph == PH_HT2)
    is_ht3 = c & (ph == PH_HT3)
    is_ht6 = c & (ph == PH_HT6)
    fin = c & (ph == PH_DONE)

    cand_dist = jnp.select(
        [ph <= 3, ph == PH_HT2, ph == PH_HT3, ph == PH_HT6],
        [rep_d,
         (st["pos"] - ht2v), (st["pos"] - ht3v), (st["pos"] - ht6v)],
        default=jnp.zeros_like(wpos))
    cand_u = cand_dist.astype(jnp.uint32)

    # distance-gate per probe type (csc_mf.cpp:303,334,456)
    gate_ok = jnp.select(
        [ph <= 3, ph == PH_HT2, ph == PH_HT3, ph == PH_HT6],
        [jnp.ones_like(wpos, bool),
         cand_u > dist_u, cand_u > dist_u, cand_u > dist_u],
        default=jnp.zeros_like(wpos, bool))

    vld_ok = cand_u < st["vld_rge"].astype(jnp.uint32)
    # update 'dist' for non-rep probes once gated in (HT2/HT3/HT6 set
    # dist = candidate distance before validity check, csc_mf.cpp:304,335,457)
    upd("dist", (is_ht2 | is_ht3 | is_ht6) & gate_ok, cand_dist)

    # precheck: minlen < climit and byte at minlen matches
    cmp_pos = ppos - cand_dist             # no-wrap contract
    # HT2 strict '>' wraparound quirk (csc_mf.cpp:306): dist == wpos maps
    # cmp_pos past the window end -> climit 0 -> probe aborts
    climit = jnp.where(is_ht2 & (cand_dist == ppos), 0, st["probe_limit"])
    ml = st["minlen"]
    pb = _gather(st["data"], jnp.clip(ppos + ml, 0, st["data"].shape[1] - 1))
    cb = _gather(st["data"], jnp.clip(cmp_pos + ml, 0, st["data"].shape[1] - 1))
    pre_ok = (ml < climit) & (pb == cb)

    do_ext = gate_ok & vld_ok & pre_ok & (is_rep | is_ht2 | is_ht3 | is_ht6)
    upd("ext_dist", do_ext, cand_dist)
    upd("ext_len", do_ext, 0)
    upd("ext_climit", do_ext, climit)
    upd("fsm", do_ext, E_EXT)

    # probe skipped: advance phase
    skip = (is_rep | is_ht2 | is_ht3 | is_ht6) & ~do_ext
    nph = jnp.select(
        [ph <= 3, ph == PH_HT2, ph == PH_HT3],
        [ph + 1,
         jnp.full_like(ph, PH_HT3), jnp.full_like(ph, PH_HT6)],
        default=ph)
    # ht6: next k or done
    nk = st["ht6_k"] + 1
    ht6_more = is_ht6 & (nk < hash_width)
    nph = jnp.where(is_ht6, jnp.where(nk < hash_width, ph, PH_DONE), nph)
    upd("ht6_k", skip & is_ht6, nk)
    upd("phase", skip, nph)
    # rep1..3: skipping phase 3 -> PH_HT2 handled by ph+1==4==PH_HT2

    # ---------------- finish of all probes: table updates + decide --------
    # ht2/ht3 insert + ht6 MTF insert (find_match tail, csc_mf.cpp:365,487-491)
    new["ht2"] = _scatter1(new["ht2"], st["h2"], st["pos"], fin)
    new["ht3"] = _scatter1(new["ht3"], st["h3"], st["pos"], fin)
    # MTF shift of ht6 row (width <= 8)
    if hash_width > 0:
        row_idx = ht6base[:, None] + jnp.arange(hash_width)[None, :]
        row = jnp.take_along_axis(new["ht6"], row_idx, axis=1)
        shifted = jnp.concatenate([st["pos"][:, None], row[:, :hash_width - 1]],
                                  axis=1)
        newrow = jnp.where(fin[:, None], shifted, row)
        new["ht6"] = _scatter_rowvals(new["ht6"], row_idx, newrow)
    upd("pos", fin, st["pos"] + 1)
    upd("fsm", fin, E_DECIDE)

    # ---------------- E_EXT: extend 4 bytes per step ----------------------
    c = active & (fsm == E_EXT)
    ppos = wpos + st["probe2"]
    el = st["ext_len"]
    w1 = _gather(in4, jnp.clip(ppos + el, 0, in4.shape[1] - 1))
    w2 = _gather(in4, jnp.clip(ppos - st["ext_dist"] + el, 0, in4.shape[1] - 1))
    x = w1 ^ w2
    # bytes equal count within this word (little-endian trailing bytes)
    eq = jnp.where(x == 0, 4,
                   jnp.where((x & 0xFF) != 0, 0,
                             jnp.where((x & 0xFFFF) != 0, 1,
                                       jnp.where((x & 0xFFFFFF) != 0, 2, 3))))
    rem = st["ext_climit"] - el
    adv = jnp.minimum(eq, rem)
    nel = el + adv
    cont = c & (eq == 4) & (adv == 4) & (nel < st["ext_climit"])
    upd("ext_len", c, nel)
    ext_done = c & ~cont

    # candidate disposition (mirrors per-probe logic in csc_mf.cpp)
    ml = st["minlen"]
    ph = st["phase"]
    match_len = nel
    is_rep = ph <= 3
    bound = jnp.asarray(_BOUND)[jnp.clip(match_len, 0, 7)]
    # record rep0len1 (csc_mf.cpp:281-287)
    rec_r01 = ext_done & is_rep & (ph == 0) & (match_len > 0)
    tpos = jnp.clip(st["cnt"], 0, NCAND - 1)
    new["cand_len"] = _scatter1(new["cand_len"], tpos, 1, rec_r01)
    new["cand_dist"] = _scatter1(new["cand_dist"], tpos, 1, rec_r01)
    upd("cnt", rec_r01 & (st["cnt"] + 2 < NCAND), st["cnt"] + 1)

    better = ext_done & (match_len > ml)
    gate = (match_len > 6) | (st["ext_dist"] < bound)  # non-rep len/dist gate
    rec = better & (is_rep | gate)
    upd("minlen", better, match_len)
    tpos = jnp.clip(new["cnt"], 0, NCAND - 1)
    cd = jnp.where(is_rep, ph + 1, st["ext_dist"] + 4)
    new["cand_len"] = _scatter1(new["cand_len"], tpos, match_len, rec)
    new["cand_dist"] = _scatter1(new["cand_dist"], tpos, cd, rec)
    upd("cnt", rec & (new["cnt"] + 2 < NCAND), new["cnt"] + 1)

    gl_exit = better & (match_len >= good_len)
    upd("dist", gl_exit, -1)  # 0xFFFFFFFF as int32

    # advance probe phase after extension completes
    nph2 = jnp.select(
        [is_rep, ph == PH_HT2, ph == PH_HT3],
        [ph + 1, jnp.full_like(ph, PH_HT3), jnp.full_like(ph, PH_HT6)],
        default=ph)
    nk = st["ht6_k"] + 1
    nph2 = jnp.where(ph == PH_HT6,
                     jnp.where(nk < hash_width, ph, PH_DONE), nph2)
    upd("ht6_k", ext_done & (ph == PH_HT6), nk)
    # good_len early exit: skip to PH_DONE for rep probes; for ht probes the
    # dist sentinel disables subsequent gates (csc_mf.cpp:294-298)
    nph2 = jnp.where(gl_exit & is_rep, jnp.full_like(ph, PH_HT2), nph2)
    upd("phase", ext_done, nph2)
    upd("fsm", ext_done, E_PROBE)

    # ---------------- E_DECIDE: best-pick + lazy logic --------------------
    c = active & (fsm == E_DECIDE)
    # FindMatch best (csc_mf.cpp:497-524) over candidate list
    u_len, u_dist = _best_candidate(st, new, c)

    probe2 = st["probe2"] == 1
    # ----- first find result (or pending u1)
    first = c & ~probe2
    u1_len = jnp.where(st["have_u1"] == 1, st["u1_len"], u_len)
    u1_dist = jnp.where(st["have_u1"] == 1, st["u1_dist"], u_dist)

    take_now = first & ((u1_len == 1) | (lazy == 0) | (u1_len >= good_len))
    # emit token for u1 and slide
    emit1 = take_now
    _emit_token(new, st, emit1, u1_len, u1_dist, wpos)
    upd("ins_base", emit1, wpos)
    upd("ins_i", emit1, 1)
    upd("ins_len", emit1, u1_len)
    upd("ins_limit", emit1, st["blk_len"] - st["blk_i"])
    upd("lasth6", emit1, 0)
    upd("blk_i", emit1, st["blk_i"] + u1_len)
    upd("wpos", emit1, wpos + u1_len)
    upd("have_u1", emit1, 0)
    upd("fsm", emit1, E_INS)

    # need second probe
    go2 = first & ~take_now
    upd("u1_len", go2, u1_len)
    upd("u1_dist", go2, u1_dist)
    upd("probe2", go2, 1)
    upd("fsm", go2, E_PREP)

    # ----- second find result: SecondMatchBetter
    second = c & probe2
    smb = _second_better(st["u1_len"], st["u1_dist"], u_len, u_dist)
    # literal chosen; u1 <- u2
    lit = second & smb
    _emit_token(new, st, lit, jnp.ones_like(u_len), jnp.zeros_like(u_dist), wpos)
    upd("blk_i", lit, st["blk_i"] + 1)
    upd("wpos", lit, wpos + 1)
    upd("u1_len", lit, u_len)
    upd("u1_dist", lit, u_dist)
    upd("have_u1", lit, 1)
    upd("probe2", lit, 0)
    upd("fsm", lit, E_BLOCK)

    # match u1 chosen; slide from wpos+1 over len-1 (pos at wpos+1 already
    # inserted by the second find)
    mt = second & ~smb
    _emit_token(new, st, mt, st["u1_len"], st["u1_dist"], wpos)
    upd("ins_base", mt, wpos + 1)
    upd("ins_i", mt, 1)
    upd("ins_len", mt, st["u1_len"] - 1)
    upd("ins_limit", mt, st["blk_len"] - st["blk_i"] - 1)
    upd("lasth6", mt, 0)
    upd("blk_i", mt, st["blk_i"] + st["u1_len"])
    upd("wpos", mt, wpos + st["u1_len"])
    upd("have_u1", mt, 0)
    upd("probe2", mt, 0)
    upd("fsm", mt, E_INS)

    # ---------------- E_INS: SlidePos insertion ---------------------------
    c = active & (fsm == E_INS)
    ins_done = c & (st["ins_i"] >= st["ins_len"])
    upd("fsm", ins_done, E_BLOCK)
    ins = c & ~ins_done
    ipos = st["ins_base"] + st["ins_i"]
    v2 = _gather(in2, jnp.clip(ipos, 0, in2.shape[1] - 1))
    v4 = _gather(in4, jnp.clip(ipos, 0, in4.shape[1] - 1))
    v2b = _gather(in2, jnp.clip(ipos + 4, 0, in2.shape[1] - 1))
    v2, v4, v2b = _mask_lookahead(v2, v4, v2b,
                                  st["blk_off"] + st["blk_len"] - ipos)
    h2 = ((v2 * 65521) & 0x3FFF).astype(jnp.int32)
    b0 = v2 & 0xFF
    b1 = (v2 >> 8) & 0xFF
    b2 = (v4 >> 16) & 0xFF
    h3 = (((b0 << 8) ^ (b1 << 5) ^ b2) & 0xFFFF).astype(jnp.int32)
    new["ht2"] = _scatter1(new["ht2"], h2, st["pos"], ins)
    new["ht3"] = _scatter1(new["ht3"], h3, st["pos"], ins)
    # stride-4 fast path (csc_mf.cpp:145): skip ht6 while i+128 < len
    fast = ins & (st["ins_i"] + 128 < st["ins_len"])
    upd("ins_i", fast, st["ins_i"] + 4)
    upd("pos", fast, st["pos"] + 4)
    slow = ins & ~fast
    if hash_width > 0:
        h6full = ((v4 ^ (v2b << 13)) * jnp.uint32(2654435761)) & jnp.uint32(MASK32)
        h6 = (h6full >> (32 - hash_bits)).astype(jnp.int32)
        base = h6 * hash_width
        row_idx = base[:, None] + jnp.arange(hash_width)[None, :]
        row = jnp.take_along_axis(new["ht6"], row_idx, axis=1)
        do_shift = slow & (h6 != st["lasth6"])
        shifted = jnp.concatenate([row[:, :1], row[:, :hash_width - 1]], axis=1)
        row2 = jnp.where(do_shift[:, None], shifted, row)
        row2 = jnp.where(slow[:, None],
                         jnp.concatenate([st["pos"][:, None], row2[:, 1:]], axis=1),
                         row2)
        new["ht6"] = _scatter_rowvals(new["ht6"], row_idx, row2)
        upd("lasth6", slow, h6)
    upd("ins_i", slow, st["ins_i"] + 1)
    upd("pos", slow, st["pos"] + 1)

    return new


def _scatter_rowvals(tbl, row_idx, vals):
    """tbl[b, row_idx[b, k]] = vals[b, k]."""
    B, W = tbl.shape
    rows = jnp.broadcast_to(jnp.arange(B)[:, None], row_idx.shape)
    flat = rows * W + row_idx
    return tbl.reshape(-1).at[flat.reshape(-1)].set(
        vals.reshape(-1)).reshape(B, W)


def _second_better(l1, d1, l2, d2):
    # SecondMatchBetter, csc_mf.cpp:570-582
    cof = jnp.asarray(np.array([0, 4, 8, 12], np.int32))
    diff21 = jnp.clip(l2 - l1, 0, 3)
    diff12 = jnp.clip(l1 - l2, 0, 3)
    cond = (l2 > 1) & (
        (l2 > l1 + 3)
        | ((l2 > l1) & (d2 <= 4))
        | ((l2 + 2 > l1) & (d2 <= 4) & (d1 > 4))
        | ((l2 >= l1) & ((d2 >> cof[diff21]) <= d1))
        | ((l2 < l1) & (l2 + 2 >= l1) & (d1 > 4) & ((d1 >> cof[diff12]) > d2)))
    return cond


def _best_candidate(st, new, mask):
    """FindMatch pick loop (csc_mf.cpp:497-524) over the candidate arrays."""
    cl = new["cand_len"]
    cd = new["cand_dist"]
    n = new["cnt"]
    best_len = jnp.ones_like(n)
    best_dist = jnp.zeros_like(n)
    have = jnp.zeros_like(n, dtype=bool)

    def body(i, carry):
        bl, bd, hv = carry
        valid = i < n
        l2 = cl[:, i]
        d2 = cd[:, i]
        take_first = valid & ~hv
        rep = valid & hv & _second_better(bl, bd, l2, d2)
        take = take_first | rep
        bl = jnp.where(take, l2, bl)
        bd = jnp.where(take, d2, bd)
        hv = hv | take_first
        return bl, bd, hv

    for i in range(NCAND):
        best_len, best_dist, have = body(i, (best_len, best_dist, have))
    return best_len, best_dist


def _emit_token(new, st, mask, u_len, u_dist, wpos):
    """Append one parsed token (encode_nonlit coords, csc_lz.cpp:127-154)
    and maintain the rep-distance queue."""
    tape_w = new["tok_kind"].shape[1]
    tpos = jnp.clip(st["tok_cnt"], 0, tape_w - 1)
    is_lit = u_dist == 0
    is_r01 = (u_dist == 1) & (u_len == 1)
    is_rep = (u_dist <= 4) & ~is_lit & ~is_r01
    is_match = u_dist > 4

    lit_byte = _gather(st["data"], jnp.clip(wpos, 0, st["data"].shape[1] - 1))
    kind = jnp.select([is_lit, is_r01, is_rep, is_match],
                      [K_LIT, K_REP0L1, K_REP, K_MATCH], default=0)
    a = jnp.select([is_lit, is_r01, is_rep, is_match],
                   [lit_byte.astype(jnp.int32), jnp.zeros_like(u_len),
                    u_dist - 1, u_dist - 5],
                   default=jnp.zeros_like(u_len))
    b = jnp.select([is_rep, is_match],
                   [u_len - 2, u_len - 2], default=jnp.zeros_like(u_len))

    # post-token literal context: SetLiteralCtx(last match byte)
    # (compress_normal, csc_lz.cpp:172,192)
    last_byte = _gather(st["data"],
                        jnp.clip(wpos + u_len - 1, 0,
                                 st["data"].shape[1] - 1)).astype(jnp.int32)
    new["tok_kind"] = _scatter1(new["tok_kind"], tpos, kind, mask)
    new["tok_a"] = _scatter1(new["tok_a"], tpos, a, mask)
    new["tok_b"] = _scatter1(new["tok_b"], tpos, b, mask)
    new["tok_c"] = _scatter1(new["tok_c"], tpos, last_byte, mask)
    new["tok_cnt"] = jnp.where(mask, st["tok_cnt"] + 1, new["tok_cnt"])

    # rep queue update (encode_nonlit):
    reps = new["reps"]
    rd = jnp.take_along_axis(reps, jnp.clip(u_dist - 1, 0, 3)[:, None], axis=1)[:, 0]
    rot = jnp.where(jnp.arange(4)[None, :] <= (u_dist - 1)[:, None],
                    jnp.concatenate([rd[:, None], reps[:, :3]], axis=1), reps)
    push = jnp.concatenate([(u_dist - 4)[:, None], reps[:, :3]], axis=1)
    reps2 = jnp.where((mask & is_rep)[:, None], rot, reps)
    reps2 = jnp.where((mask & is_match)[:, None], push, reps2)
    new["reps"] = reps2


def run_parse(st, cfg, max_steps):
    def cond(carry):
        s, i = carry
        return (i < max_steps) & ~jnp.all(s["done"] == 1)

    def body(carry):
        s, i = carry
        return encode_parse_step(s, cfg), i + 1

    final, steps = jax.lax.while_loop(cond, body, (st, jnp.int32(0)))
    return final, steps
