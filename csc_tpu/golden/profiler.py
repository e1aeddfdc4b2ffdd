"""Token-stream statistics (the reference's compile-time profiler,
csc_profiler.{h,cpp}, enabled there with -D_HAVE_PROFILER_).

Enable with CSC_PROFILE=1 in the environment or `enable()`; counters
accumulate per process and `write_log()` prints the summary the same way
PWriteLog does on Model::Destroy (csc_model.cpp:84).
"""
import os
import sys

enabled = bool(int(os.environ.get("CSC_PROFILE", "0")))

counters = {
    "literals": 0,
    "matches": 0,
    "rep_matches": 0,
    "rep0len1": 0,
    "match_len_hist": [0] * 32,
    "match_bytes": 0,
    "literal_bytes": 0,
}


def enable():
    global enabled
    enabled = True


def on_literal(c):
    counters["literals"] += 1
    counters["literal_bytes"] += 1


def on_match(dist, length):
    counters["matches"] += 1
    counters["match_bytes"] += length + 2
    counters["match_len_hist"][min(length, 31)] += 1


def on_rep_match(idx, length):
    counters["rep_matches"] += 1
    counters["match_bytes"] += length + 2
    counters["match_len_hist"][min(length, 31)] += 1


def on_rep0len1():
    counters["rep0len1"] += 1
    counters["match_bytes"] += 1


def write_log(stream=None):
    stream = stream or sys.stderr
    c = counters
    total = c["literal_bytes"] + c["match_bytes"]
    stream.write(
        "csc profile: %d literals, %d matches, %d rep matches, %d rep0len1; "
        "%d bytes from matches / %d total (%.1f%%)\n"
        % (c["literals"], c["matches"], c["rep_matches"], c["rep0len1"],
           c["match_bytes"], total,
           100.0 * c["match_bytes"] / total if total else 0.0))
    stream.write("match len hist (wire len 0..31+): %s\n"
                 % c["match_len_hist"])


def reset():
    counters.update(literals=0, matches=0, rep_matches=0, rep0len1=0,
                    match_bytes=0, literal_bytes=0,
                    match_len_hist=[0] * 32)
