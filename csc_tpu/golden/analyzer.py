"""Per-8KB block content classification.  Mirrors csc_analyzer.cpp.

Order-0 entropy via an integer-truncated log table; English-text, EXE,
low-entropy, delta-channel and incompressible heuristics.  All arithmetic
follows the reference's uint32 truncation exactly.
"""
import math

from ..constants import (MIN_BLOCK_SIZE, DT_SKIP, DT_ENGTXT, DT_EXE,
                         DT_ENTROPY, DT_NORMAL, DT_DLT, DT_BAD, DT_FAST,
                         DLT_CHANNEL_MAX)

# logTable, csc_analyzer.cpp:9-15: uint32 truncation of 100*log2(16i+8),
# with the last entry = 100*log2(8192).
_LOG_TABLE = [int(100.0 * math.log(i * 16 + 8) / math.log(2.0))
              for i in range(MIN_BLOCK_SIZE >> 4)]
_LOG_TABLE.append(int(100.0 * math.log(MIN_BLOCK_SIZE) / math.log(2.0)))


def _entropy_from_freq(freqs, size):
    entropy = size * _LOG_TABLE[size >> 4]
    for f in freqs:
        if f:
            entropy -= f * _LOG_TABLE[f >> 4]
    return entropy


def get_channel_idx(src, size):
    # get_channel_idx, csc_analyzer.cpp:122-164
    strides = (1, 2, 3, 4, 8)
    same = [0] * DLT_CHANNEL_MAX
    succ = [0] * DLT_CHANNEL_MAX
    for i in range(max(0, size - 16)):
        b = src[i]
        for k, st in enumerate(strides):
            c = src[i + st]
            if b == c:
                same[k] += 1
            succ[k] += abs(b - c)
    min_same = min(same)
    max_succ = max(succ)
    best = 0
    min_succ = succ[0]
    for i in range(DLT_CHANNEL_MAX):
        if succ[i] < min_succ:
            min_succ = succ[i]
            best = i
    if (((max_succ > succ[best] * 4) or (max_succ > succ[best] + 40 * size))
            and same[best] > min_same * 3
            and same[0] < 0.3 * size):
        return best
    return -1


def get_dlt_bpb(src, size, chn):
    # GetDltBpb, csc_analyzer.cpp:166-182 — order-0 bits/byte after delta
    freq = [0] * 256
    prev = 0
    for i in range(chn):
        for j in range(i, size, chn):
            freq[(src[j] - prev) & 0xFF] += 1
            prev = src[j]
    bpb = size * _LOG_TABLE[size >> 4]
    for f in freq:
        bpb -= f * _LOG_TABLE[f >> 4]
    return (bpb & 0xFFFFFFFF) // size


def analyze(src, size):
    """Returns (block_type, bpb).  Analyze, csc_analyzer.cpp:184-239."""
    if size > MIN_BLOCK_SIZE:
        size = MIN_BLOCK_SIZE
    if size < 512:
        return DT_SKIP, 0

    freq = [0] * 256
    for i in range(size):
        freq[src[i]] += 1

    diff_num = sum(1 for f in freq if f > 0)
    entropy = _entropy_from_freq(freq, size) & 0xFFFFFFFF
    bpb = entropy // size
    avg_freq = size >> 8

    alpha_num = sum(freq[i] for i in range(ord('a'), ord('z') + 1))
    freq_hi = sum(freq[128:])

    if (freq_hi < (size >> 3)
            and (freq[ord(' ')] + freq[ord('\n')] + freq[ord(':')]
                 + freq[ord('.')] + freq[ord('/')]) > (size >> 4)
            and (freq[ord('a')] + freq[ord('e')] + freq[ord('t')]) > (size >> 4)
            and entropy > 300 * size
            and alpha_num > size // 3):
        return DT_ENGTXT, bpb

    if freq[0x8B] > avg_freq and freq[0x00] > avg_freq * 2 and freq[0xE8] > 6:
        return DT_EXE, bpb

    if (diff_num < 16 and diff_num >= 6
            and entropy > (math.log(diff_num - 2) / math.log(2.0) - 0.6) * 100.0 * size):
        return DT_ENTROPY, bpb

    if entropy < 400 * size and diff_num < 200:
        return DT_NORMAL, bpb

    dlt_idx = get_channel_idx(src, size)
    if dlt_idx != -1:
        return DT_DLT + dlt_idx, bpb

    if entropy > 795 * size:
        return DT_BAD, bpb
    if entropy > 780 * size:
        return DT_FAST, bpb
    return DT_NORMAL, bpb
