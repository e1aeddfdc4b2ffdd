"""Stream-format constants shared by the golden codec and the TPU kernels.

Mirrors csc_typedef.h:7-40 and the slot tables in csc_model.cpp:45-62.
"""

KB = 1024
MB = 1024 * 1024

MIN_BLOCK_SIZE = 8 * KB          # csc_typedef.h:9
MAX_DICT_SIZE = 1024 * MB        # csc_typedef.h:12
MIN_DICT_SIZE = 32 * KB          # csc_typedef.h:13

# Block types (csc_typedef.h:20-40)
DT_NONE = 0x00
DT_NORMAL = 0x01
DT_ENGTXT = 0x02
DT_EXE = 0x03
DT_FAST = 0x04
DT_NO_LZ = 0x05
DT_ENTROPY = 0x07
DT_BAD = 0x08
SIG_EOF = 0x09
DT_DLT = 0x10
DLT_CHANNEL_MAX = 5
DLT_INDEX = (1, 2, 3, 4, 8)      # csc_typedef.h:36
DT_SKIP = 0x1E
DT_MAXINVALID = 0x1F

# Error codes (csc_common.h:13-15)
DECODE_ERROR = -96
WRITE_ERROR = -97
READ_ERROR = -98

CSC_PROP_SIZE = 10               # csc_common.h:11

# Match-distance slot base table (csc_model.cpp:45-55 / csc_dec.cpp:44-54).
# slot s covers distances [dist_table[s], dist_table[s+1]).
DIST_TABLE = (
    0, 1, 2, 3,
    5, 9, 17, 33,
    65, 129, 257, 513,
    1025, 2049, 4097, 8193,
    16385, 32769, 65537, 131073,
    262145, 524289, 1048577, 2097153,
    4194305, 8388609, 16777217, 33554433,
    67108865, 134217729, 268435457, 536870913,
    1073741825,
)

# Bit-reversal of a 4-bit value (csc_model.cpp:57-62).
REV16_TABLE = (0, 8, 4, 12, 2, 10, 6, 14, 1, 9, 5, 13, 3, 11, 7, 15)

# Probability model geometry (csc_model.h:84-122):
PROB_INIT = 2048                 # 12-bit probability, initial value
PROB_ADAPT_SHIFT = 5

# Minimum-length-vs-distance gates for the match finder (csc_mf.cpp:245)
MF_DIST_BOUND = (0, 0, 64, 1024, 16 * KB, 256 * KB, 4 * MB)
MF_CAND_LIMIT = 32               # csc_mf.h:34

# Archiver constants (csarc.cpp:580-599)
CSA_MAGIC = b"CSA\x20"           # 'C''S''A' + version byte 0x20? see archiver/
