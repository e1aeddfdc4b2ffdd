"""Content-type preprocessors: E89 (x86 call-target), English dictionary,
channel delta.  Mirrors csc_filters.cpp.

All transforms operate in place on a bytearray, like the reference.
"""

# 123-word hardcoded list (csc_filters.cpp:6-35).  Index 0 is the empty word.
WORD_LIST = (
    "",
    "ac", "ad", "ai", "al", "am",
    "an", "ar", "as", "at", "ea",
    "ec", "ed", "ee", "el", "en",
    "er", "es", "et", "id", "ie",
    "ig", "il", "in", "io", "is",
    "it", "of", "ol", "on", "oo",
    "or", "os", "ou", "ow", "ul",
    "un", "ur", "us", "ba", "be",
    "ca", "ce", "co", "ch", "de",
    "di", "ge", "gh", "ha", "he",
    "hi", "ho", "ra", "re", "ri",
    "ro", "rs", "la", "le", "li",
    "lo", "ld", "ll", "ly", "se",
    "si", "so", "sh", "ss", "st",
    "ma", "me", "mi", "ne", "nc",
    "nd", "ng", "nt", "pa", "pe",
    "ta", "te", "ti", "to", "th",
    "tr", "wa", "ve",
    "all", "and", "but", "dow",
    "for", "had", "hav", "her",
    "him", "his", "man", "mor",
    "not", "now", "one", "out",
    "she", "the", "was", "wer",
    "whi", "whe", "wit", "you",
    "any", "are",
    "that", "said", "with", "have",
    "this", "from", "were", "tion",
)


def _make_word_tree():
    # MakeWordTree, csc_filters.cpp:87-111.  Trie over 'a'-'z'; symbols from
    # 0x82 assigned in word-list order.
    tree = [{"next": {}, "symbol": 0}]
    word_index = [0] * 256
    symbol = 0x82
    for wi in range(1, len(WORD_LIST)):
        pos = 0
        for ch in WORD_LIST[wi]:
            idx = ord(ch) - ord('a')
            nxt = tree[pos]["next"].get(idx)
            if nxt is None:
                tree.append({"next": {}, "symbol": 0})
                tree[pos]["next"][idx] = len(tree) - 1
                pos = len(tree) - 1
            else:
                pos = nxt
        word_index[symbol] = wi
        tree[pos]["symbol"] = symbol
        symbol += 1
    return tree, word_index, symbol


_WORD_TREE, _WORD_INDEX, MAX_SYMBOL = _make_word_tree()
_WORD_BYTES = [w.encode() for w in WORD_LIST]


def forward_dict(src: bytearray, size: int) -> bool:
    """Foward_Dict (sic), csc_filters.cpp:256-335.

    Returns True and rewrites src in place (padded with 0x20 to keep size)
    when the substituted form shrinks below 82% of the original; otherwise
    leaves src untouched and returns False.
    """
    if size < 16384:
        return False
    dst = bytearray()
    tree = _WORD_TREE
    i = 0
    while i < size - 5:
        if len(dst) > size - 16:
            return False
        c = src[i]
        if ord('a') <= c <= ord('z'):
            match_symbol = 0
            longest = 0
            pos = 0
            j = 0
            while True:
                idx = src[i + j] - ord('a')
                nxt = tree[pos]["next"].get(idx) if 0 <= idx <= 25 else None
                if nxt is None:
                    break
                pos = nxt
                j += 1
                if tree[pos]["symbol"]:
                    match_symbol = tree[pos]["symbol"]
                    longest = j
            if match_symbol:
                dst.append(match_symbol)
                i += longest
                continue
            dst.append(c)
            i += 1
        else:
            if c >= 0x82:
                dst.append(254)
                dst.append(c)
            else:
                dst.append(c)
            i += 1
    while i < size:
        c = src[i]
        if c >= 0x82:
            dst.append(254)
            dst.append(c)
        else:
            dst.append(c)
        i += 1
    if len(dst) > size * 0.82:
        return False
    dst += b'\x20' * (size - len(dst))
    src[:size] = dst
    return True


def inverse_dict(src: bytearray, size: int) -> None:
    # Inverse_Dict, csc_filters.cpp:337-368
    dst = bytearray()
    i = 0
    while len(dst) < size:
        c = src[i]
        if 0x82 <= c < MAX_SYMBOL:
            w = _WORD_BYTES[_WORD_INDEX[c]]
            room = size - len(dst)
            dst += w[:room]
        elif c == 254 and i + 1 < size and src[i + 1] >= 0x82:
            i += 1
            dst.append(src[i])
        else:
            dst.append(c)
        i += 1
    src[:size] = dst[:size]


def forward_delta(src: bytearray, size: int, chn: int) -> None:
    # Forward_Delta, csc_filters.cpp:132-164: channel de-interleave +
    # per-byte delta with a single running prev byte across channels.
    if size < 512:
        return
    orig = bytes(src[:size])
    dst_pos = 0
    prev = 0
    for i in range(chn):
        for j in range(i, size, chn):
            src[dst_pos] = (orig[j] - prev) & 0xFF
            prev = orig[j]
            dst_pos += 1


def inverse_delta(src: bytearray, size: int, chn: int) -> None:
    # Inverse_Delta, csc_filters.cpp:371-398
    if size < 512:
        return
    packed = bytes(src[:size])
    pos = 0
    prev = 0
    for i in range(chn):
        for j in range(i, size, chn):
            src[j] = (packed[pos] + prev) & 0xFF
            prev = src[j]
            pos += 1


class E89:
    """Shelwien's x86 E8/E9 call-target transform (csc_filters.cpp:508-585).

    Byte FSM with a 5-byte lookahead cache; converts absolute call targets to
    position-relative form (forward) and back (inverse).
    """

    def __init__(self):
        self.init()

    def init(self):
        self.cs = 0xFF
        self.x0 = 0
        self.x1 = 0
        self.i = 0
        self.k = 5

    def _cache_byte(self, c):
        d = -1 if (self.cs & 0x80) else (self.x1 & 0xFF)
        self.x1 = ((self.x1 >> 8) | (self.x0 << 24)) & 0xFFFFFFFF
        self.x0 = ((self.x0 >> 8) | (c << 24)) & 0xFFFFFFFF
        self.cs = (self.cs << 1) & 0xFF
        self.i += 1
        return d

    @staticmethod
    def _xswap(x):
        x = (x << 7) & 0xFFFFFFFF
        return ((x >> 24) | (((x >> 16) & 0xFF) << 8)
                | (((x >> 8) & 0xFF) << 16) | ((x & 0xFF) << (24 - 7))) & 0xFFFFFFFF

    @staticmethod
    def _yswap(x):
        x = ((((x >> 24) & 0xFF) << 7) | (((x >> 16) & 0xFF) << 8)
             | (((x >> 8) & 0xFF) << 16) | ((x << 24) & 0xFFFFFFFF)) & 0xFFFFFFFF
        return x >> 7

    def _forward(self, c):
        if self.i >= self.k:
            if (self.x1 & 0xFE000000) == 0xE8000000:
                self.k = self.i + 4
                x = (self.x0 - 0xFF000000) & 0xFFFFFFFF
                if x < 0x02000000:
                    x = (x + self.i) & 0x01FFFFFF
                    x = self._xswap(x)
                    self.x0 = (x + 0xFF000000) & 0xFFFFFFFF
        return self._cache_byte(c)

    def _inverse(self, c):
        if self.i >= self.k:
            if (self.x1 & 0xFE000000) == 0xE8000000:
                self.k = self.i + 4
                x = (self.x0 - 0xFF000000) & 0xFFFFFFFF
                if x < 0x02000000:
                    x = self._yswap(x)
                    x = (x - self.i) & 0x01FFFFFF
                    self.x0 = (x + 0xFF000000) & 0xFFFFFFFF
        return self._cache_byte(c)

    def _flush(self):
        if self.cs != 0xFF:
            while self.cs & 0x80:
                self._cache_byte(0)
                self.cs = (self.cs + 1) & 0xFF
            d = self._cache_byte(0)
            self.cs = (self.cs + 1) & 0xFF
            return d
        self.init()
        return -1

    def _run(self, src, size, step):
        j = 0
        self.init()
        for i in range(size):
            c = step(src[i])
            if c >= 0:
                src[j] = c
                j += 1
        while True:
            c = self._flush()
            if c < 0:
                break
            src[j] = c
            j += 1


def forward_e89(src: bytearray, size: int) -> None:
    # Forward_E89, csc_filters.cpp:588-598
    f = E89()
    f._run(src, size, f._forward)


def inverse_e89(src: bytearray, size: int) -> None:
    # Inverse_E89, csc_filters.cpp:600-610
    f = E89()
    f._run(src, size, f._inverse)
