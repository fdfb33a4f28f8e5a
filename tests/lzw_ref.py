"""Shared reference TIFF-LZW encoder for decoder tests.

libtiff "early change" semantics, verified byte-for-byte against a
PIL/libtiff-written stream: the encoder widens the code width when its
next free code reaches 1<<nbits (so the decoder, whose table lags by one
entry, widens at table size (1<<nbits)-1). One copy — the encoder's
widen point used to live in two test files and both carried the same
off-by-one that masked a real decoder bug (test_dataprep.py's LZW golden
against a PIL-written file now pins the truth).
"""
import numpy as np


def lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    table = {bytes([i]): i for i in range(256)}
    next_code, nbits = 258, 9
    bits = [(CLEAR, nbits)]
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table or len(wc) == 1:
            w = wc
        else:
            bits.append((table[w], nbits))
            table[wc] = next_code
            next_code += 1
            if next_code == (1 << nbits):  # libtiff early change
                nbits += 1
            if next_code >= 4094:
                bits.append((CLEAR, nbits))
                table = {bytes([i]): i for i in range(256)}
                next_code, nbits = 258, 9
            w = bytes([ch])
    if w:
        bits.append((table[w], nbits))
    bits.append((EOI, nbits))
    acc, accn, out = 0, 0, bytearray()
    for code, nb in bits:
        acc = (acc << nb) | code
        accn += nb
        while accn >= 8:
            accn -= 8
            out.append((acc >> accn) & 0xFF)
    if accn:
        out.append((acc << (8 - accn)) & 0xFF)
    return bytes(out)
