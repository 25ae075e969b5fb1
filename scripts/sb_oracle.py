#!/usr/bin/env python3
"""Offline Snowball oracle: stems words with the system libstemmer
(Debian libstemmer0d, generated from the published snowballstem.org
algorithms). Used ONLY to derive golden test vectors for the Scala
stemmers -- no Snowball code is copied.

Usage: sb_oracle.py <algorithm> [words...]   (or words on stdin)
"""
import ctypes, sys

lib = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libstemmer.so.0d")
lib.sb_stemmer_new.restype = ctypes.c_void_p
lib.sb_stemmer_new.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
lib.sb_stemmer_stem.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.sb_stemmer_stem.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
lib.sb_stemmer_length.restype = ctypes.c_int
lib.sb_stemmer_length.argtypes = [ctypes.c_void_p]
lib.sb_stemmer_delete.argtypes = [ctypes.c_void_p]

def make(alg):
    st = lib.sb_stemmer_new(alg.encode(), None)
    if not st:
        raise SystemExit(f"unknown algorithm {alg}")
    return st

def stem(st, word):
    b = word.encode("utf-8")
    res = lib.sb_stemmer_stem(st, b, len(b))
    n = lib.sb_stemmer_length(st)
    return bytes(res[:n]).decode("utf-8")

if __name__ == "__main__":
    alg = sys.argv[1]
    st = make(alg)
    words = sys.argv[2:] or [w.strip() for w in sys.stdin if w.strip()]
    for w in words:
        print(f"{w}\t{stem(st, w)}")
