"""Text primitives shared by the pipeline operators (dedup, langid,
quality, fingerprinting).

Everything is engine-portable integer arithmetic: a word hashes from
its first two characters + length (ascii() is identical in Spark and
DuckDB for the ASCII corpus), shingles combine adjacent word hashes,
minhash permutations are multiply-add mod 2^31-1.  No Python UDFs —
all expressions stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .. import constants as C


def words(text: Column) -> Column:
    return F.split(text, " ")


def word_hash(w: Column) -> Column:
    """wh = ascii(c1)*131 + ascii(c2)*7 + len — cheap, portable,
    collision-tolerant (dedup verifies with exact set overlap)."""
    padded = F.concat(w, F.lit("_"))
    return (F.ascii(F.substring(padded, 1, 1)) * C.WORDHASH_P1
            + F.ascii(F.substring(padded, 2, 1)) * C.WORDHASH_P2
            + F.length(w)).cast("long")


def word_hash_sql(w: str) -> str:
    return (f"(ascii(substr({w} || '_', 1, 1)) * {C.WORDHASH_P1}"
            f" + ascii(substr({w} || '_', 2, 1)) * {C.WORDHASH_P2}"
            f" + length({w}))")


def shingle_hash(wh1: Column, wh2: Column) -> Column:
    return (wh1 * C.SHINGLE_MUL + wh2) % C.P31


def shingle_hash_sql(wh1: str, wh2: str) -> str:
    return f"((({wh1}) * {C.SHINGLE_MUL} + ({wh2})) % {C.P31})"


def minhash(sh: Column, a: int, b: int) -> Column:
    return (sh * a + b) % C.P31


def minhash_sql(sh: str, a: int, b: int) -> str:
    return f"((({sh}) * {a} + {b}) % {C.P31})"
