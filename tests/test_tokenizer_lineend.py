"""Native tokenizer line-ending semantics.

The tokenizer takes a memchr('\n') fast path when a chunk contains no
'\r' byte and falls back to the two-terminator scan otherwise
(reference line semantics: lines end at \n, \r, or \r\n —
/root/reference/src/fastqreader.cpp:219-260).  Both paths must parse the
same records.
"""
import numpy as np
import pytest

from fastp_tpu.io import native as native_mod


RECORDS = [
    (b"@r1 some name", b"ACGTACGTAC", b"+", b"FFFFFFFFFF"),
    (b"@r2", b"GGGACGTT", b"+strand", b"!!!!!!!!"),
    (b"@r3 x", b"A" * 37, b"+", b"I" * 37),
]


def _encode(eol: bytes, final_eol: bool) -> bytes:
    blob = b""
    for name, seq, strand, qual in RECORDS:
        blob += eol.join((name, seq, strand, qual)) + eol
    if not final_eol:
        blob = blob[: -len(eol)]
    return blob


def _tokenize(blob: bytes):
    lib = native_mod.get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    buf = np.frombuffer(blob, np.uint8)
    res = native_mod.tokenize(buf, True, 16, 64, False)
    n = res[0]
    bases, quals, lengths = res[1], res[2], res[3]
    name_off, name_len = res[4], res[5]
    out = []
    for i in range(n):
        out.append((
            blob[name_off[i]:name_off[i] + name_len[i]],
            bases[i, :lengths[i]].tobytes(),
            quals[i, :lengths[i]].tobytes(),
        ))
    return out


def test_lf_crlf_cr_parse_identically():
    want = [(nm, sq, ql) for nm, sq, _, ql in RECORDS]
    for eol in (b"\n", b"\r\n", b"\r"):
        for final_eol in (True, False):
            got = _tokenize(_encode(eol, final_eol))
            assert got == want, (eol, final_eol)


def test_garbage_lines_before_name_skipped():
    blob = b"\n\ngarbage\n" + _encode(b"\n", True)
    got = _tokenize(blob)
    assert [g[0] for g in got] == [r[0] for r in RECORDS]
