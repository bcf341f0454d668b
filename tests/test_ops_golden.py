"""Kernel-level golden tests ported from the reference's built-in self-tests
(`fastp test`, reference: src/unittest.cpp:18-32 and the per-component
static test() functions). Each case uses the same inputs/expected outputs."""
import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from fastp_tpu.ops import trim as trim_ops
from fastp_tpu.ops import polyx as polyx_ops
from fastp_tpu.ops import adapter as adapter_ops
from fastp_tpu.ops import overlap as overlap_ops
from fastp_tpu.ops import correct as correct_ops
from fastp_tpu.ops import merge as merge_ops
from fastp_tpu.ops.common import rc


def enc(s: str, width: int = None):
    b = np.frombuffer(s.encode(), np.uint8)
    w = width or len(b)
    out = np.zeros((1, w), np.uint8)
    out[0, :len(b)] = b
    return jnp.asarray(out), jnp.asarray(np.array([len(b)], np.int32))


def dec(arr, length):
    return bytes(np.asarray(arr)[0, :int(length)]).decode()


class QC:
    enabledFront = True
    enabledTail = True
    enabledRight = False
    windowSizeFront = 4
    qualityFront = 20
    windowSizeTail = 4
    qualityTail = 20
    windowSizeRight = 4
    qualityRight = 20


def test_sequence_reverse_complement():
    # reference: src/sequence.cpp:85-97
    s, l = enc("AAAATTTTCCCCGGGG")
    out = rc(s, l)
    assert dec(out, 16) == "CCCCGGGGAAAATTTT"


def test_trim_and_cut_golden():
    # reference: src/filter.cpp:260-279
    seq = "TTTTAACCCCCCCCCCCCCCCCCCCCCCCCCCCCAATTTT"
    qual = "/////CCCCCCCCCCCC////CCCCCCCCCCCCCC////E"
    b, l = enc(seq)
    q, _ = enc(qual)
    front, rlen, alive = trim_ops.trim_and_cut(b, q, l, 0, 1, QC)
    f, r = int(front[0]), int(rlen[0])
    assert bool(alive[0])
    assert seq[f:f + r] == "CCCCCCCCCCCCCCCCCCCCCCCCCCCC"
    assert qual[f:f + r] == "CCCCCCCCCCC////CCCCCCCCCCCCC"


def test_polyx_golden():
    # reference: src/polyx.cpp:118-130
    seq = "ATTTTAAAAAAAAAATAAAAAAAAAAAAACAAAAAAAAAAAAAAAAAAAAAAAAAT"
    b, l = enc(seq)
    new_len, trimmed, poly, nbases = polyx_ops.trim_polyx(b, l, 10)
    assert dec(b, new_len[0]) == "ATTTT"
    assert bool(trimmed[0])
    assert int(nbases[0]) == 51
    assert int(poly[0]) == 0  # A


def test_polyg():
    # polyG tail on a NovaSeq-style read
    # 'ATCGATC' + 'G' + 'ATC' + 24*'G': the scan tolerates the ATC mismatches
    # (3 <= allowed by i=27) and the interior G at index 7 extends firstGPos,
    # so the reference trims back to "ATCGATC" (verified against the C++ loop).
    seq = "ATCGATCGATC" + "G" * 24
    b, l = enc(seq)
    new_len = polyx_ops.trim_polyg(b, l, 10)
    assert dec(b, new_len[0]) == "ATCGATC"
    # clean tail without interior G: trims exactly at the first G
    seq2 = "ATCTATCTATC" + "G" * 24
    b2, l2 = enc(seq2)
    new_len2 = polyx_ops.trim_polyg(b2, l2, 10)
    assert dec(b2, new_len2[0]) == "ATCTATCTATC"


def test_adapter_trim_by_sequence_golden():
    # reference: src/adaptertrimmer.cpp:172-180
    seq = "TTTTAACCCCCCCCCCCCCCCCCCCCCCCCCCCCAATTTTAAAATTTTCCCCGGGG"
    b, l = enc(seq)
    adapter = b"TTTTCCACGGGGATACTACTG"
    new_len, found, pos = adapter_ops.trim_by_sequence(b, l, adapter)
    assert bool(found[0])
    assert dec(b, new_len[0]) == "TTTTAACCCCCCCCCCCCCCCCCCCCCCCCCCCCAATTTTAAAA"


def test_adapter_trim_by_multi_sequences_golden():
    # reference: src/adaptertrimmer.cpp:182-195
    seq = ("TTTTAACCCCCCCCCCCCCCCCCCCCCCCCCCCCAATTTTAAAATTTTCCCCGGGG"
           "AAATTTCCCGGGAAATTTCCCGGGATCGATCGATCGATCGAATTCC")
    b, l = enc(seq)
    adapters = [b"GCTAGCTAGCTAGCTA", b"AAATTTCCCGGGAAATTTCCCGGG",
                b"ATCGATCGATCGATCG", b"AATTCCGGAATTCCGG"]
    cur_len = l
    for a in adapters:
        alen = len(a)
        match_req = 4
        new_len, found, pos = adapter_ops.trim_by_sequence(b, cur_len, a, match_req)
        cur_len = new_len
    assert dec(b, cur_len[0]) == "TTTTAACCCCCCCCCCCCCCCCCCCCCCCCCCCCAATTTTAAAATTTTCCCCGGGG"


def test_overlap_analysis_golden():
    # reference: src/overlapanalysis.cpp:185-203
    r1 = "CAGCGCCTACGGGCCCCTTTTTCTGCGCGACCGCGTGGCTGTGGGCGCGGATGCCTTTGAGCGCGGTGACTTCTCACTGCGTATCGAGC"
    r2 = "ACCTCCAGCGGCTCGATACGCAGTGAGAAGTCACCGCGCTCAAAGGCATCCGCGCCCACAGCCACGCGGTCGCGCAGAAAAAGGGGTCC"
    b1, l1 = enc(r1)
    b2, l2 = enc(r2)
    ov = overlap_ops.analyze(b1, l1, b2, l2, 2, 30, 0.2)
    assert bool(ov["overlapped"][0])
    assert int(ov["offset"][0]) == 10
    assert int(ov["overlap_len"][0]) == 79
    assert int(ov["diff"][0]) == 1


def test_overlap_merge_golden():
    r1 = "CAGCGCCTACGGGCCCCTTTTTCTGCGCGACCGCGTGGCTGTGGGCGCGGATGCCTTTGAGCGCGGTGACTTCTCACTGCGTATCGAGC"
    r2 = "ACCTCCAGCGGCTCGATACGCAGTGAGAAGTCACCGCGCTCAAAGGCATCCGCGCCCACAGCCACGCGGTCGCGCAGAAAAAGGGGTCC"
    q1 = "F" * 89
    q2 = "#" * 89
    b1, l1 = enc(r1)
    b2, l2 = enc(r2)
    qb1, _ = enc(q1)
    qb2, _ = enc(q2)
    ov = overlap_ops.analyze(b1, l1, b2, l2, 2, 30, 0.2)
    ms, mq, ml, l1m, l2m = merge_ops.merge_pairs(
        b1, qb1, l1, b2, qb2, l2,
        ov["overlapped"], ov["offset"], ov["overlap_len"], out_width=192)
    # reproduce reference construction in python for the expected value
    rc2 = r2[::-1].translate(str.maketrans("ATCG", "TAGC"))
    ol, off = 79, 10
    exp_len1 = ol + max(0, off)
    exp_len2 = 89 - ol
    exp = r1[:exp_len1] + rc2[ol:ol + exp_len2]
    assert int(ml[0]) == len(exp)
    assert dec(ms, ml[0]) == exp
    assert int(l1m[0]) == exp_len1 and int(l2m[0]) == exp_len2


def test_base_corrector_golden():
    # reference: src/basecorrector.cpp:85-107
    s1 = "TTTTAACCCCCCCCCCCCCCCCCCCCCCCCCCCCAATTTTAAAATTTTCCACGGGG"
    q1 = "EEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEE/EEEEE"
    s2 = "AAAAAAAAAACCCCGGGGAAAATTTTAAAATTGGGGGGGGGGTGGGGGGGGGGGGG"
    q2 = "EEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEE/EEEEEEEEEEEEE"
    b1, l1 = enc(s1)
    b2, l2 = enc(s2)
    qb1, _ = enc(q1)
    qb2, _ = enc(q2)
    ov = overlap_ops.analyze(b1, l1, b2, l2, 5, 30, 0.2)
    ns1, nq1, ns2, nq2, cm, corrected, r1c, r2c, _masks = correct_ops.correct_by_overlap(
        b1, qb1, l1, b2, qb2, l2,
        ov["overlapped"], ov["offset"], ov["overlap_len"], ov["diff"])
    assert dec(ns1, 56) == "TTTTAACCCCCCCCCCCCCCCCCCCCCCCCCCCCAATTTTAAAATTTTCCCCGGGG"
    assert dec(ns2, 56) == "AAAAAAAAAACCCCGGGGAAAATTTTAAAATTGGGGGGGGGGGGGGGGGGGGGGGG"
    assert dec(nq1, 56) == "E" * 56
    assert dec(nq2, 56) == "E" * 56


def test_read_last_index():
    # reference: src/read.cpp:192-199 (host-side name parsing)
    from fastp_tpu.utils.readname import last_index, first_index
    name = b"@NS500713:64:HFKJJBGXY:1:11101:20469:1097 1:N:0:TATAGCCT+GGTCCCGA"
    assert last_index(name) == b"GGTCCCGA"
    assert first_index(name) == b"TATAGCCT"
