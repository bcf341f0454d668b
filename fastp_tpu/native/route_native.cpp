// Vectorized PE output routing (reference: src/peprocessor.cpp:488-579).
//
// The reference routes each processed pair through a per-read switch into up
// to 7 output streams (out1/out2/merged/unpaired1/unpaired2/failed/stdout).
// fastp_tpu's device step returns per-pair verdict arrays; these emitters
// turn those arrays into output text in one native pass per stream instead
// of a per-row Python loop.  Two shapes cover every stream:
//
//   fq_emit_routed — per row, slot A (from read1) then slot B (from read2),
//     each skipped / windowed / raw, with an optional " tag" appended to the
//     name (used for failed-read tags, reference: src/read.cpp:119-173
//     appendToStringWithTag).  Covers out1, out2, interleaved stdout,
//     unpaired1/2 (including the r2->unpaired1 fallback), and failed.
//
//   fq_emit_merged — merge-mode "merged" stream: a merged record built as
//     r1-window[:len1] + revcomp(r2-window[:rlen2])[ol:ol+len2] with name
//     tag " merged_<len1>_<len2>" (reference: src/overlapanalysis.cpp:152-183),
//     or, for unmerged rows with --include_unmerged, the surviving mates
//     (reference: src/peprocessor.cpp:497-523).
#include <cstdint>
#include <cstring>
#include <cstdio>

namespace {

const uint8_t* COMP() {
    // ACGT/acgt complemented (case folded to upper), everything else 'N'
    // (matches Sequence::reverseComplement, reference src/sequence.cpp:23-50)
    static uint8_t t[256];
    static bool init = false;
    if (!init) {
        memset(t, 'N', 256);
        t['A'] = 'T'; t['a'] = 'T'; t['T'] = 'A'; t['t'] = 'A';
        t['C'] = 'G'; t['c'] = 'G'; t['G'] = 'C'; t['g'] = 'C';
        init = true;
    }
    return t;
}

inline uint8_t* put(uint8_t* o, const uint8_t* src, int64_t n) {
    memcpy(o, src, n);
    return o + n;
}

}  // namespace

extern "C" {

// One output stream; per row slot A (read1) then slot B (read2).
//   emitX: 0 = skip, 1 = window [tf, tf+rlen), 2 = raw [pre, lraw)
//   tagX: index into the tag table (name += " " + tag), or -1 for no tag
// Returns bytes written to out (caller sizes generously).
int64_t fq_emit_routed(
    const uint8_t* nb1, const int64_t* noff1, const int32_t* nlen1,
    const uint8_t* sb1, const int64_t* soff1, const int32_t* slen1,
    const uint8_t* bases1, const uint8_t* quals1,
    const int32_t* tf1, const int32_t* rlen1,
    const int32_t* pre1, const int32_t* lraw1,
    const uint8_t* nb2, const int64_t* noff2, const int32_t* nlen2,
    const uint8_t* sb2, const int64_t* soff2, const int32_t* slen2,
    const uint8_t* bases2, const uint8_t* quals2,
    const int32_t* tf2, const int32_t* rlen2,
    const int32_t* pre2, const int32_t* lraw2,
    int64_t B, int64_t W,
    const uint8_t* emitA, const int32_t* tagA,
    const uint8_t* emitB, const int32_t* tagB,
    const uint8_t* tagblob, const int64_t* tag_off, const int32_t* tag_len,
    uint8_t* out) {
    uint8_t* o = out;
    for (int64_t i = 0; i < B; i++) {
        for (int slot = 0; slot < 2; slot++) {
            uint8_t em = slot == 0 ? emitA[i] : emitB[i];
            if (!em) continue;
            const uint8_t* nb = slot == 0 ? nb1 : nb2;
            const int64_t* noff = slot == 0 ? noff1 : noff2;
            const int32_t* nlen = slot == 0 ? nlen1 : nlen2;
            const uint8_t* sb = slot == 0 ? sb1 : sb2;
            const int64_t* soff = slot == 0 ? soff1 : soff2;
            const int32_t* slen = slot == 0 ? slen1 : slen2;
            const uint8_t* bases = slot == 0 ? bases1 : bases2;
            const uint8_t* quals = slot == 0 ? quals1 : quals2;
            int32_t start, len;
            if (em == 1) {
                start = (slot == 0 ? tf1 : tf2)[i];
                len = (slot == 0 ? rlen1 : rlen2)[i];
            } else {
                start = (slot == 0 ? pre1 : pre2)[i];
                len = (slot == 0 ? lraw1 : lraw2)[i] - start;
            }
            if (len < 0) len = 0;
            int32_t tg = slot == 0 ? tagA[i] : tagB[i];
            o = put(o, nb + noff[i], nlen[i]);
            if (tg >= 0) {
                *o++ = ' ';
                o = put(o, tagblob + tag_off[tg], tag_len[tg]);
            }
            *o++ = '\n';
            o = put(o, bases + i * W + start, len);
            *o++ = '\n';
            o = put(o, sb + soff[i], slen[i]);
            *o++ = '\n';
            o = put(o, quals + i * W + start, len);
            *o++ = '\n';
        }
    }
    return o - out;
}

// Merge-mode "merged" stream.
//   m_emit rows: merged record with " merged_<len1>_<len2>" name tag (and
//     strand tag when the strand line is not exactly "+").
//   otherwise (include_unmerged): r1 window if umA, then r2 window if umB.
int64_t fq_emit_merged(
    const uint8_t* nb1, const int64_t* noff1, const int32_t* nlen1,
    const uint8_t* sb1, const int64_t* soff1, const int32_t* slen1,
    const uint8_t* bases1, const uint8_t* quals1,
    const int32_t* tf1, const int32_t* rlen1,
    const uint8_t* nb2, const int64_t* noff2, const int32_t* nlen2,
    const uint8_t* sb2, const int64_t* soff2, const int32_t* slen2,
    const uint8_t* bases2, const uint8_t* quals2,
    const int32_t* tf2, const int32_t* rlen2,
    int64_t B, int64_t W,
    const uint8_t* m_emit, const int32_t* m_len1, const int32_t* m_len2,
    const int32_t* m_ol,
    const uint8_t* umA, const uint8_t* umB,
    uint8_t* out) {
    const uint8_t* comp = COMP();
    uint8_t* o = out;
    char tag[48];
    for (int64_t i = 0; i < B; i++) {
        if (m_emit[i]) {
            int tl = snprintf(tag, sizeof(tag), " merged_%d_%d",
                              (int)m_len1[i], (int)m_len2[i]);
            o = put(o, nb1 + noff1[i], nlen1[i]);
            o = put(o, (const uint8_t*)tag, tl);
            *o++ = '\n';
            const uint8_t* b1 = bases1 + i * W + tf1[i];
            const uint8_t* q1 = quals1 + i * W + tf1[i];
            const uint8_t* b2 = bases2 + i * W + tf2[i];
            const uint8_t* q2 = quals2 + i * W + tf2[i];
            int l1 = m_len1[i], l2 = m_len2[i];
            int base2 = rlen2[i] - 1 - m_ol[i];
            o = put(o, b1, l1);
            for (int j = 0; j < l2; j++) *o++ = comp[b2[base2 - j]];
            *o++ = '\n';
            o = put(o, sb1 + soff1[i], slen1[i]);
            if (!(slen1[i] == 1 && sb1[soff1[i]] == '+'))
                o = put(o, (const uint8_t*)tag, tl);
            *o++ = '\n';
            o = put(o, q1, l1);
            for (int j = 0; j < l2; j++) *o++ = q2[base2 - j];
            *o++ = '\n';
        } else {
            if (umA && umA[i]) {
                o = put(o, nb1 + noff1[i], nlen1[i]);
                *o++ = '\n';
                o = put(o, bases1 + i * W + tf1[i], rlen1[i]);
                *o++ = '\n';
                o = put(o, sb1 + soff1[i], slen1[i]);
                *o++ = '\n';
                o = put(o, quals1 + i * W + tf1[i], rlen1[i]);
                *o++ = '\n';
            }
            if (umB && umB[i]) {
                o = put(o, nb2 + noff2[i], nlen2[i]);
                *o++ = '\n';
                o = put(o, bases2 + i * W + tf2[i], rlen2[i]);
                *o++ = '\n';
                o = put(o, sb2 + soff2[i], slen2[i]);
                *o++ = '\n';
                o = put(o, quals2 + i * W + tf2[i], rlen2[i]);
                *o++ = '\n';
            }
        }
    }
    return o - out;
}

}  // extern "C"
