// zlib-backed shim for the subset of isa-l's igzip inflate API that
// fastp's FastqReader uses (isal_inflate_init/reset, isal_read_gzip_header,
// isal_gzip_header_init, isal_inflate).  Functional replacement only —
// this host image has no libisal; gzip-input throughput of the reference
// is not benchmarked here.
#include "igzip_lib.h"
#include <zlib.h>
#include <cstring>
#include <map>
#include <mutex>

namespace {
struct ShimCtx {
    z_stream zs;
    bool live = false;
    int trailer_left = 0;   // gzip CRC+ISIZE bytes still to consume
    bool stream_end = false;
};
std::mutex g_mu;
std::map<inflate_state *, ShimCtx *> g_ctx;

ShimCtx *ctx_for(inflate_state *s) {
    std::lock_guard<std::mutex> lk(g_mu);
    auto it = g_ctx.find(s);
    if (it != g_ctx.end()) return it->second;
    ShimCtx *c = new ShimCtx();
    g_ctx[s] = c;
    return c;
}

void reset_raw(ShimCtx *c) {
    if (c->live) inflateEnd(&c->zs);
    std::memset(&c->zs, 0, sizeof(c->zs));
    inflateInit2(&c->zs, -15);  // raw deflate; gzip wrapper handled here
    c->live = true;
    c->trailer_left = 0;
    c->stream_end = false;
}
}  // namespace

extern "C" {

void isal_gzip_header_init(struct isal_gzip_header *h) {
    std::memset(h, 0, sizeof(*h));
}

void isal_inflate_init(struct inflate_state *state) {
    std::memset(state, 0, sizeof(*state));
    state->block_state = ISAL_BLOCK_NEW_HDR;
    reset_raw(ctx_for(state));
}

void isal_inflate_reset(struct inflate_state *state) {
    uint8_t *ni = state->next_in;
    uint32_t ai = state->avail_in;
    std::memset(state, 0, sizeof(*state));
    state->next_in = ni;
    state->avail_in = ai;
    state->block_state = ISAL_BLOCK_NEW_HDR;
    reset_raw(ctx_for(state));
}

// Parses the gzip member header at state->next_in, advancing past it.
int isal_read_gzip_header(struct inflate_state *state,
                          struct isal_gzip_header *gz_hdr) {
    (void)gz_hdr;
    uint8_t *p = state->next_in;
    uint32_t n = state->avail_in;
    if (n < 10 || p[0] != 0x1f || p[1] != 0x8b || p[2] != 8)
        return ISAL_INVALID_WRAPPER;
    uint8_t flg = p[3];
    uint32_t off = 10;
    if (flg & 4) {  // FEXTRA
        if (n < off + 2) return ISAL_END_INPUT;
        uint32_t xlen = p[off] | (p[off + 1] << 8);
        off += 2 + xlen;
    }
    if (flg & 8) {  // FNAME
        while (off < n && p[off]) off++;
        off++;
    }
    if (flg & 16) {  // FCOMMENT
        while (off < n && p[off]) off++;
        off++;
    }
    if (flg & 2) off += 2;  // FHCRC
    if (off > n) return ISAL_END_INPUT;
    state->next_in += off;
    state->avail_in -= off;
    state->block_state = ISAL_BLOCK_NEW_HDR;
    return ISAL_DECOMP_OK;
}

int isal_inflate(struct inflate_state *state) {
    ShimCtx *c = ctx_for(state);
    if (!c->live) reset_raw(c);

    // consume a pending gzip trailer that straddled a buffer refill
    if (c->stream_end && c->trailer_left > 0) {
        uint32_t take = state->avail_in < (uint32_t)c->trailer_left
                            ? state->avail_in
                            : (uint32_t)c->trailer_left;
        state->next_in += take;
        state->avail_in -= take;
        c->trailer_left -= take;
    }
    if (c->stream_end) {
        if (c->trailer_left == 0) {
            state->block_state = ISAL_BLOCK_FINISH;
            state->bfinal = 1;
        }
        return ISAL_DECOMP_OK;
    }

    c->zs.next_in = state->next_in;
    c->zs.avail_in = state->avail_in;
    c->zs.next_out = state->next_out;
    c->zs.avail_out = state->avail_out;
    int ret = inflate(&c->zs, Z_NO_FLUSH);
    state->next_in = c->zs.next_in;
    state->avail_in = c->zs.avail_in;
    state->next_out = c->zs.next_out;
    state->avail_out = c->zs.avail_out;
    if (ret == Z_STREAM_END) {
        c->stream_end = true;
        c->trailer_left = 8;  // CRC32 + ISIZE (unverified, NO_HDR_VER mode)
        uint32_t take = state->avail_in < 8u ? state->avail_in : 8u;
        state->next_in += take;
        state->avail_in -= take;
        c->trailer_left -= take;
        if (c->trailer_left == 0) {
            state->block_state = ISAL_BLOCK_FINISH;
            state->bfinal = 1;
        }
        return ISAL_DECOMP_OK;
    }
    if (ret == Z_OK || ret == Z_BUF_ERROR) return ISAL_DECOMP_OK;
    return ISAL_INVALID_BLOCK;
}

}  // extern "C"
