/* Inline CABAC arithmetic decoder core shared by the native parse path.
 *
 * Same semantics as openvvc_tpu/cabac/engine.py (ITU-T H.266 9.3.4.3:
 * dual-rate probability states, 9-bit range, renormalization with zero
 * padding past the entry end) but with fast bit I/O: upcoming bits are
 * prefetched MSB-aligned into a 64-bit cache refilled 32 bits at a time,
 * and renormalization consumes all needed bits in one clz-sized take
 * instead of a bit-serial loop. Behavior parity target:
 * /root/reference/libovvc/cabac_internal.h:45-157 (which uses a 16-bit
 * refill window for the same reason).
 *
 * Consumed-bit accounting: bits_consumed = bytepos*8 - ncache, which is
 * invariant under refill (both sides grow together) and exactly matches
 * the bit-serial engine's bitpos — including the zero-padding tail, so
 * cabac_overread keeps its meaning.
 *
 * Files that want the hot functions inlined define OV_CABAC_ALIASES
 * before including this header to map the public names onto the inline
 * versions; cabac.c includes it bare and exports ABI wrappers for ctypes.
 */

#ifndef OV_CABAC_INL_H
#define OV_CABAC_INL_H

#include <stdint.h>
#include <string.h>

#define NB_CTX 393

typedef struct CabacDec {
    const uint8_t *data;
    int64_t bytepos;  /* next byte index to feed the cache (may pass end) */
    int64_t nbytes;
    uint64_t cache;   /* upcoming bits, MSB-aligned at bit 63 */
    int32_t ncache;   /* number of valid bits in cache */
    uint32_t range;
    uint32_t offset;
    uint16_t s0[NB_CTX];
    uint16_t s1[NB_CTX];
    uint8_t r0[NB_CTX];
    uint8_t r1[NB_CTX];
} CabacDec;

/* Exported (cabac.c) lifecycle + state export for the Python engine. */
CabacDec *cabac_new(const uint8_t *data, int64_t nbytes,
                    const uint16_t *s0, const uint16_t *s1,
                    const uint8_t *r0, const uint8_t *r1);
void cabac_free(CabacDec *d);
int cabac_overread(const CabacDec *d);
int64_t cabac_bitpos(const CabacDec *d);
void cabac_get_state(const CabacDec *d, uint16_t *s0, uint16_t *s1,
                     int64_t *bitpos, uint32_t *rng, uint32_t *offset);

static inline void ov_cb_refill(CabacDec *d)
{
    if (d->ncache > 32)
        return;
    if (d->bytepos + 4 <= d->nbytes) {
        uint32_t w;
        memcpy(&w, d->data + d->bytepos, 4);
        d->cache |= (uint64_t)__builtin_bswap32(w) << (32 - d->ncache);
        d->bytepos += 4;
        d->ncache += 32;
        return;
    }
    while (d->ncache <= 56) { /* tail: bounds-checked bytes, zero padded */
        uint64_t b = d->bytepos < d->nbytes ? d->data[d->bytepos] : 0;
        d->cache |= b << (56 - d->ncache);
        d->bytepos++;
        d->ncache += 8;
    }
}

static inline int ov_decode_bin(CabacDec *d, int ctx_idx)
{
    uint32_t s0 = d->s0[ctx_idx];
    uint32_t s1 = d->s1[ctx_idx];
    uint32_t p_state = (s0 + s1) >> 1;
    uint32_t val_mps = p_state >> 14;
    uint32_t lps_prob = (val_mps ? 32767 - p_state : p_state) >> 9;
    uint32_t ivl_lps = (((d->range >> 5) * lps_prob) >> 1) + 4;
    int bin_val;

    d->range -= ivl_lps;
    if (d->offset >= d->range) {
        bin_val = 1 - (int)val_mps;
        d->offset -= d->range;
        d->range = ivl_lps;
    } else {
        bin_val = (int)val_mps;
    }
    {
        uint32_t r0 = d->r0[ctx_idx], r1 = d->r1[ctx_idx];
        s0 -= (s0 >> r0) & 0x7FE0;
        s1 -= (s1 >> r1) & 0x7FFE;
        if (bin_val) {
            s0 += (0x7FFFu >> r0) & 0x7FE0;
            s1 += (0x7FFFu >> r1) & 0x7FFE;
        }
    }
    d->s0[ctx_idx] = (uint16_t)s0;
    d->s1[ctx_idx] = (uint16_t)s1;
    if (d->range < 256) { /* renorm: range>=4 so 1..6 bits */
        int n = __builtin_clz(d->range) - 23;
        ov_cb_refill(d); /* guarantees ncache >= 33 */
        d->range <<= n;
        d->offset = (d->offset << n) | (uint32_t)(d->cache >> (64 - n));
        d->cache <<= n;
        d->ncache -= n;
    }
    return bin_val;
}

static inline int ov_decode_bypass(CabacDec *d)
{
    ov_cb_refill(d);
    d->offset = (d->offset << 1) | (uint32_t)(d->cache >> 63);
    d->cache <<= 1;
    d->ncache -= 1;
    if (d->offset >= d->range) {
        d->offset -= d->range;
        return 1;
    }
    return 0;
}

static inline uint32_t ov_decode_bypass_bits(CabacDec *d, int n)
{
    uint32_t v = 0;
    while (n > 0) {
        int chunk = n < 24 ? n : 24;
        ov_cb_refill(d); /* >= 33 bits available, chunk <= 24 */
        for (int i = 0; i < chunk; i++) {
            d->offset = (d->offset << 1) | (uint32_t)(d->cache >> 63);
            d->cache <<= 1;
            if (d->offset >= d->range) {
                d->offset -= d->range;
                v = (v << 1) | 1;
            } else {
                v <<= 1;
            }
        }
        d->ncache -= chunk;
        n -= chunk;
    }
    return v;
}

static inline int ov_decode_terminate(CabacDec *d)
{
    d->range -= 2;
    if (d->offset >= d->range)
        return 1;
    if (d->range < 256) {
        int n = __builtin_clz(d->range) - 23;
        ov_cb_refill(d);
        d->range <<= n;
        d->offset = (d->offset << n) | (uint32_t)(d->cache >> (64 - n));
        d->cache <<= n;
        d->ncache -= n;
    }
    return 0;
}

#ifdef OV_CABAC_ALIASES
#define cabac_decode_bin ov_decode_bin
#define cabac_decode_bypass ov_decode_bypass
#define cabac_decode_bypass_bits ov_decode_bypass_bits
#define cabac_decode_terminate ov_decode_terminate
#endif

#endif /* OV_CABAC_INL_H */
