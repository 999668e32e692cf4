/* Native CABAC arithmetic decoder for the host parse path.
 *
 * Same algorithm as openvvc_tpu/cabac/engine.py (ITU-T H.266 9.3.4.3:
 * dual-rate probability states, 9-bit range, bit-serial renormalization with
 * zero padding past the entry end). Exposed as a flat C ABI consumed via
 * ctypes; one CabacDec per CABAC entry.
 *
 * Behavior parity target: /root/reference/libovvc/cabac_internal.h:45-157.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define NB_CTX 393

typedef struct CabacDec {
    const uint8_t *data;
    int64_t bitpos;
    int64_t nbits;
    uint32_t range;
    uint32_t offset;
    uint16_t s0[NB_CTX];
    uint16_t s1[NB_CTX];
    uint8_t r0[NB_CTX];
    uint8_t r1[NB_CTX];
} CabacDec;

static inline int read_bit(CabacDec *d)
{
    int64_t p = d->bitpos++;
    if (p >= d->nbits)
        return 0;
    return (d->data[p >> 3] >> (7 - (p & 7))) & 1;
}

CabacDec *cabac_new(const uint8_t *data, int64_t nbytes,
                    const uint16_t *s0, const uint16_t *s1,
                    const uint8_t *r0, const uint8_t *r1)
{
    CabacDec *d = malloc(sizeof(*d));
    if (!d)
        return NULL;
    d->data = data;
    d->bitpos = 0;
    d->nbits = nbytes * 8;
    memcpy(d->s0, s0, sizeof(d->s0));
    memcpy(d->s1, s1, sizeof(d->s1));
    memcpy(d->r0, r0, sizeof(d->r0));
    memcpy(d->r1, r1, sizeof(d->r1));
    d->range = 510;
    d->offset = 0;
    for (int i = 0; i < 9; i++)
        d->offset = (d->offset << 1) | read_bit(d);
    return d;
}

void cabac_free(CabacDec *d) { free(d); }

int cabac_overread(const CabacDec *d) { return d->bitpos > d->nbits; }

int64_t cabac_bitpos(const CabacDec *d) { return d->bitpos; }

int cabac_decode_bin(CabacDec *d, int ctx_idx)
{
    uint32_t s0 = d->s0[ctx_idx];
    uint32_t s1 = d->s1[ctx_idx];
    uint32_t p_state = (s0 + s1) >> 1;
    uint32_t val_mps = p_state >> 14;
    uint32_t q_range = d->range >> 5;
    uint32_t lps_prob = (val_mps ? 32767 - p_state : p_state) >> 9;
    uint32_t ivl_lps = ((q_range * lps_prob) >> 1) + 4;
    int bin_val;

    d->range -= ivl_lps;
    if (d->offset >= d->range) {
        bin_val = 1 - (int)val_mps;
        d->offset -= d->range;
        d->range = ivl_lps;
    } else {
        bin_val = (int)val_mps;
    }
    s0 -= (s0 >> d->r0[ctx_idx]) & 0x7FE0;
    s1 -= (s1 >> d->r1[ctx_idx]) & 0x7FFE;
    if (bin_val) {
        s0 += (0x7FFFu >> d->r0[ctx_idx]) & 0x7FE0;
        s1 += (0x7FFFu >> d->r1[ctx_idx]) & 0x7FFE;
    }
    d->s0[ctx_idx] = (uint16_t)s0;
    d->s1[ctx_idx] = (uint16_t)s1;
    while (d->range < 256) {
        d->range <<= 1;
        d->offset = (d->offset << 1) | read_bit(d);
    }
    return bin_val;
}

int cabac_decode_bypass(CabacDec *d)
{
    d->offset = (d->offset << 1) | read_bit(d);
    if (d->offset >= d->range) {
        d->offset -= d->range;
        return 1;
    }
    return 0;
}

uint32_t cabac_decode_bypass_bits(CabacDec *d, int n)
{
    uint32_t v = 0;
    for (int i = 0; i < n; i++)
        v = (v << 1) | cabac_decode_bypass(d);
    return v;
}

int cabac_decode_terminate(CabacDec *d)
{
    d->range -= 2;
    if (d->offset >= d->range)
        return 1;
    while (d->range < 256) {
        d->range <<= 1;
        d->offset = (d->offset << 1) | read_bit(d);
    }
    return 0;
}

/* Export/import the mutable state so Python-side code can interleave. */
void cabac_get_state(const CabacDec *d, uint16_t *s0, uint16_t *s1,
                     int64_t *bitpos, uint32_t *rng, uint32_t *offset)
{
    memcpy(s0, d->s0, sizeof(d->s0));
    memcpy(s1, d->s1, sizeof(d->s1));
    *bitpos = d->bitpos;
    *rng = d->range;
    *offset = d->offset;
}
