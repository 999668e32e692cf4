/* Native CABAC arithmetic decoder — ABI wrappers for the host parse path.
 *
 * The engine itself lives in cabac_inl.h (static inline, so parse.c and
 * residual.c inline it into their symbol loops); this file provides the
 * allocation/lifecycle plus exported entry points consumed via ctypes
 * (openvvc_tpu/native/__init__.py NativeCabacDecoder) and by tests.
 *
 * Behavior parity target: /root/reference/libovvc/cabac_internal.h:45-157.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#include "cabac_inl.h"

CabacDec *cabac_new(const uint8_t *data, int64_t nbytes,
                    const uint16_t *s0, const uint16_t *s1,
                    const uint8_t *r0, const uint8_t *r1)
{
    CabacDec *d = malloc(sizeof(*d));
    if (!d)
        return NULL;
    d->data = data;
    d->bytepos = 0;
    d->nbytes = nbytes;
    d->cache = 0;
    d->ncache = 0;
    memcpy(d->s0, s0, sizeof(d->s0));
    memcpy(d->s1, s1, sizeof(d->s1));
    memcpy(d->r0, r0, sizeof(d->r0));
    memcpy(d->r1, r1, sizeof(d->r1));
    d->range = 510;
    ov_cb_refill(d);
    d->offset = (uint32_t)(d->cache >> (64 - 9));
    d->cache <<= 9;
    d->ncache -= 9;
    return d;
}

void cabac_free(CabacDec *d) { free(d); }

int cabac_overread(const CabacDec *d)
{
    return d->bytepos * 8 - d->ncache > d->nbytes * 8;
}

int64_t cabac_bitpos(const CabacDec *d)
{
    return d->bytepos * 8 - d->ncache;
}

int cabac_decode_bin(CabacDec *d, int ctx_idx)
{
    return ov_decode_bin(d, ctx_idx);
}

int cabac_decode_bypass(CabacDec *d) { return ov_decode_bypass(d); }

uint32_t cabac_decode_bypass_bits(CabacDec *d, int n)
{
    return ov_decode_bypass_bits(d, n);
}

int cabac_decode_terminate(CabacDec *d) { return ov_decode_terminate(d); }

/* Export the mutable state so Python-side code can interleave. */
void cabac_get_state(const CabacDec *d, uint16_t *s0, uint16_t *s1,
                     int64_t *bitpos, uint32_t *rng, uint32_t *offset)
{
    memcpy(s0, d->s0, sizeof(d->s0));
    memcpy(s1, d->s1, sizeof(d->s1));
    *bitpos = d->bytepos * 8 - d->ncache;
    *rng = d->range;
    *offset = d->offset;
}
