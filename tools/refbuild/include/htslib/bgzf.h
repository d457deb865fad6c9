/* Minimal BGZF shim for building the reference aletsch binary in this
 * environment (no system htslib).  API-compatible with the subset the
 * reference uses: bgzf_seek / bgzf_tell virtual offsets on a sequential
 * reader (rnacore/sample_profile.cc:215-229, meta/generator.cc bgzf_seek).
 * Implementation in tools/refbuild/src/hts_shim.cpp (zlib block inflate).
 */
#ifndef ALETSCH_SHIM_BGZF_H
#define ALETSCH_SHIM_BGZF_H

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct BGZF {
    FILE* fp;
    int is_write;
    /* current inflated block */
    int64_t block_address;     /* compressed offset of current block */
    int block_length;          /* inflated length of current block */
    int block_offset;          /* read cursor within the block */
    unsigned char* ubuf;       /* inflated data (64 KiB) */
    unsigned char* cbuf;       /* compressed scratch (64 KiB + slack) */
} BGZF;

BGZF* bgzf_open(const char* path, const char* mode);
int bgzf_close(BGZF* fp);
/* read exactly `length` bytes spanning blocks; returns bytes read */
long bgzf_read(BGZF* fp, void* data, size_t length);
long bgzf_write(BGZF* fp, const void* data, size_t length);
/* virtual offset seek/tell: (coffset << 16) | uoffset */
int64_t bgzf_seek(BGZF* fp, int64_t pos, int whence);
int64_t bgzf_tell(BGZF* fp);

#ifdef __cplusplus
}
#endif

#endif
