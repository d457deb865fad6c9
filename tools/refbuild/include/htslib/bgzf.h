/* Minimal BGZF shim API for building the reference aletsch binary as an
 * oracle (tools/refbuild).  Implemented in ../shim/hts_shim.cpp on zlib —
 * original code, API-compatible with the htslib subset the reference
 * actually calls (bgzf_tell / bgzf_seek on virtual file offsets). */
#ifndef ALETSCH_SHIM_BGZF_H
#define ALETSCH_SHIM_BGZF_H

#include <stdint.h>
#include <stdio.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct BGZF BGZF;

/* virtual offset: (compressed block offset << 16) | within-block offset */
int64_t bgzf_tell(BGZF *fp);
int64_t bgzf_seek(BGZF *fp, int64_t vaddr, int whence);

#ifdef __cplusplus
}
#endif

#endif
