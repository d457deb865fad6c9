/* Minimal htslib sam.h shim for building the reference aletsch binary in
 * this environment.  Defines exactly the structs / macros / functions the
 * reference calls (rnacore/hit.cc, rnacore/sample_profile.cc,
 * meta/generator.cc, rnacore/essential.cc writers).  BAM decoding is
 * implemented from the BAM spec in tools/refbuild/src/hts_shim.cpp.
 */
#ifndef ALETSCH_SHIM_SAM_H
#define ALETSCH_SHIM_SAM_H

#include <stdint.h>
#include <string.h>

#include "htslib/bgzf.h"

#ifdef __cplusplus
extern "C" {
#endif

/* ---- flags ---- */
#define BAM_FPAIRED        1
#define BAM_FPROPER_PAIR   2
#define BAM_FUNMAP         4
#define BAM_FMUNMAP        8
#define BAM_FREVERSE      16
#define BAM_FMREVERSE     32
#define BAM_FREAD1        64
#define BAM_FREAD2       128
#define BAM_FSECONDARY   256
#define BAM_FQCFAIL      512
#define BAM_FDUP        1024
#define BAM_FSUPPLEMENTARY 2048

/* ---- cigar ---- */
#define BAM_CMATCH      0
#define BAM_CINS        1
#define BAM_CDEL        2
#define BAM_CREF_SKIP   3
#define BAM_CSOFT_CLIP  4
#define BAM_CHARD_CLIP  5
#define BAM_CPAD        6
#define BAM_CEQUAL      7
#define BAM_CDIFF       8
#define BAM_CBACK       9

#define BAM_CIGAR_SHIFT 4
#define BAM_CIGAR_MASK  0xf
/* bit 1: consumes query; bit 2: consumes reference (per op 0..9) */
#define BAM_CIGAR_TYPE  0x3C1A7
#define bam_cigar_op(c)    ((c) & BAM_CIGAR_MASK)
#define bam_cigar_oplen(c) ((c) >> BAM_CIGAR_SHIFT)
#define bam_cigar_type(o)  (BAM_CIGAR_TYPE >> ((o) << 1) & 3)

/* ---- records ---- */
typedef struct {
    int32_t tid;
    int32_t pos;
    uint16_t bin;
    uint8_t qual;
    uint8_t l_qname;      /* length of qname incl. trailing NULs */
    uint16_t flag;
    uint8_t unused1;
    uint8_t l_extranul;   /* extra NULs after qname (shim: 0) */
    uint32_t n_cigar;
    int32_t l_qseq;
    int32_t mtid;
    int32_t mpos;
    int32_t isize;
} bam1_core_t;

typedef struct {
    bam1_core_t core;
    int l_data, m_data;
    uint8_t* data;
} bam1_t;

typedef struct {
    int32_t n_targets;
    uint32_t l_text;
    uint32_t* target_len;
    char** target_name;
    char* text;
} bam_hdr_t;

typedef struct samFile {
    union {
        BGZF* bgzf;
        void* voidp;
    } fp;
    int is_write;
} samFile;
typedef samFile htsFile;

typedef struct hts_idx_t { int dummy; } hts_idx_t;
typedef struct hts_itr_t { int dummy; } hts_itr_t;

#define bam_get_qname(b) ((char*)(b)->data)
#define bam_get_cigar(b) ((uint32_t*)((b)->data + (b)->core.l_qname))
#define bam_get_seq(b)   ((b)->data + ((b)->core.n_cigar << 2) + \
                          (b)->core.l_qname)
#define bam_get_qual(b)  ((b)->data + ((b)->core.n_cigar << 2) + \
                          (b)->core.l_qname + (((b)->core.l_qseq + 1) >> 1))
#define bam_get_aux(b)   ((b)->data + ((b)->core.n_cigar << 2) + \
                          (b)->core.l_qname + (((b)->core.l_qseq + 1) >> 1) \
                          + (b)->core.l_qseq)
#define bam_get_l_aux(b) ((b)->l_data - ((b)->core.n_cigar << 2) - \
                          (b)->core.l_qname - (b)->core.l_qseq - \
                          (((b)->core.l_qseq + 1) >> 1))

extern const char bam_nt16_table[256];

samFile* sam_open(const char* path, const char* mode);
int sam_close(samFile* fp);
bam_hdr_t* sam_hdr_read(samFile* fp);
int sam_hdr_write(samFile* fp, const bam_hdr_t* h);
void bam_hdr_destroy(bam_hdr_t* h);
int sam_read1(samFile* fp, bam_hdr_t* h, bam1_t* b);
bam1_t* bam_init1(void);
void bam_destroy1(bam1_t* b);
int bam_write1(BGZF* fp, const bam1_t* b);

uint8_t* bam_aux_get(const bam1_t* b, const char tag[2]);
int64_t bam_aux2i(const uint8_t* s);
char bam_aux2A(const uint8_t* s);
int bam_aux_append(bam1_t* b, const char tag[2], char type, int len,
                   const uint8_t* data);

uint32_t bam_cigar2rlen(int n_cigar, const uint32_t* cigar);

static inline int bam_reg2bin(int64_t beg, int64_t end) {
    --end;
    if (beg >> 14 == end >> 14)
        return ((1 << 15) - 1) / 7 + (int)(beg >> 14);
    if (beg >> 17 == end >> 17)
        return ((1 << 12) - 1) / 7 + (int)(beg >> 17);
    if (beg >> 20 == end >> 20)
        return ((1 << 9) - 1) / 7 + (int)(beg >> 20);
    if (beg >> 23 == end >> 23)
        return ((1 << 6) - 1) / 7 + (int)(beg >> 23);
    if (beg >> 26 == end >> 26)
        return ((1 << 3) - 1) / 7 + (int)(beg >> 26);
    return 0;
}

hts_idx_t* sam_index_load(samFile* fp, const char* path);
void hts_idx_destroy(hts_idx_t* idx);
void hts_itr_destroy(hts_itr_t* itr);

#ifdef __cplusplus
}
#endif

#endif
