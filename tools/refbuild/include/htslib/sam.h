/* Minimal htslib sam.h shim for building the reference aletsch binary as
 * an oracle (tools/refbuild).  Original code: declares exactly the subset
 * of the htslib 1.x API the reference sources call (see
 * tools/refbuild/README.md for the inventory), implemented in
 * ../shim/hts_shim.cpp on zlib.  API-compatible, not ABI-compatible. */
#ifndef ALETSCH_SHIM_SAM_H
#define ALETSCH_SHIM_SAM_H

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#include "htslib/bgzf.h"

#ifdef __cplusplus
extern "C" {
#endif

/* ---- CIGAR ---- */
#define BAM_CMATCH 0
#define BAM_CINS 1
#define BAM_CDEL 2
#define BAM_CREF_SKIP 3
#define BAM_CSOFT_CLIP 4
#define BAM_CHARD_CLIP 5
#define BAM_CPAD 6
#define BAM_CEQUAL 7
#define BAM_CDIFF 8
#define BAM_CBACK 9

#define BAM_CIGAR_SHIFT 4
#define BAM_CIGAR_MASK 0xf
#define bam_cigar_op(c) ((c) & BAM_CIGAR_MASK)
#define bam_cigar_oplen(c) ((c) >> BAM_CIGAR_SHIFT)
/* per-op consumes-query/reference bits, htslib encoding */
#define BAM_CIGAR_TYPE 0x3C1A7
#define bam_cigar_type(o) (BAM_CIGAR_TYPE >> ((o) << 1) & 3)

/* ---- flags (defined for completeness) ---- */
#define BAM_FPAIRED 1
#define BAM_FPROPER_PAIR 2
#define BAM_FUNMAP 4
#define BAM_FMUNMAP 8
#define BAM_FREVERSE 16
#define BAM_FMREVERSE 32
#define BAM_FREAD1 64
#define BAM_FREAD2 128
#define BAM_FSECONDARY 256
#define BAM_FQCFAIL 512
#define BAM_FDUP 1024
#define BAM_FSUPPLEMENTARY 2048

/* ---- core structures (htslib 1.x field layout) ---- */
typedef struct {
    int32_t tid;
    int32_t pos;
    uint16_t bin;
    uint8_t qual;
    uint8_t l_qname;
    uint16_t flag;
    uint8_t unused1;
    uint8_t l_extranul;
    uint32_t n_cigar;
    int32_t l_qseq;
    int32_t mtid;
    int32_t mpos;
    int32_t isize;
} bam1_core_t;

typedef struct {
    bam1_core_t core;
    int l_data;
    uint32_t m_data;
    uint8_t *data;
} bam1_t;

typedef struct {
    int32_t n_targets;
    char **target_name;
    uint32_t *target_len;
    char *text;
} bam_hdr_t;

typedef struct samFile samFile;
struct hts_shim_fp_union { BGZF *bgzf; };
struct samFile { struct hts_shim_fp_union fp; };

typedef struct hts_idx_t hts_idx_t;
typedef struct hts_itr_t hts_itr_t;

/* ---- data accessors ---- */
#define bam_get_qname(b) ((char *)(b)->data)
#define bam_get_cigar(b) ((uint32_t *)((b)->data + (b)->core.l_qname))

/* ---- functions ---- */
samFile *sam_open(const char *fn, const char *mode);
int sam_close(samFile *fp);
bam_hdr_t *sam_hdr_read(samFile *fp);
void bam_hdr_destroy(bam_hdr_t *h);
int sam_read1(samFile *fp, bam_hdr_t *h, bam1_t *b);

bam1_t *bam_init1(void);
void bam_destroy1(bam1_t *b);

hts_idx_t *sam_index_load(samFile *fp, const char *fn);
void hts_idx_destroy(hts_idx_t *idx);
void hts_itr_destroy(hts_itr_t *itr);

int64_t bam_cigar2rlen(int n_cigar, const uint32_t *cigar);
int bam_reg2bin(int64_t beg, int64_t end);

uint8_t *bam_aux_get(const bam1_t *b, const char tag[2]);
int64_t bam_aux2i(const uint8_t *s);
char bam_aux2A(const uint8_t *s);
int bam_aux_append(bam1_t *b, const char tag[2], char type, int len,
                   const uint8_t *data);

int bam_write1(BGZF *fp, const bam1_t *b);

#ifdef __cplusplus
}
#endif

#endif
