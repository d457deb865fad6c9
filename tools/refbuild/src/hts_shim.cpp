/* htslib shim implementation: BGZF block reader/writer (zlib) + BAM
 * record codec, written from the SAM/BAM spec for building the reference
 * aletsch binary in this environment.  Covers exactly the call surface of
 * the reference (see include/htslib/sam.h). */

#include "htslib/sam.h"

#include <zlib.h>

#include <cstdio>
#include <cstdlib>
#include <cstring>

static const int BGZF_MAX = 0x10000;

extern "C" {

/* ------------------------------------------------------------- BGZF */

BGZF* bgzf_open(const char* path, const char* mode) {
    FILE* f = fopen(path, mode[0] == 'w' ? "wb" : "rb");
    if (f == NULL) return NULL;
    BGZF* fp = (BGZF*)calloc(1, sizeof(BGZF));
    fp->fp = f;
    fp->is_write = mode[0] == 'w';
    fp->ubuf = (unsigned char*)malloc(BGZF_MAX);
    fp->cbuf = (unsigned char*)malloc(BGZF_MAX + 1024);
    fp->block_address = 0;
    fp->block_length = 0;
    fp->block_offset = 0;
    return fp;
}

static int bgzf_flush_block(BGZF* fp) {
    if (fp->block_offset == 0) return 0;
    /* deflate ubuf[0:block_offset] into one BGZF member */
    unsigned char* c = fp->cbuf;
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    deflateInit2(&zs, Z_DEFAULT_COMPRESSION, Z_DEFLATED, -15, 8,
                 Z_DEFAULT_STRATEGY);
    zs.next_in = fp->ubuf;
    zs.avail_in = fp->block_offset;
    zs.next_out = c + 18;
    zs.avail_out = BGZF_MAX + 1024 - 18 - 8;
    deflate(&zs, Z_FINISH);
    int clen = (int)zs.total_out;
    deflateEnd(&zs);
    int bsize = clen + 18 + 8;
    static const unsigned char hdr[16] = {
        0x1f, 0x8b, 8, 4, 0, 0, 0, 0, 0, 0xff, 6, 0, 'B', 'C', 2, 0};
    memcpy(c, hdr, 16);
    c[16] = (unsigned char)((bsize - 1) & 0xff);
    c[17] = (unsigned char)(((bsize - 1) >> 8) & 0xff);
    uint32_t crc = crc32(0, fp->ubuf, fp->block_offset);
    uint32_t isz = (uint32_t)fp->block_offset;
    memcpy(c + 18 + clen, &crc, 4);
    memcpy(c + 18 + clen + 4, &isz, 4);
    fwrite(c, 1, (size_t)bsize, fp->fp);
    fp->block_offset = 0;
    return 0;
}

int bgzf_close(BGZF* fp) {
    if (fp == NULL) return 0;
    if (fp->is_write) {
        bgzf_flush_block(fp);
        /* EOF marker block */
        static const unsigned char eof[28] = {
            0x1f, 0x8b, 8, 4, 0, 0, 0, 0, 0, 0xff, 6, 0, 'B', 'C',
            2, 0, 0x1b, 0, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0};
        fwrite(eof, 1, 28, fp->fp);
    }
    fclose(fp->fp);
    free(fp->ubuf);
    free(fp->cbuf);
    free(fp);
    return 0;
}

/* load the block at the current file position; 0 ok, -1 EOF/error */
static int bgzf_load_block(BGZF* fp) {
    long addr = ftell(fp->fp);
    unsigned char h[18];
    size_t n = fread(h, 1, 18, fp->fp);
    if (n == 0) return -1;
    if (n != 18 || h[0] != 0x1f || h[1] != 0x8b) return -1;
    int bsize = (h[16] | (h[17] << 8)) + 1;
    int clen = bsize - 18 - 8;
    if (clen < 0 || bsize > BGZF_MAX + 1024) return -1;
    if (fread(fp->cbuf, 1, (size_t)(clen + 8), fp->fp) !=
        (size_t)(clen + 8))
        return -1;
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    inflateInit2(&zs, -15);
    zs.next_in = fp->cbuf;
    zs.avail_in = (unsigned)clen;
    zs.next_out = fp->ubuf;
    zs.avail_out = BGZF_MAX;
    int r = inflate(&zs, Z_FINISH);
    int ulen = (int)zs.total_out;
    inflateEnd(&zs);
    if (r != Z_STREAM_END) return -1;
    fp->block_address = addr;
    fp->block_length = ulen;
    fp->block_offset = 0;
    return ulen == 0 ? 1 : 0;   /* 1 = EOF marker block */
}

long bgzf_read(BGZF* fp, void* data, size_t length) {
    unsigned char* out = (unsigned char*)data;
    size_t done = 0;
    while (done < length) {
        if (fp->block_offset >= fp->block_length) {
            int r = bgzf_load_block(fp);
            if (r != 0) break;          /* EOF */
        }
        size_t avail = (size_t)(fp->block_length - fp->block_offset);
        size_t take = length - done < avail ? length - done : avail;
        memcpy(out + done, fp->ubuf + fp->block_offset, take);
        fp->block_offset += (int)take;
        done += take;
    }
    return (long)done;
}

long bgzf_write(BGZF* fp, const void* data, size_t length) {
    const unsigned char* in = (const unsigned char*)data;
    size_t done = 0;
    while (done < length) {
        size_t room = (size_t)(BGZF_MAX - fp->block_offset);
        size_t take = length - done < room ? length - done : room;
        memcpy(fp->ubuf + fp->block_offset, in + done, take);
        fp->block_offset += (int)take;
        done += take;
        if (fp->block_offset == BGZF_MAX) bgzf_flush_block(fp);
    }
    return (long)done;
}

int64_t bgzf_seek(BGZF* fp, int64_t pos, int whence) {
    (void)whence;
    if (getenv("ALETSCH_SHIM_DEBUG"))
        fprintf(stderr, "[shim] bgzf_seek to %lld (caddr=%lld uoff=%d)\n",
                (long long)pos, (long long)(pos >> 16),
                (int)(pos & 0xffff));
    int64_t caddr = pos >> 16;
    int uoff = (int)(pos & 0xffff);
    if (caddr == fp->block_address && fp->block_length > 0) {
        fp->block_offset = uoff;
        return 0;
    }
    if (fseek(fp->fp, (long)caddr, SEEK_SET) != 0) return -1;
    fp->block_address = caddr;
    fp->block_length = 0;
    fp->block_offset = 0;
    if (uoff != 0) {
        if (bgzf_load_block(fp) < 0) return -1;
        fp->block_offset = uoff;
    }
    return 0;
}

int64_t bgzf_tell(BGZF* fp) {
    return (fp->block_address << 16) | (int64_t)fp->block_offset;
}

/* -------------------------------------------------------------- SAM */

const char bam_nt16_table[256] = {
    15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15,
    15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15,
    15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15,
     1,  2,  4,  8, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15,
    15,  1, 14,  2, 13, 15, 15,  4, 11, 15, 15, 12, 15,  3, 15, 15,
    15, 15,  5,  6,  8, 15,  7,  9, 15, 10, 15, 15, 15, 15, 15, 15,
    15,  1, 14,  2, 13, 15, 15,  4, 11, 15, 15, 12, 15,  3, 15, 15,
    15, 15,  5,  6,  8, 15,  7,  9, 15, 10, 15, 15, 15, 15, 15, 15,
    15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15,
    15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15,
    15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15,
    15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15,
    15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15,
    15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15,
    15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15,
    15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15};

samFile* sam_open(const char* path, const char* mode) {
    BGZF* b = bgzf_open(path, mode);
    if (b == NULL) return NULL;
    samFile* fp = (samFile*)calloc(1, sizeof(samFile));
    fp->fp.bgzf = b;
    fp->is_write = mode[0] == 'w';
    return fp;
}

int sam_close(samFile* fp) {
    if (fp == NULL) return 0;
    bgzf_close(fp->fp.bgzf);
    free(fp);
    return 0;
}

bam_hdr_t* sam_hdr_read(samFile* fp) {
    BGZF* b = fp->fp.bgzf;
    char magic[4];
    if (bgzf_read(b, magic, 4) != 4 || memcmp(magic, "BAM\1", 4) != 0)
        return NULL;
    bam_hdr_t* h = (bam_hdr_t*)calloc(1, sizeof(bam_hdr_t));
    int32_t l_text = 0;
    bgzf_read(b, &l_text, 4);
    h->l_text = (uint32_t)l_text;
    h->text = (char*)malloc((size_t)l_text + 1);
    bgzf_read(b, h->text, (size_t)l_text);
    h->text[l_text] = 0;
    int32_t n_ref = 0;
    bgzf_read(b, &n_ref, 4);
    h->n_targets = n_ref;
    h->target_name = (char**)calloc((size_t)n_ref, sizeof(char*));
    h->target_len = (uint32_t*)calloc((size_t)n_ref, sizeof(uint32_t));
    for (int i = 0; i < n_ref; i++) {
        int32_t l_name = 0;
        bgzf_read(b, &l_name, 4);
        h->target_name[i] = (char*)malloc((size_t)l_name);
        bgzf_read(b, h->target_name[i], (size_t)l_name);
        int32_t l_ref = 0;
        bgzf_read(b, &l_ref, 4);
        h->target_len[i] = (uint32_t)l_ref;
    }
    return h;
}

int sam_hdr_write(samFile* fp, const bam_hdr_t* h) {
    BGZF* b = fp->fp.bgzf;
    bgzf_write(b, "BAM\1", 4);
    int32_t l_text = (int32_t)h->l_text;
    bgzf_write(b, &l_text, 4);
    bgzf_write(b, h->text, (size_t)l_text);
    int32_t n = h->n_targets;
    bgzf_write(b, &n, 4);
    for (int i = 0; i < n; i++) {
        int32_t l_name = (int32_t)strlen(h->target_name[i]) + 1;
        bgzf_write(b, &l_name, 4);
        bgzf_write(b, h->target_name[i], (size_t)l_name);
        int32_t l_ref = (int32_t)h->target_len[i];
        bgzf_write(b, &l_ref, 4);
    }
    return 0;
}

void bam_hdr_destroy(bam_hdr_t* h) {
    if (h == NULL) return;
    for (int i = 0; i < h->n_targets; i++) free(h->target_name[i]);
    free(h->target_name);
    free(h->target_len);
    free(h->text);
    free(h);
}

bam1_t* bam_init1(void) { return (bam1_t*)calloc(1, sizeof(bam1_t)); }

void bam_destroy1(bam1_t* b) {
    if (b == NULL) return;
    free(b->data);
    free(b);
}

int sam_read1(samFile* fp, bam_hdr_t* h, bam1_t* b) {
    (void)h;
    BGZF* bg = fp->fp.bgzf;
    int32_t block_size = 0;
    long n = bgzf_read(bg, &block_size, 4);
    if (n == 0) return -1;              /* clean EOF */
    if (n != 4 || block_size < 32) return -2;
    unsigned char fixed[32];
    if (bgzf_read(bg, fixed, 32) != 32) return -2;
    int32_t refID, pos, l_seq, next_refID, next_pos, tlen;
    memcpy(&refID, fixed, 4);
    memcpy(&pos, fixed + 4, 4);
    uint8_t l_read_name = fixed[8];
    uint8_t mapq = fixed[9];
    uint16_t bin, n_cigar, flag;
    memcpy(&bin, fixed + 10, 2);
    memcpy(&n_cigar, fixed + 12, 2);
    memcpy(&flag, fixed + 14, 2);
    memcpy(&l_seq, fixed + 16, 4);
    memcpy(&next_refID, fixed + 20, 4);
    memcpy(&next_pos, fixed + 24, 4);
    memcpy(&tlen, fixed + 28, 4);
    int l_data = block_size - 32;
    if (b->m_data < l_data) {
        b->m_data = l_data + 32;
        b->data = (uint8_t*)realloc(b->data, (size_t)b->m_data);
    }
    if (bgzf_read(bg, b->data, (size_t)l_data) != l_data) return -2;
    b->l_data = l_data;
    b->core.tid = refID;
    b->core.pos = pos;
    b->core.bin = bin;
    b->core.qual = mapq;
    b->core.l_qname = l_read_name;
    b->core.l_extranul = 0;
    b->core.flag = flag;
    b->core.n_cigar = n_cigar;
    b->core.l_qseq = l_seq;
    b->core.mtid = next_refID;
    b->core.mpos = next_pos;
    b->core.isize = tlen;
    return block_size;
}

int bam_write1(BGZF* fp, const bam1_t* b) {
    int32_t block_size = 32 + b->l_data;
    bgzf_write(fp, &block_size, 4);
    unsigned char fixed[32];
    memcpy(fixed, &b->core.tid, 4);
    memcpy(fixed + 4, &b->core.pos, 4);
    fixed[8] = b->core.l_qname;
    fixed[9] = b->core.qual;
    memcpy(fixed + 10, &b->core.bin, 2);
    uint16_t n_cigar = (uint16_t)b->core.n_cigar;
    memcpy(fixed + 12, &n_cigar, 2);
    memcpy(fixed + 14, &b->core.flag, 2);
    memcpy(fixed + 16, &b->core.l_qseq, 4);
    memcpy(fixed + 20, &b->core.mtid, 4);
    memcpy(fixed + 24, &b->core.mpos, 4);
    memcpy(fixed + 28, &b->core.isize, 4);
    bgzf_write(fp, fixed, 32);
    bgzf_write(fp, b->data, (size_t)b->l_data);
    return block_size;
}

/* ---- aux ---- */

static int aux_type_size(uint8_t t) {
    switch (t) {
        case 'A': case 'c': case 'C': return 1;
        case 's': case 'S': return 2;
        case 'i': case 'I': case 'f': return 4;
        case 'd': return 8;
        default: return 0;
    }
}

uint8_t* bam_aux_get(const bam1_t* b, const char tag[2]) {
    uint8_t* s = bam_get_aux(b);
    uint8_t* end = b->data + b->l_data;
    while (s + 3 <= end) {
        uint8_t t0 = s[0], t1 = s[1], ty = s[2];
        uint8_t* val = s + 3;
        if (t0 == (uint8_t)tag[0] && t1 == (uint8_t)tag[1]) return s + 2;
        int sz = aux_type_size(ty);
        if (sz > 0) {
            s = val + sz;
        } else if (ty == 'Z' || ty == 'H') {
            while (val < end && *val) val++;
            s = val + 1;
        } else if (ty == 'B') {
            uint8_t sub = val[0];
            int32_t cnt;
            memcpy(&cnt, val + 1, 4);
            s = val + 5 + (int64_t)aux_type_size(sub) * cnt;
        } else {
            return NULL;
        }
    }
    return NULL;
}

int64_t bam_aux2i(const uint8_t* s) {
    switch (s[0]) {
        case 'c': return *(const int8_t*)(s + 1);
        case 'C': return *(const uint8_t*)(s + 1);
        case 's': { int16_t v; memcpy(&v, s + 1, 2); return v; }
        case 'S': { uint16_t v; memcpy(&v, s + 1, 2); return v; }
        case 'i': { int32_t v; memcpy(&v, s + 1, 4); return v; }
        case 'I': { uint32_t v; memcpy(&v, s + 1, 4); return v; }
        default: return 0;
    }
}

char bam_aux2A(const uint8_t* s) {
    return s[0] == 'A' ? (char)s[1] : 0;
}

int bam_aux_append(bam1_t* b, const char tag[2], char type, int len,
                   const uint8_t* data) {
    int need = b->l_data + 3 + len;
    if (b->m_data < need) {
        b->m_data = need + 32;
        b->data = (uint8_t*)realloc(b->data, (size_t)b->m_data);
    }
    uint8_t* s = b->data + b->l_data;
    s[0] = (uint8_t)tag[0];
    s[1] = (uint8_t)tag[1];
    s[2] = (uint8_t)type;
    memcpy(s + 3, data, (size_t)len);
    b->l_data = need;
    return 0;
}

uint32_t bam_cigar2rlen(int n_cigar, const uint32_t* cigar) {
    uint32_t l = 0;
    for (int k = 0; k < n_cigar; k++)
        if (bam_cigar_type(bam_cigar_op(cigar[k])) & 2)
            l += bam_cigar_oplen(cigar[k]);
    return l;
}

/* index stubs: the reference loads + destroys but never queries (all
 * sam_itr_* call sites are commented out; random access goes through
 * bgzf_seek on recorded virtual offsets) */
hts_idx_t* sam_index_load(samFile* fp, const char* path) {
    (void)fp;
    (void)path;
    return (hts_idx_t*)calloc(1, sizeof(hts_idx_t));
}

void hts_idx_destroy(hts_idx_t* idx) { free(idx); }

void hts_itr_destroy(hts_itr_t* itr) { free(itr); }

}  /* extern "C" */
